"""Minimal repro search for the flow-mode scan fault (docs/FLOW_SCAN_FAULT.md).

Round-1 symptom: lax.scan over N>=45 KITTI-size OPTICAL_FLOW engine steps
kills the TPU worker ("kernel fault").  Bisection result: the trigger is the
*gather-based* LK formulation (per-sample bilinear => XLA gathers with ~441
indices x4 per point per iteration); total lk calls per dispatch ~>=192
faults the worker.  The library's lk_track is now patch-based
(lax.dynamic_slice) and does not fault; variant `gather6` embeds the old
formulation verbatim so the runtime fault stays reproducible.

Usage: python tools/exp_flow_crash_min.py N [variant]
  variant: full    — pyramids in carry + lk_track (default)
           nopyr   — images (not pyramids) in carry, lk_track on 1 level
           nolk    — pyramids in carry, trivial compute
           six     — engine-shaped: both-eye pyramids in carry, 6 lk_track
                     calls (2 eyes x 3 octaves) at K=512 per step
           sixa    — six + flow_guided_association per octave
           lkC:K   — C lk_track calls per step at K points (e.g. lk6:512)
           gather6 — `six` but with the round-1 gather-based LK (CRASHES the
                     TPU worker at N>=32 on the 2026-08 runtime)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from rso.frontend.optical_flow import lk_track
    from rso.frontend.pyramid import build_pyramid

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    variant = sys.argv[2] if len(sys.argv) > 2 else "full"
    H, W, K, LV = 376, 1241, 500, 3

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (N, H, W)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(20, 350, (K, 2)).astype(np.float32))
    val = jnp.ones((K,), bool)

    def gather_lk_level(prev_img, cur_img, pts_prev, guess, win=10, iters=10):
        """The round-1 per-sample-gather LK level, kept verbatim as the
        fault repro (see module docstring)."""
        def bilin(img, x, y):
            Hh, Ww = img.shape
            xf = jnp.clip(x, 0.0, Ww - 1.001)
            yf = jnp.clip(y, 0.0, Hh - 1.001)
            x0 = xf.astype(jnp.int32)
            y0 = yf.astype(jnp.int32)
            fx = xf - x0
            fy = yf - y0
            Ia = img[y0, x0]
            Ib = img[y0, x0 + 1]
            Ic = img[y0 + 1, x0]
            Id = img[y0 + 1, x0 + 1]
            return ((Ia * (1 - fx) + Ib * fx) * (1 - fy)
                    + (Ic * (1 - fx) + Id * fx) * fy)

        r = win
        dy, dx = jnp.mgrid[-r:r + 1, -r:r + 1]
        dx = dx.reshape(-1).astype(jnp.float32)
        dy = dy.reshape(-1).astype(jnp.float32)

        def one(pt, g0):
            px = pt[0] + dx
            py = pt[1] + dy
            T = bilin(prev_img, px, py)
            Ix = (bilin(prev_img, px + 1, py) - bilin(prev_img, px - 1, py)) * 0.5
            Iy = (bilin(prev_img, px, py + 1) - bilin(prev_img, px, py - 1)) * 0.5
            Gxx = jnp.sum(Ix * Ix)
            Gxy = jnp.sum(Ix * Iy)
            Gyy = jnp.sum(Iy * Iy)
            det = Gxx * Gyy - Gxy * Gxy
            inv_det = jnp.where(det > 1e-6, 1.0 / jnp.where(det > 1e-6, det, 1.0), 0.0)

            def body(_, g):
                e = bilin(cur_img, px + g[0], py + g[1]) - T
                bx = jnp.sum(Ix * e)
                by = jnp.sum(Iy * e)
                return g + jnp.stack([-(Gyy * bx - Gxy * by) * inv_det,
                                      -(-Gxy * bx + Gxx * by) * inv_det])

            return lax.fori_loop(0, iters, body, g0)

        return jax.vmap(one)(pts_prev, guess)

    if variant == "full":
        def mkcarry(img):
            return tuple(build_pyramid(img, LV))

        def compute(prev_pyr, cur_pyr):
            r = lk_track(list(prev_pyr), list(cur_pyr), pts, val)
            return r.pos.sum() + r.err.sum()
    elif variant == "nopyr":
        def mkcarry(img):
            return (img,)

        def compute(prev, cur):
            r = lk_track([prev[0]], [cur[0]], pts, val)
            return r.pos.sum() + r.err.sum()
    elif variant == "gather6":
        K6 = 512
        pts6 = jnp.asarray(rng.uniform(20, 350, (K6, 2)).astype(np.float32))
        g0 = jnp.zeros((K6, 2), jnp.float32)

        def mkcarry(img):
            return (tuple(build_pyramid(img, LV)),
                    tuple(build_pyramid(img + 1.0, LV)))

        def compute(prev, cur):
            acc = jnp.float32(0)
            for o in range(3):
                for eye in range(2):
                    # full coarse-to-fine lk_track: one gather level per
                    # pyramid level, guess threaded through
                    g = g0
                    for lvl in range(LV - 1, -1, -1):
                        g = gather_lk_level(prev[eye][lvl], cur[eye][lvl],
                                            (pts6 / (2 ** o)) / (2 ** lvl), g)
                        if lvl > 0:
                            g = g * 2.0
                    acc = acc + g.sum()
            return acc
    elif variant in ("six", "sixa"):
        from rso.frontend.optical_flow import flow_guided_association

        K6 = 512
        pts6 = jnp.asarray(rng.uniform(20, 350, (K6, 2)).astype(np.float32))
        val6 = jnp.ones((K6,), bool)

        def mkcarry(img):
            # both eyes: reuse the same image shifted to keep memory similar
            return (tuple(build_pyramid(img, LV)),
                    tuple(build_pyramid(img + 1.0, LV)))

        def compute(prev, cur):
            acc = jnp.float32(0)
            for o in range(3):
                fl = lk_track(list(prev[0]), list(cur[0]), pts6 / (2 ** o),
                              val6)
                fr = lk_track(list(prev[1]), list(cur[1]), pts6 / (2 ** o),
                              val6)
                if variant == "sixa":
                    idx, ok = flow_guided_association(
                        fl.pos, fl.status & fr.status, pts6, val6)
                    acc = acc + idx.sum() + ok.sum()
                acc = acc + fl.pos.sum() + fr.pos.sum()
            return acc
    elif variant.startswith("lk"):
        calls, kk = variant[2:].split(":")
        calls, kk = int(calls), int(kk)
        ptsv = jnp.asarray(rng.uniform(20, 350, (kk, 2)).astype(np.float32))
        valv = jnp.ones((kk,), bool)

        def mkcarry(img):
            return tuple(build_pyramid(img, LV))

        def compute(prev, cur):
            acc = jnp.float32(0)
            for i in range(calls):
                r = lk_track(list(prev), list(cur), ptsv + i, valv)
                acc = acc + r.pos.sum()
            return acc
    else:  # nolk
        def mkcarry(img):
            return tuple(build_pyramid(img, LV))

        def compute(prev_pyr, cur_pyr):
            return sum(p.sum() for p in prev_pyr) + cur_pyr[0].mean()

    def step(carry, img):
        prev = carry
        cur = mkcarry(img)
        acc = compute(prev, cur)
        return cur, acc

    def chunk(c0, xs):
        return lax.scan(step, c0, xs)

    c0 = mkcarry(imgs[0])
    _, accs = jax.jit(chunk)(c0, imgs)
    jax.block_until_ready(accs)
    print(f"N={N} variant={variant}: OK sum={float(accs.sum()):.3e}",
          flush=True)


if __name__ == "__main__":
    main()
