"""Device-time micro-benchmark for the detection path (and its pieces).

Times each candidate as N sequential iterations inside ONE jitted lax.scan
(carry-perturbed input to defeat CSE), so the remote-tunnel RTT (~30 ms per
dispatch) amortizes away and the numbers are pure device time.

Usage: tools/tpu_run.sh tools/bench_detect.py  (or CPU with the env vars)
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.config import RSOConfig
    from rso.frontend.detect import (
        detect_features, fast_corner_mask, shi_tomasi_response, nms_grid,
        select_topk, extract_patches,
    )
    from rso.frontend.pyramid import build_pyramid, to_grayscale
    from rso.synthetic import make_sequence

    H, W = 376, 1241
    seq = make_sequence(n_frames=1, n_points=2000, H=H, W=W)
    img = jnp.asarray(seq.frames[0][0], jnp.float32)
    cfg = RSOConfig()
    K = cfg.tpu.max_kps_per_octave
    N_ITER = 30

    def timed(name, fn, n1=30, n2=150, passes=4):
        """fn: img -> scalar-reducible output; scan-length-slope device ms
        (the ~30ms tunnel RTT cancels in t(n2)-t(n1))."""
        def body(carry, _):
            out = fn(img + carry * 1e-9)
            return carry + out, None

        def best_time(n):
            run = jax.jit(lambda: lax.scan(body, jnp.float32(0.0), None,
                                           length=n)[0])
            run().block_until_ready()
            best = 1e9
            for _ in range(passes):
                t0 = time.perf_counter()
                run().block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (best_time(n2) - best_time(n1)) / (n2 - n1) * 1e3
        print(f"{name:<44}{dt:9.3f} ms", flush=True)
        return dt

    th = jnp.int32(20)

    timed("fast_corner_mask(arc=12)",
          lambda im: fast_corner_mask(im, th).sum().astype(jnp.float32))
    timed("shi_tomasi_response(win=4)",
          lambda im: shi_tomasi_response(im, 4).sum())
    timed("corner+response+nms (dense part)",
          lambda im: (jnp.where(fast_corner_mask(im, th),
                                shi_tomasi_response(im, 4), -jnp.inf)
                      ).max())

    def full(im):
        f = detect_features(im, cfg.detect, K, th, False,
                            arc=cfg.tpu.fast_arc)
        return f.response.sum()

    timed("detect_features FULL (1 img, oct0)", full)

    def sel(im):
        resp = jnp.where(fast_corner_mask(im, th),
                         shi_tomasi_response(im, 4), -jnp.inf)
        keep = nms_grid(resp, cfg.detect.min_distance)
        xy, r, v = select_topk(resp, keep, K, 0.0)
        return r.sum() + xy.sum()

    timed("dense + nms + topk (no patches)", sel)

    def patches_only(im):
        xy = jnp.linspace(10, 300, K)[:, None] * jnp.ones((1, 2))
        return extract_patches(im, xy).sum()

    timed("extract_patches (K=512)", patches_only)

    if jax.default_backend() == "tpu":
        from rso.kernels.fast_detect import corner_response_pallas

        timed("corner_response_pallas (fused)",
              lambda im: corner_response_pallas(im, th, arc=12, win=4).max())

    def dense_bf16(im):
        im16 = im.astype(jnp.bfloat16)
        return jnp.where(fast_corner_mask(im16, th),
                         shi_tomasi_response(im16, 4).astype(jnp.float32),
                         -jnp.inf).max()

    timed("corner+response bf16 (dense part)", dense_bf16)

    def dense_f16(im):
        # f16 with power-of-two gradient scaling (1/16) so grad^2 box sums
        # stay under f16 max; u8 comparisons in the FAST test are exact
        im16 = im.astype(jnp.float16)

        def shift(a, dx, dy):
            return jnp.roll(a, shift=(-dy, -dx), axis=(0, 1))

        def box(a, r):
            Hh, Ww = a.shape
            s = 2 * r + 1
            p = jnp.pad(a, ((r, r), (0, 0)))
            rows = sum(p[dy:dy + Hh, :] for dy in range(s))
            p = jnp.pad(rows, ((0, 0), (r, r)))
            return sum(p[:, dx:dx + Ww] for dx in range(s))

        gx = (shift(im16, 1, 0) - shift(im16, -1, 0)) * jnp.float16(0.5 / 16)
        gy = (shift(im16, 0, 1) - shift(im16, 0, -1)) * jnp.float16(0.5 / 16)
        n = jnp.float16(1.0 / 81)
        gxx = box(gx * gx, 4) * n
        gyy = box(gy * gy, 4) * n
        gxy = box(gx * gy, 4) * n
        tr_half = jnp.float16(0.5) * (gxx + gyy)
        det = jnp.sqrt(jnp.maximum(
            jnp.float16(0.25) * (gxx - gyy) ** 2 + gxy * gxy, jnp.float16(0)))
        resp = (tr_half - det) * jnp.float16(256)
        return jnp.where(fast_corner_mask(im16, th),
                         resp.astype(jnp.float32), -jnp.inf).max()

    timed("corner+response f16 scaled (dense)", dense_f16)

    print(f"\nbackend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
