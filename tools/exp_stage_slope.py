"""Cumulative stage slope profile at engine shapes.

Times four composites via scan-length slope (RTT cancels):
  stage12   pyramid + detect (both eyes, all octaves)
  stage123  + stereo match
  stage1234 + inter-frame track (no fund filter, like the engine's per-octave calls)
  full      the real make_step (adds gathers, flat RANSAC, NMS, GN, IDs)
Differences localize device time per stage.
"""
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.engine import init_state, make_step
    from rso.config import IFMatchMethod
    import dataclasses
    from rso.frontend.detect import detect_features, octave_budget, octave_k_slots
    from rso.frontend.pyramid import build_pyramid, to_grayscale
    from rso.frontend.stereo_match import match_left_right
    from rso.frontend.track import track_interframe
    from rso.geometry.stereo_camera import StereoCamera
    from rso.synthetic import make_sequence, synthetic_config

    H, W = 376, 1241
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    seq = make_sequence(n_frames=2, n_points=2000, H=H, W=W, cam=cam)
    cfg = synthetic_config()
    img_l = jnp.asarray(seq.frames[0][0])
    img_r = jnp.asarray(seq.frames[0][1])
    O = cfg.n_octaves
    K = cfg.tpu.max_kps_per_octave
    Ks = octave_k_slots(cfg.detect.orb_nfeats, O, K, cfg.tpu.octave_slot_decay)
    budgets = octave_budget(cfg.detect.orb_nfeats, O)
    N1, N2, PASSES = 20, 120, 4

    def detect_all(img, th):
        pyr = build_pyramid(to_grayscale(img), O)
        feats = []
        for o in range(O):
            f = detect_features(pyr[o], cfg.detect, Ks[o], th, False,
                                arc=cfg.tpu.fast_arc,
                                use_pallas_detect=cfg.tpu.use_pallas_detect,
                                interpret_pallas=cfg.tpu.interpret_pallas)
            slot_ok = jnp.arange(Ks[o]) < budgets[o]
            feats.append(f._replace(valid=f.valid & slot_ok))
        return feats

    def stage12(carry, _):
        acc = carry
        l = img_l + acc * 1e-30
        r = img_r + acc * 1e-30
        fls = detect_all(l, jnp.int32(20))
        frs = detect_all(r, jnp.int32(20))
        out = sum(jnp.sum(f.response) for f in fls + frs)
        return out, None

    def stage123(carry, _):
        acc = carry
        l = img_l + acc * 1e-30
        r = img_r + acc * 1e-30
        fls = detect_all(l, jnp.int32(20))
        frs = detect_all(r, jnp.int32(20))
        out = jnp.float32(0.0)
        for o in range(O):
            m = match_left_right(fls[o], frs[o], cfg.lr_match, W >> o, 0.0,
                                 fx_baseline=float(cam.fx_l) * float(cam.baseline) / 2**o,
                                 use_mxu=cfg.tpu.use_mxu_distance,
                                 use_fused=cfg.tpu.use_fused_match)
            out = out + jnp.sum(m.dist)
        return out, None

    def make_stage1234():
        ifm = dataclasses.replace(cfg.if_match, filter_fund_matrix=False)

        def f(carry, _):
            acc, prev = carry
            l = img_l + acc * 1e-30
            r = img_r + acc * 1e-30
            fls = detect_all(l, jnp.int32(20))
            frs = detect_all(r, jnp.int32(20))
            out = jnp.float32(0.0)
            cur = []
            for o in range(O):
                m = match_left_right(fls[o], frs[o], cfg.lr_match, W >> o, 0.0,
                                     fx_baseline=float(cam.fx_l) * float(cam.baseline) / 2**o,
                                     use_mxu=cfg.tpu.use_mxu_distance,
                                 use_fused=cfg.tpu.use_fused_match)
                cur.append((fls[o], frs[o], m))
                pfl, pfr, pm = prev[o]
                trk = track_interframe(pfl, pfr, pm, fls[o], frs[o], m, ifm,
                                       jax.random.PRNGKey(0),
                                       use_mxu=cfg.tpu.use_mxu_distance,
                                 use_fused=cfg.tpu.use_fused_match)
                out = out + trk.n_tracked.astype(jnp.float32)
            return (out, tuple(cur)), None
        # initial prev from one eval
        def init_prev():
            fls = detect_all(img_l, jnp.int32(20))
            frs = detect_all(img_r, jnp.int32(20))
            cur = []
            for o in range(O):
                m = match_left_right(fls[o], frs[o], cfg.lr_match, W >> o, 0.0,
                                     fx_baseline=float(cam.fx_l) * float(cam.baseline) / 2**o,
                                     use_mxu=cfg.tpu.use_mxu_distance,
                                 use_fused=cfg.tpu.use_fused_match)
                cur.append((fls[o], frs[o], m))
            return tuple(cur)
        return f, init_prev

    def slope(body, carry0):
        def timer(n):
            run = jax.jit(lambda: lax.scan(body, carry0, None, length=n)[0])
            jax.block_until_ready(run())
            best = 1e9
            for _ in range(PASSES):
                t0 = time.perf_counter()
                jax.block_until_ready(run())
                best = min(best, time.perf_counter() - t0)
            return best
        return (timer(N2) - timer(N1)) / (N2 - N1) * 1e3

    t12 = slope(stage12, jnp.float32(0.0))
    print(f"stage 1-2 (pyr+detect x2)      {t12:8.3f} ms", flush=True)
    t123 = slope(stage123, jnp.float32(0.0))
    print(f"stage 1-3 (+stereo match)      {t123:8.3f} ms  (match {t123-t12:+.3f})", flush=True)
    f1234, init_prev = make_stage1234()
    prev0 = jax.jit(init_prev)()
    prev0 = jax.block_until_ready(prev0)
    t1234 = slope(f1234, (jnp.float32(0.0), prev0))
    print(f"stage 1-4 (+track)             {t1234:8.3f} ms  (track {t1234-t123:+.3f})", flush=True)

    step = make_step(cfg, cam, H, W)
    st0 = init_state(cfg, (H, W))
    st0, _ = jax.jit(step)(st0, img_l, img_r)
    st0 = jax.block_until_ready(st0)

    def full(carry, _):
        st = carry
        st, res = step(st, img_l, img_r)
        return st, None
    tfull = slope(full, st0)
    print(f"full step                      {tfull:8.3f} ms  (tail {tfull-t1234:+.3f})",
          flush=True)
    print(f"backend: {jax.default_backend()}")


if __name__ == "__main__":
    main()
