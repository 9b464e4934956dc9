"""Decompose the fused VO step's device time with in-graph lax.scan timing.

Each composite (stages 1-2, 1-3, full step) runs N sequential iterations
inside one jit, threading the engine state through the scan carry, so
numbers are pure device time at KITTI size.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.engine import init_state, make_step
    from rso.geometry.stereo_camera import StereoCamera
    from rso.synthetic import make_sequence, synthetic_config

    H, W = 376, 1241
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    seq = make_sequence(n_frames=2, n_points=2000, H=H, W=W, cam=cam)
    cfg = synthetic_config()
    img_l = jnp.asarray(seq.frames[0][0])
    img_r = jnp.asarray(seq.frames[0][1])
    img_l2 = jnp.asarray(seq.frames[1][0])
    img_r2 = jnp.asarray(seq.frames[1][1])
    N = 20

    step = make_step(cfg, cam, H, W)

    def time_scan(name, body, init):
        run = jax.jit(lambda: lax.scan(body, init, None, length=N)[0])
        run()
        r = jax.block_until_ready(run())
        t0 = time.perf_counter()
        r = jax.block_until_ready(run())
        dt = (time.perf_counter() - t0) / N * 1e3
        print(f"{name:<40}{dt:9.3f} ms")
        return dt

    # full step: alternate the two frames so tracking does real work
    st0 = init_state(cfg, (H, W))
    st0, _ = jax.jit(step)(st0, img_l, img_r)

    def body_full(carry, _):
        st, flip = carry
        l = jnp.where(flip, img_l, img_l2)
        r = jnp.where(flip, img_r, img_r2)
        st, res = step(st, l, r)
        return (st, ~flip), None

    t_full = time_scan("full step", body_full, (st0, jnp.bool_(True)))

    # stages 1-2+3 only: build a step and stop after stereo match by summing
    from rso.frontend.detect import detect_features, octave_budget
    from rso.frontend.pyramid import build_pyramid, to_grayscale
    from rso.frontend.stereo_match import match_left_right
    O = cfg.n_octaves
    K = cfg.tpu.max_kps_per_octave

    def stages12(carry, _):
        acc, flip = carry
        l = jnp.where(flip, img_l, img_l2)
        r = jnp.where(flip, img_r, img_r2)
        pl = build_pyramid(to_grayscale(l), O)
        pr = build_pyramid(to_grayscale(r), O)
        s = jnp.float32(0)
        for o in range(O):
            fl = detect_features(pl[o], cfg.detect, K, jnp.int32(20), False,
                                 arc=cfg.tpu.fast_arc)
            fr = detect_features(pr[o], cfg.detect, K, jnp.int32(20), False,
                                 arc=cfg.tpu.fast_arc)
            s = s + fl.response.sum() + fr.response.sum()
        return (acc + s, ~flip), None

    t12 = time_scan("stages 1-2 (pyr+detect x6)",
                    stages12, (jnp.float32(0), jnp.bool_(True)))

    def stages123(carry, _):
        acc, flip = carry
        l = jnp.where(flip, img_l, img_l2)
        r = jnp.where(flip, img_r, img_r2)
        pl = build_pyramid(to_grayscale(l), O)
        pr = build_pyramid(to_grayscale(r), O)
        s = jnp.float32(0)
        for o in range(O):
            fl = detect_features(pl[o], cfg.detect, K, jnp.int32(20), False,
                                 arc=cfg.tpu.fast_arc)
            fr = detect_features(pr[o], cfg.detect, K, jnp.int32(20), False,
                                 arc=cfg.tpu.fast_arc)
            m = match_left_right(fl, fr, cfg.lr_match, W >> o, 0.0,
                                 fx_baseline=float(cam.fx_l) * float(cam.baseline) / (2 ** o))
            s = s + m.dist.sum() + fl.response.sum()
        return (acc + s, ~flip), None

    t123 = time_scan("stages 1-3 (+stereo match)",
                     stages123, (jnp.float32(0), jnp.bool_(True)))

    print(f"\nimplied stages 4-5 (track+solve+ids): {t_full - t123:.3f} ms")
    print(f"implied stage 3 alone: {t123 - t12:.3f} ms")
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
