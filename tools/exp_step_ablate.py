"""Ablate step components to find true in-step marginal device costs.

Times the FULL jitted step (in-graph lax.scan, like bench_step) under config
variants; the delta vs the default config is the real marginal cost of each
component, free of micro-bench fusion artifacts.
"""
import dataclasses
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
    base = synthetic_config()
    img_l = jnp.asarray(seq.frames[0][0])
    img_r = jnp.asarray(seq.frames[0][1])
    img_l2 = jnp.asarray(seq.frames[1][0])
    img_r2 = jnp.asarray(seq.frames[1][1])
    N = 20

    def time_cfg(name, cfg):
        step = make_step(cfg, cam, H, W)
        st0 = init_state(cfg, (H, W))
        st0, _ = jax.jit(step)(st0, img_l, img_r)

        def body(carry, _):
            st, flip = carry
            l = jnp.where(flip, img_l, img_l2)
            r = jnp.where(flip, img_r, img_r2)
            st, res = step(st, l, r)
            return (st, ~flip), None

        run = jax.jit(lambda: lax.scan(body, (st0, jnp.bool_(True)), None,
                                       length=N)[0])
        run()
        jax.block_until_ready(run())
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        dt = (time.perf_counter() - t0) / N * 1e3
        print(f"{name:<48}{dt:9.3f} ms")
        return dt

    t0 = time_cfg("default", base)
    time_cfg("ransac OFF", base.replace(
        if_match=dataclasses.replace(base.if_match,
                                     filter_fund_matrix=False)))
    time_cfg("ransac 32 hyp", base.replace(
        tpu=dataclasses.replace(base.tpu, ransac_iters=32)))
    time_cfg("solver max_iters 10+25 (vs default)", base.replace(
        least_squares=dataclasses.replace(base.least_squares, max_iters=25)))
    time_cfg("min_distance 0 (stage5-NMS+detect-NMS r=1)", base.replace(
        detect=dataclasses.replace(base.detect, min_distance=1)))
    time_cfg("1 octave", base.replace(
        rectify=dataclasses.replace(base.rectify, nOctaves=1)))
    time_cfg("2 octaves", base.replace(
        rectify=dataclasses.replace(base.rectify, nOctaves=2)))
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
