"""Slope-timed config ablation: the trustworthy version of exp_step_ablate.

Each variant's full-step device time via scan-length slope (RTT cancels),
min over passes.  Marginal cost = variant - default.
"""
import dataclasses
import sys
import time

import numpy as np


def main(names=None):
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
    N1, N2, PASSES = 20, 120, 4

    def slope(cfg):
        step = make_step(cfg, cam, H, W)
        st0 = init_state(cfg, (H, W))
        st0, _ = jax.jit(step)(st0, img_l, img_r)
        st0 = jax.block_until_ready(st0)

        def body(carry, _):
            st, flip = carry
            l = jnp.where(flip, img_l, img_l2)
            r = jnp.where(flip, img_r, img_r2)
            st, res = step(st, l, r)
            return (st, ~flip), None

        def timer(n):
            run = jax.jit(lambda: lax.scan(body, (st0, jnp.bool_(True)),
                                           None, length=n)[0])
            jax.block_until_ready(run())
            best = 1e9
            for _ in range(PASSES):
                t0 = time.perf_counter()
                jax.block_until_ready(run())
                best = min(best, time.perf_counter() - t0)
            return best

        return (timer(N2) - timer(N1)) / (N2 - N1) * 1e3

    variants = {
        "default": base,
        "ransac OFF": base.replace(if_match=dataclasses.replace(
            base.if_match, filter_fund_matrix=False)),
        "stage5 NMS r=0.5 (min_distance 1)": base.replace(
            detect=dataclasses.replace(base.detect, min_distance=1)),
        "GN iters 3+3 (timing probe)": base.replace(
            least_squares=dataclasses.replace(
                base.least_squares, initial_max_iters=3, max_iters=3)),
        "exact SAD (no MXU shortlist)": base.replace(
            tpu=dataclasses.replace(base.tpu, use_mxu_distance=False)),
        "1 octave": base.replace(rectify=dataclasses.replace(
            base.rectify, nOctaves=1)),
    }
    t0 = None
    for name, cfg in variants.items():
        if names and name != "default" and not any(s in name for s in names):
            continue
        t = slope(cfg)
        if t0 is None:
            t0 = t
        print(f"{name:<40}{t:8.3f} ms   ({t - t0:+6.3f})", flush=True)
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main(sys.argv[1:] or None)
