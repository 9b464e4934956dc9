"""TPU step-time of OPTICAL_FLOW mode vs default SAD mode (slope method).

The LK tracker samples its search window with per-keypoint dynamic_slice
from the full padded image every iteration — the access pattern that cost
the refine pass 7.7 ms/step before the one-hot in-patch rewrite.  This
measures how much of flow mode's step is that.

Usage: bash tools/tpu_run.sh tools/exp_flow_cost.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.config import IFMatchMethod
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

    N1, N2, PASSES = 10, 50, 4

    def build(ifm):
        cfg = base.replace(if_match=dataclasses.replace(
            base.if_match, ifm_method=ifm))
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

        runs = {}
        for n in (N1, N2):
            run = jax.jit(lambda n=n: lax.scan(
                body, (st0, jnp.bool_(True)), None, length=n)[0])
            jax.block_until_ready(run())
            runs[n] = run
        return runs

    modes = {"SAD": IFMatchMethod.SAD, "FLOW": IFMatchMethod.OPTICAL_FLOW}
    runs = {k: build(v) for k, v in modes.items()}
    best = {(k, n): 1e9 for k in runs for n in (N1, N2)}
    for _ in range(PASSES):
        for k in runs:
            for n in (N1, N2):
                t0 = time.perf_counter()
                jax.block_until_ready(runs[k][n]())
                best[(k, n)] = min(best[(k, n)], time.perf_counter() - t0)
    for k in runs:
        per = (best[(k, N2)] - best[(k, N1)]) / (N2 - N1) * 1e3
        print(f"{k:4s}: step {per:.3f} ms ({1e3 / per:.0f} FPS)")
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
