"""Per-mode TPU step cost (slope method, interleaved builds).

Measures step time for representative mode combos to find which tracking
configurations still carry scattered-gather formulations.

Usage: bash tools/tpu_run.sh tools/exp_mode_cost.py
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

    from rso.config import DetectMethod, IFMatchMethod, StereoMatchMethod
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

    combos = [
        ("FASTER+SAD+SAD", DetectMethod.FASTER, StereoMatchMethod.SAD,
         IFMatchMethod.SAD),
        ("FAST_ORB+RbR+Win", DetectMethod.FAST_ORB, StereoMatchMethod.DESC_RBR,
         IFMatchMethod.DESC_WIN),
        ("FAST_ORB+BF+BF", DetectMethod.FAST_ORB, StereoMatchMethod.DESC_BF,
         IFMatchMethod.DESC_BF),
        ("ORB+BF+BF", DetectMethod.ORB, StereoMatchMethod.DESC_BF,
         IFMatchMethod.DESC_BF),
    ]

    def build(dm, sm, ifm):
        cfg = base.replace(
            detect=dataclasses.replace(base.detect, detect_method=dm),
            lr_match=dataclasses.replace(base.lr_match, match_method=sm),
            if_match=dataclasses.replace(base.if_match, ifm_method=ifm))
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

    runs = {name: build(dm, sm, ifm) for name, dm, sm, ifm in combos}
    best = {(k, n): 1e9 for k in runs for n in (N1, N2)}
    for _ in range(PASSES):
        for k in runs:
            for n in (N1, N2):
                t0 = time.perf_counter()
                jax.block_until_ready(runs[k][n]())
                best[(k, n)] = min(best[(k, n)], time.perf_counter() - t0)
    for k in runs:
        per = (best[(k, N2)] - best[(k, N1)]) / (N2 - N1) * 1e3
        print(f"{k:18s}: step {per:7.3f} ms ({1e3 / per:6.0f} FPS)")
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
