"""TPU step-time cost of subpixel_track_refine (slope method, interleaved).

Both variants are timed in one process, passes interleaved, to keep remote-
device drift out of the comparison (same discipline as exp_refine_ab.py).

Usage: bash tools/tpu_run.sh tools/exp_refine_cost.py
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

    N1, N2, PASSES = 20, 120, 5

    def build(refine):
        cfg = base.replace(tpu=dataclasses.replace(
            base.tpu, subpixel_track_refine=refine))
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
            jax.block_until_ready(run())   # compile
            runs[n] = run
        return runs

    runs = {r: build(r) for r in (False, True)}
    best = {(r, n): 1e9 for r in runs for n in (N1, N2)}
    for _ in range(PASSES):
        for r in (False, True):
            for n in (N1, N2):
                t0 = time.perf_counter()
                jax.block_until_ready(runs[r][n]())
                best[(r, n)] = min(best[(r, n)],
                                   time.perf_counter() - t0)
    for r in (False, True):
        per = (best[(r, N2)] - best[(r, N1)]) / (N2 - N1) * 1e3
        print(f"refine={int(r)}: step {per:.3f} ms ({1e3 / per:.0f} FPS)")
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
