"""Measure DP batch-of-sequences throughput on one chip.

vmaps the full VO step over B independent sequences and scans N frames inside
one jit — aggregate frames/s/chip vs the single-sequence number.  This is the
offline-eval shape (KITTI 00-10 = 11 independent sequences).
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

    for B in (1, 2, 4, 8):
        vstep = jax.vmap(step)
        st0 = init_state(cfg, (H, W))
        stB = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), st0)
        l1 = jnp.broadcast_to(img_l, (B, H, W))
        r1 = jnp.broadcast_to(img_r, (B, H, W))
        l2 = jnp.broadcast_to(img_l2, (B, H, W))
        r2 = jnp.broadcast_to(img_r2, (B, H, W))
        stB, _ = jax.jit(vstep)(stB, l1, r1)

        def body(carry, _):
            st, flip = carry
            l = jnp.where(flip, l1, l2)
            r = jnp.where(flip, r1, r2)
            st, res = vstep(st, l, r)
            return (st, ~flip), None

        run = jax.jit(lambda stB=stB, body=body: lax.scan(
            body, (stB, jnp.bool_(True)), None, length=N)[0])
        run()
        jax.block_until_ready(run())
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        dt = time.perf_counter() - t0
        fps = B * N / dt
        print(f"B={B:2d}: {dt / N * 1e3:7.3f} ms/step  "
              f"aggregate {fps:8.1f} frames/s/chip")

    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
