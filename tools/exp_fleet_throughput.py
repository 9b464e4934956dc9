"""Aggregate throughput of the fleet (batch-of-sequences) step on ONE chip.

Question: does vmapping B independent VO steps raise frames/s/chip — i.e.
does the B=1 step leave enough of the chip idle (VPU-bound detect passes,
small matmuls) that XLA can overlap lanes — or does it serialize like the
round-3 eyes-batching no-go?

Method: scan-length slope per B in one claim, B in {1, 2, 4}; inputs flip
between two real frames through the carry (bench discipline: no static
scene, no DCE).  Aggregate FPS = B / (slope ms / 1e3).

Run: PYTHONPATH=/root/repo bash tools/tpu_run.sh tools/exp_fleet_throughput.py
"""
import json
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
    step = make_step(cfg, cam, H, W)

    imgs = [jnp.asarray(f) for fr in seq.frames for f in fr]  # l0 r0 l1 r1
    print(f"backend={jax.default_backend()} {jax.devices()[0]}", flush=True)

    N1, N2, PASSES = 10, 60, 4
    out = {}
    for B in (1, 2, 4):
        st0 = init_state(cfg, (H, W))
        sts = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), st0)
        bl0 = jnp.broadcast_to(imgs[0], (B, H, W))
        br0 = jnp.broadcast_to(imgs[1], (B, H, W))
        bl1 = jnp.broadcast_to(imgs[2], (B, H, W))
        br1 = jnp.broadcast_to(imgs[3], (B, H, W))

        vstep = jax.vmap(step)
        sts, _ = jax.jit(vstep)(sts, bl0, br0)
        sts = jax.block_until_ready(sts)

        def slope_run(st0, a0, b0, a1, b1, n):
            def body(carry, _):
                st, flip = carry
                l = jnp.where(flip, a0, a1)
                r = jnp.where(flip, b0, b1)
                st, _res = vstep(st, l, r)
                return (st, ~flip), None

            return lax.scan(body, (st0, jnp.bool_(True)), None, length=n)[0]

        run = jax.jit(slope_run, static_argnums=5)

        def t(n):
            jax.block_until_ready(run(sts, bl0, br0, bl1, br1, n))
            best = 1e9
            for _ in range(PASSES):
                t0 = time.perf_counter()
                jax.block_until_ready(run(sts, bl0, br0, bl1, br1, n))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = t(N1), t(N2)
        per = (t2 - t1) / (N2 - N1) * 1e3
        out[B] = {"step_ms": round(per, 4),
                  "aggregate_fps": round(B * 1e3 / per, 1)}
        print(f"B={B}: step {per:.3f} ms  aggregate {B * 1e3 / per:.0f} "
              f"frames/s", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
