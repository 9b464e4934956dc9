"""Slope-method device time for the full VO step: (t(N2)-t(N1))/(N2-N1).

Scan-length slope cancels the per-dispatch tunnel RTT; min over passes
rejects transient noise.  The trustworthy full-step number.
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

    N1, N2, PASSES = 20, 120, 5

    def timer(n):
        run = jax.jit(lambda: lax.scan(body, (st0, jnp.bool_(True)), None,
                                       length=n)[0])
        jax.block_until_ready(run())
        best = 1e9
        for _ in range(PASSES):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timer(N1), timer(N2)
    per = (t2 - t1) / (N2 - N1) * 1e3
    print(f"t(N={N1})={t1 * 1e3:8.2f} ms   t(N={N2})={t2 * 1e3:8.2f} ms")
    print(f"full step device time: {per:.3f} ms  ({1e3 / per:.0f} FPS)")
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
