"""Step-slope cost of ransac_iters 128 -> 256 (one TPU claim).

tools/exp_ate_levers.py measured -7.8% mean ATE from a 256-hypothesis pool
(every seed improves; 3 seeds x 100 frames).  This prices it: full-step
scan-length slope at both settings in one process.
"""
import dataclasses
import time


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
    img = [jnp.asarray(seq.frames[i][j]) for i in range(2) for j in range(2)]
    print("backend:", jax.default_backend(), flush=True)

    for iters in (128, 256):
        cfg = synthetic_config()
        cfg = cfg.replace(tpu=dataclasses.replace(cfg.tpu,
                                                  ransac_iters=iters))
        step = make_step(cfg, cam, H, W)
        st0 = init_state(cfg, (H, W))
        st0, _ = jax.jit(step)(st0, img[0], img[1])
        st0 = jax.block_until_ready(st0)

        def body(carry, _):
            st, flip = carry
            l = jnp.where(flip, img[0], img[2])
            r = jnp.where(flip, img[1], img[3])
            st, _res = step(st, l, r)
            return (st, ~flip), None

        def t(n):
            run = jax.jit(lambda: lax.scan(body, (st0, jnp.bool_(True)),
                                           None, length=n)[0])
            jax.block_until_ready(run())
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(run())
                best = min(best, time.perf_counter() - t0)
            return best

        per = (t(120) - t(20)) / 100 * 1e3
        print(f"ransac_iters={iters}: step {per:.3f} ms ({1e3 / per:.0f} FPS)",
              flush=True)


if __name__ == "__main__":
    main()
