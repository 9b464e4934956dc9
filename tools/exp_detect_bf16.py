"""A/B detect_bf16 (and ransac_iters) on step device time + trajectory ATE.

Step time via scan-length slope; ATE on the bench accuracy scene
(40 frames, KITTI size, speed 0.8), same as exp_ransac_ate.
"""
import dataclasses
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.engine import Engine, init_state, make_step
    from rso.geometry import pose_matrix
    from rso.geometry.stereo_camera import StereoCamera
    from rso.metrics.ate import ate_rmse
    from rso.synthetic import make_sequence, synthetic_config

    W, H = 1241, 376
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    seq = make_sequence(n_frames=40, n_points=2000, H=H, W=W, cam=cam,
                        speed=0.8)
    base = synthetic_config()
    img_l = jnp.asarray(seq.frames[0][0])
    img_r = jnp.asarray(seq.frames[0][1])
    N1, N2, PASSES = 20, 120, 4

    def step_slope(cfg):
        step = make_step(cfg, cam, H, W)
        st0 = init_state(cfg, (H, W))
        st0, _ = jax.jit(step)(st0, img_l, img_r)
        st0 = jax.block_until_ready(st0)

        def body(st, _):
            st, _res = step(st, img_l, img_r)
            return st, None

        def t(n):
            run = jax.jit(lambda: lax.scan(body, st0, None, length=n)[0])
            jax.block_until_ready(run())
            best = 1e9
            for _ in range(PASSES):
                t0 = time.perf_counter()
                jax.block_until_ready(run())
                best = min(best, time.perf_counter() - t0)
            return best

        return (t(N2) - t(N1)) / (N2 - N1) * 1e3

    def ate(cfg):
        eng = Engine(cfg, seq.cam)
        T = np.eye(4)
        est = [T.copy()]
        for l, r in seq.frames:
            res = eng.process_frame(l, r)
            if bool(res.valid):
                T = T @ np.asarray(pose_matrix(res.pose))
            est.append(T.copy())
        return ate_rmse(np.asarray(est[1:]), seq.poses)

    variants = {
        "default (f32, ransac 64)": base,
        "detect_bf16": base.replace(
            tpu=dataclasses.replace(base.tpu, detect_bf16=True)),
        "ransac 32": base.replace(
            tpu=dataclasses.replace(base.tpu, ransac_iters=32)),
        "bf16 + ransac 32": base.replace(
            tpu=dataclasses.replace(base.tpu, detect_bf16=True,
                                    ransac_iters=32)),
    }
    for name, cfg in variants.items():
        dt = step_slope(cfg)
        a = ate(cfg)
        print(f"{name:<28}{dt:8.3f} ms/step   ATE {a:7.4f} m", flush=True)
    print(f"backend: {jax.default_backend()}")


if __name__ == "__main__":
    main()
