"""Round-3 follow-up TPU measurements (one claim, risk-sorted).

1. ransac_iters 128 vs 256 full-step slope (prices the measured -7.8% ATE)
2. candidate new default: use_fused_match + ransac256 step slope
3. Pallas detect kernel (TILE_H=32 VMEM fix): agreement + slope, guarded
"""
import dataclasses
import time
import traceback


def main():
    import numpy as np
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
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

    def step_slope(cfg, label):
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
        print(f"step ({label}): {per:.3f} ms ({1e3 / per:.0f} FPS)",
              flush=True)

    cfg0 = synthetic_config()
    step_slope(cfg0, "default r128")
    step_slope(cfg0.replace(tpu=dataclasses.replace(
        cfg0.tpu, ransac_iters=256)), "r256")
    step_slope(cfg0.replace(tpu=dataclasses.replace(
        cfg0.tpu, use_fused_match=True, ransac_iters=256)), "fused+r256")

    # ---- Pallas detect (riskiest last, guarded) -----------------------------
    try:
        from rso.kernels.fast_detect import (corner_response_jnp,
                                             corner_response_pallas)

        imgf = jnp.asarray(seq.frames[0][0], jnp.float32)
        th = jnp.int32(20)
        ref = np.asarray(corner_response_jnp(imgf, th))
        out = np.asarray(corner_response_pallas(imgf, th))
        inner = np.s_[5:-5, 5:-5]
        mask_agree = (np.isneginf(ref[inner]) == np.isneginf(out[inner])).mean()
        finite = ~np.isneginf(ref[inner])
        val_err = np.abs(ref[inner][finite] - out[inner][finite]).max() if \
            finite.any() else 0.0
        print(f"pallas-detect mask agreement {mask_agree:.6f}, "
              f"max |resp err| {val_err:.2e}", flush=True)

        def t_of(body, n, passes=4):
            run = jax.jit(lambda: lax.scan(body, jnp.float32(0), None,
                                           length=n)[0])
            jax.block_until_ready(run())
            best = 1e9
            for _ in range(passes):
                t0 = time.perf_counter()
                jax.block_until_ready(run())
                best = min(best, time.perf_counter() - t0)
            return best

        def pallas_body(c, _):
            o = corner_response_pallas(imgf + c * 1e-9, th)
            return c + o.max(), None

        def xla_body(c, _):
            o = corner_response_jnp(imgf + c * 1e-9, th)
            return c + o.max(), None

        for name, body in (("XLA", xla_body), ("Pallas", pallas_body)):
            per = (t_of(body, 150) - t_of(body, 30)) / 120 * 1e3
            print(f"detect core {name}: {per:.4f} ms", flush=True)
    except Exception:
        traceback.print_exc()

    print("followup done", flush=True)


if __name__ == "__main__":
    main()
