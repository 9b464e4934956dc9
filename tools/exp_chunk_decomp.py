"""Decompose the bench gap: slope+intercept of process_chunk at N=120/480.

bench.py reports ~976 FPS (1.02 ms/frame) while the make_step scan slope
says 0.67 ms/frame — this measures the actual chunk surface bench.py times:
scan over 480 DISTINCT stacked frames (xs-streamed) vs the 2-image
where-select used by tools/bench_slope.py, plus the dispatch intercept.
"""
import time


def main():
    import jax
    import jax.numpy as jnp

    from rso.engine import Engine, init_state
    from rso.geometry.stereo_camera import StereoCamera
    from rso.synthetic import make_sequence, synthetic_config

    import numpy as np

    H, W = 376, 1241
    N = 240
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    print("generating scene...", flush=True)
    seq = make_sequence(n_frames=N, n_points=4000, H=H, W=W, cam=cam,
                        speed=0.8)
    eng = Engine(synthetic_config(), seq.cam)
    lefts = jax.device_put(jnp.stack([jnp.asarray(l) for l, _ in seq.frames]))
    rights = jax.device_put(jnp.stack([jnp.asarray(r) for _, r in seq.frames]))
    del seq.frames[:]
    print("frame dtype:", lefts.dtype, "stack GB:",
          round(lefts.nbytes * 2 / 1e9, 3), flush=True)

    st_init = jax.device_put(init_state(eng.cfg, (H, W)))
    jax.block_until_ready(st_init.last_pose)

    def timed(n, passes=4):
        ls, rs = lefts[:n], rights[:n]
        eng.state = st_init
        r = eng.process_chunk(ls, rs)
        jax.block_until_ready(r.pose)
        best = 1e9
        for _ in range(passes):
            eng.state = st_init
            t0 = time.perf_counter()
            r = eng.process_chunk(ls, rs)
            jax.block_until_ready(r.pose)
            best = min(best, time.perf_counter() - t0)
        return best

    t120 = timed(60)
    t480 = timed(240)
    slope = (t480 - t120) / 180.0
    intercept = t120 - slope * 60
    print(f"t(60)={t120*1e3:8.1f} ms  t(240)={t480*1e3:8.1f} ms")
    print(f"chunk slope: {slope*1e3:.3f} ms/frame ({1.0/slope:.0f} FPS)")
    print(f"intercept (dispatch+fixed): {intercept*1e3:.1f} ms")
    print(f"240-frame average: {t480/240*1e3:.3f} ms/frame "
          f"({240/t480:.0f} FPS)")
    print("backend:", jax.default_backend(), jax.devices()[0])


if __name__ == "__main__":
    main()
