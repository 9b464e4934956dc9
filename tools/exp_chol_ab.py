"""Interleaved step A/B: GN solve_backend eigh vs chol.

tools/exp_eigh_cost.py measured the eigh solve+guard at 5.2 us of the
15.8 us GN iteration; with ~10-20 iterations per frame that projects to a
~5% step win.  Decide it the only valid way (docs/PERF.md): same-claim
A,B,A,B step slopes.

Usage: PYTHONPATH=/root/repo TPU_RUN_TIMEOUT=1800 bash tools/tpu_run.sh tools/exp_chol_ab.py
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

    def build(backend):
        cfg = synthetic_config()
        cfg = cfg.replace(least_squares=dataclasses.replace(
            cfg.least_squares, solve_backend=backend))
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

        runs = {}
        for n in (20, 120):
            runs[n] = jax.jit(
                lambda n=n: lax.scan(body, (st0, jnp.bool_(True)), None,
                                     length=n)[0])
            jax.block_until_ready(runs[n]())
        return runs

    A = build("eigh")
    B = build("chol")

    def slope(runs):
        ts = {}
        for n in (20, 120):
            t0 = time.perf_counter()
            jax.block_until_ready(runs[n]())
            ts[n] = time.perf_counter() - t0
        return (ts[120] - ts[20]) / 100 * 1e3

    rounds = []
    for r in range(8):
        a = slope(A)
        b = slope(B)
        rounds.append((a, b))
        print(f"round {r}: eigh {a:.3f} ms  chol {b:.3f} ms  "
              f"delta {b - a:+.3f}", flush=True)

    import numpy as np
    arr = np.asarray(rounds)
    am, bm = np.median(arr[:, 0]), np.median(arr[:, 1])
    print(f"median: eigh {am:.3f} ms  chol {bm:.3f} ms  "
          f"delta {bm - am:+.3f} ms  ({(bm - am) / am * 100:+.1f}%)",
          flush=True)


if __name__ == "__main__":
    main()
