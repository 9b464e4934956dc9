"""Is the per-GN-iteration 6x6 eigh a step-time lever?

Measures, by scan-length slope on the real backend:
  A: eigh-based solve + cond guard (what _eval_rgn ships)
  B: Cholesky solve + NaN guard (candidate cheap path)
  C: the full _eval_rgn at N=1024 (context: everything else in one GN iter)

Usage: PYTHONPATH=/root/repo TPU_RUN_TIMEOUT=900 bash tools/tpu_run.sh tools/exp_eigh_cost.py
"""
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    A0 = rng.normal(0, 1, (64, 6)).astype(np.float32)
    H0 = jnp.asarray(A0.T @ A0 + 1e-3 * np.eye(6, dtype=np.float32))
    g0 = jnp.asarray(rng.normal(0, 1, 6).astype(np.float32))

    def eigh_solve(H, g):
        w, V = jnp.linalg.eigh(H)
        cond = w[5] / jnp.where(w[0] <= 0.0, jnp.nan, w[0])
        bad = ~jnp.isfinite(cond) | (cond > 1e8)
        w_inv = jnp.where(w > w[5] * 1e-9, 1.0 / jnp.where(w > 0, w, 1.0), 0.0)
        return V @ (w_inv * (V.T @ g)), bad

    def chol_solve(H, g):
        L = jnp.linalg.cholesky(H + 1e-9 * jnp.eye(6))
        dx = jax.scipy.linalg.cho_solve((L, True), g)
        bad = ~jnp.all(jnp.isfinite(dx))
        return jnp.where(bad, 0.0, dx), bad

    def make_loop(solver):
        def run(n):
            def body(c, _):
                acc, = c
                H = H0 + acc * 1e-20 * jnp.eye(6)
                dx, bad = solver(H, g0 + acc * 1e-20)
                return (acc + jnp.sum(dx) + bad.astype(jnp.float32),), None
            return lax.scan(body, (jnp.float32(0),), None, length=n)[0][0]
        return jax.jit(run, static_argnames=())

    # full _eval_rgn context
    from rso.config import LeastSquaresParams
    from rso.geometry.stereo_camera import StereoCamera
    from rso.solver.robust_gn import _eval_rgn

    cam = StereoCamera.make(fx_l=718.0, fy_l=718.0, cx_l=620.0, cy_l=188.0,
                            baseline=0.54)
    N = 1024
    lmks = jnp.asarray(np.stack([rng.uniform(-10, 10, N),
                                 rng.uniform(-5, 5, N),
                                 rng.uniform(5, 40, N)], -1), np.float32)
    params = LeastSquaresParams()
    from rso.geometry import project_stereo_with_jacobian
    obs, _ = project_stereo_with_jacobian(cam, lmks, jnp.zeros(6))
    mask = jnp.ones(N, bool)

    def full_iter(n):
        def body(c, _):
            acc, = c
            dx, cost, res, bad = _eval_rgn(cam, lmks, obs, mask,
                                           jnp.zeros(6) + acc * 1e-20, params)
            return (acc + jnp.sum(dx) + cost,), None
        return lax.scan(body, (jnp.float32(0),), None, length=n)[0][0]

    def slope(fn, n1=50, n2=400):
        fa = jax.jit(lambda: fn(n1))
        fb = jax.jit(lambda: fn(n2))
        jax.block_until_ready(fa()); jax.block_until_ready(fb())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(fa())
            ta = time.perf_counter() - t0
            t0 = time.perf_counter(); jax.block_until_ready(fb())
            tb = time.perf_counter() - t0
            best = min(best, (tb - ta) / (n2 - n1))
        return best * 1e6

    def loop_slope(solver):
        def run(n):
            def body(c, _):
                acc, = c
                H = H0 + acc * 1e-20 * jnp.eye(6)
                dx, bad = solver(H, g0 + acc * 1e-20)
                return (acc + jnp.sum(dx) + bad.astype(jnp.float32),), None
            return lax.scan(body, (jnp.float32(0),), None, length=n)[0][0]
        return slope(run)

    print(f"eigh 6x6 solve+guard : {loop_slope(eigh_solve):8.2f} us/iter",
          flush=True)
    print(f"chol 6x6 solve+guard : {loop_slope(chol_solve):8.2f} us/iter",
          flush=True)
    print(f"full _eval_rgn N=1024: {slope(full_iter):8.2f} us/iter",
          flush=True)


if __name__ == "__main__":
    main()
