"""BA iteration anatomy: what bounds the 676 LM iters/s (VERDICT r4 #8).

Scan-slope decomposition of one LM iteration at the bench BA shape
(P=8 poses, L=1024 landmarks, dense [P,L] observation grid):
  * full bundle_adjust slope over max_iters (tol=0 so every iter runs)
  * ba_normal_equations in isolation (projection + Jacobians + H blocks)
  * _schur_solve in isolation (landmark 3x3 inversions + [P*6,P*6] solve)
  * eval_cost in isolation (the candidate-acceptance projection pass)
The residual (full - parts) is while_loop overhead + accept/where plumbing.

Usage: TPU_RUN_TIMEOUT=2400 PYTHONPATH=/root/repo bash tools/tpu_run.sh \
           tools/exp_ba_anatomy.py [--json docs/artifacts/ba_anatomy_r5.json]
Reference anchor: the H/g accumulation + solve this generalizes,
stage5_optimization.cpp:363-388.
"""
import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

N1, N2 = 10, 60


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--P", type=int, default=8)
    ap.add_argument("--L", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.ba import BAProblem, bundle_adjust
    from rso.ba.ba import (_project_grid, _robust_weights, _schur_solve,
                           ba_normal_equations)
    from rso.geometry.stereo_camera import StereoCamera

    P, L = args.P, args.L
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=620.5,
                            cy_l=188.0, baseline=0.5371)
    rng = np.random.default_rng(0)
    poses0 = jnp.zeros((P, 6), jnp.float32).at[:, 5].set(
        jnp.arange(P, dtype=jnp.float32) * -0.4)
    lmks0 = jnp.asarray(np.stack([rng.uniform(-10, 10, L),
                                  rng.uniform(-5, 5, L),
                                  rng.uniform(5, 40, L)], -1), jnp.float32)
    obs, _, _ = _project_grid(cam, poses0, lmks0)
    obs = jax.block_until_ready(obs)
    prob = BAProblem(poses=poses0 + 0.01, lmks=lmks0 + 0.05, obs=obs,
                     mask=jnp.ones((P, L), bool))
    lmk_valid = jnp.ones(L, bool)

    def slope_us(fn, *fargs):
        def t(n):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(*fargs, n))
                best = min(best, time.perf_counter() - t0)
            return best

        jax.block_until_ready(fn(*fargs, N1))
        jax.block_until_ready(fn(*fargs, N2))
        return (t(N2) - t(N1)) / (N2 - N1) * 1e6

    # full LM iteration (tol=0: every iteration runs; slope over max_iters)
    jitted = {n: jax.jit(lambda pr, n=n: bundle_adjust(
        cam, pr, max_iters=n, tol=0.0).poses) for n in (N1, N2)}

    def full_slope():
        def t(n):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(jitted[n](prob))
                best = min(best, time.perf_counter() - t0)
            return best

        jax.block_until_ready(jitted[N1](prob))
        jax.block_until_ready(jitted[N2](prob))
        return (t(N2) - t(N1)) / (N2 - N1) * 1e6

    rows = {}
    rows["full_iter_us"] = full_slope()
    print(f"full LM iteration     {rows['full_iter_us']:8.1f} us", flush=True)

    # parts, each carry-perturbed in a scan
    @partial(jax.jit, static_argnames=("n",))
    def run_ne(poses, lmks, n):
        def body(carry, _):
            acc = carry
            p = BAProblem(poses=poses + acc * 1e-30, lmks=lmks,
                          obs=prob.obs, mask=prob.mask)
            c, g_p, g_l, H_pp, H_ll, H_pl, _r2, _m = ba_normal_equations(
                cam, p, 3.0, True)
            out = (c + jnp.sum(g_p) + jnp.sum(g_l) + jnp.sum(H_pp)
                   + jnp.sum(H_ll) + jnp.sum(H_pl))
            return out * 1e-30, None

        return lax.scan(body, jnp.float32(0), None, length=n)[0]

    rows["normal_eq_us"] = slope_us(run_ne, prob.poses, prob.lmks)
    print(f"ba_normal_equations   {rows['normal_eq_us']:8.1f} us", flush=True)

    # fixed NE blocks for the isolated schur timing
    c0, g_p0, g_l0, H_pp0, H_ll0, H_pl0, _, _ = jax.jit(
        lambda p: ba_normal_equations(cam, p, 3.0, True))(prob)
    g_p0, g_l0, H_pp0, H_ll0, H_pl0 = jax.block_until_ready(
        (g_p0, g_l0, H_pp0, H_ll0, H_pl0))

    @partial(jax.jit, static_argnames=("n",))
    def run_schur(g_p, g_l, H_pp, H_ll, H_pl, n):
        def body(carry, _):
            acc = carry
            dpose, dlmk = _schur_solve(g_p + acc * 1e-30, g_l, H_pp, H_ll,
                                       H_pl, jnp.float32(1e-4), True,
                                       lmk_valid)
            return (jnp.sum(dpose) + jnp.sum(dlmk)) * 1e-30, None

        return lax.scan(body, jnp.float32(0), None, length=n)[0]

    rows["schur_solve_us"] = slope_us(run_schur, g_p0, g_l0, H_pp0, H_ll0,
                                      H_pl0)
    print(f"_schur_solve          {rows['schur_solve_us']:8.1f} us",
          flush=True)

    @partial(jax.jit, static_argnames=("n",))
    def run_cost(poses, lmks, n):
        def body(carry, _):
            acc = carry
            pix, _, _ = _project_grid(cam, poses + acc * 1e-30, lmks)
            r2 = jnp.sum((prob.obs - pix) ** 2, axis=-1)
            _, fi = _robust_weights(r2, 3.0, True)
            m = (prob.mask & jnp.all(jnp.isfinite(pix), -1)).astype(fi.dtype)
            return jnp.sum(m * fi) * 1e-30, None

        return lax.scan(body, jnp.float32(0), None, length=n)[0]

    rows["eval_cost_us"] = slope_us(run_cost, prob.poses, prob.lmks)
    print(f"eval_cost             {rows['eval_cost_us']:8.1f} us", flush=True)

    parts = (rows["normal_eq_us"] + rows["schur_solve_us"]
             + rows["eval_cost_us"])
    rows["parts_sum_us"] = parts
    rows["residual_us"] = rows["full_iter_us"] - parts
    print(f"parts sum             {parts:8.1f} us "
          f"(residual {rows['residual_us']:+.1f} us = while_loop/accept "
          f"plumbing)", flush=True)

    out = {"backend": jax.default_backend(), "P": P, "L": L, **rows}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
