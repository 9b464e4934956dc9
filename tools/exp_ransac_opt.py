"""Experiments: SVD-free 8-point nullspace for batched RANSAC.

The per-hypothesis jnp.linalg.svd (8x9 + 3x3 rank-2) dominates the VO step
(~5.5 ms of ~12 ms, tools/exp_step_ablate.py).  The nullspace of the 8x9
design matrix A is the 0-eigenvector of M = A^T A (exactly rank<=8), which
inverse iteration recovers in 1-2 solves; rank-2 enforcement is dropped for
scoring (RANSAC tolerance absorbs it; the model is only used for inlier
gating, never for geometry).

Variants:
  S. current SVD path
  E. eigh on [H,9,9]
  I. inverse iteration (Cholesky, 2 iters)
  P. shifted power iteration (matvec only)
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.solver.ransac import (
        ransac_fundamental, _normalize_pts, _sampson_sq, _solve_eight_point)

    H_hyp = 64
    N = 1536
    rng = np.random.default_rng(0)

    # synthetic epipolar-consistent correspondences + outliers
    K = np.array([[718.0, 0, 620.0], [0, 718.0, 188.0], [0, 0, 1.0]])
    pts = rng.uniform([-20, -10, 5], [20, 10, 60], (N, 3))
    Rw = np.eye(3)
    t = np.array([0.05, 0.02, 0.8])
    P1 = (pts @ Rw.T)
    P2 = (pts - t) @ Rw.T
    p1 = (P1 @ K.T); p1 = p1[:, :2] / p1[:, 2:]
    p2 = (P2 @ K.T); p2 = p2[:, :2] / p2[:, 2:]
    p1 += rng.normal(0, 0.3, p1.shape)
    p2 += rng.normal(0, 0.3, p2.shape)
    out = rng.random(N) < 0.25
    p2[out] += rng.uniform(5, 40, (out.sum(), 2))
    mask = np.ones(N, bool)
    p1 = jnp.asarray(p1, jnp.float32)
    p2 = jnp.asarray(p2, jnp.float32)
    mask_j = jnp.asarray(mask)
    key = jax.random.PRNGKey(0)

    def build_M(p1s, p2s):
        x1, y1 = p1s[..., 0], p1s[..., 1]
        x2, y2 = p2s[..., 0], p2s[..., 1]
        ones = jnp.ones_like(x1)
        A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2,
                       x1, y1, ones], axis=-1)          # [H,8,9]
        return jnp.einsum("hki,hkj->hij", A, A)         # [H,9,9]

    def nullvec_eigh(M):
        w, V = jnp.linalg.eigh(M)
        return V[..., 0]

    def nullvec_inv(M, iters=2):
        Hh = M.shape[0]
        eps = 1e-8 * jnp.trace(M, axis1=-2, axis2=-1)[:, None, None]
        L = jnp.linalg.cholesky(M + eps * jnp.eye(9)[None])
        x = jnp.ones((Hh, 9), M.dtype) / 3.0
        for _ in range(iters):
            y = jax.scipy.linalg.cho_solve((L, True), x[..., None])[..., 0]
            x = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
        return x

    def nullvec_pow(M, iters=16):
        # B = lam*I - M with lam ~= 1.1*lambda_max (4 power iters on M)
        Hh = M.shape[0]
        v = jnp.ones((Hh, 9), M.dtype) / 3.0
        for _ in range(4):
            v = jnp.einsum("hij,hj->hi", M, v)
            v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        lam = 1.1 * jnp.einsum("hi,hij,hj->h", v, M, v)[:, None, None]
        B = lam * jnp.eye(9)[None] - M
        x = jnp.ones((Hh, 9), M.dtype) / 3.0
        for _ in range(iters):
            x = jnp.einsum("hij,hj->hi", B, x)
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x

    def make_ransac(nullvec):
        def run(p1, p2, mask, key, n_iters=H_hyp, threshold=1.0):
            p1n, T1 = _normalize_pts(p1, mask)
            p2n, T2 = _normalize_pts(p2, mask)
            logits = jnp.where(mask, 0.0, -1e9)
            keys = jax.random.split(key, n_iters)
            idx = jax.vmap(
                lambda k: jax.random.categorical(k, logits, shape=(8,)))(keys)
            M = build_M(p1n[idx], p2n[idx])
            f = nullvec(M)                               # [H,9]
            Fn = f.reshape(-1, 3, 3)
            Fpix = jnp.einsum("ji,hjk,kl->hil", T2, Fn, T1)
            d2 = jax.vmap(lambda F: _sampson_sq(F, p1, p2))(Fpix)  # [H,N]
            inl = mask[None] & (d2 <= threshold * threshold)
            scores = jnp.sum(inl.astype(jnp.int32), axis=1)
            best = jnp.argmax(scores)
            return scores[best], inl[best]
        return run

    # quality: inlier recovery vs truth
    base = ransac_fundamental(p1, p2, mask_j, key, n_iters=H_hyp)
    base_inl = np.asarray(base.inliers)
    print(f"SVD baseline: {base_inl.sum()} inliers; "
          f"outlier leak {int((base_inl & out).sum())}, "
          f"inlier loss {int((~base_inl & ~out).sum())} of {int((~out).sum())}")
    impls = {"eigh": nullvec_eigh, "inv2": nullvec_inv, "pow16": nullvec_pow}
    for name, nv in impls.items():
        s, inl = make_ransac(nv)(p1, p2, mask_j, key)
        inl = np.asarray(inl)
        print(f"{name:>6}: {inl.sum()} inliers; "
              f"outlier leak {int((inl & out).sum())}, "
              f"inlier loss {int((~inl & ~out).sum())}")

    # timing
    def timed(name, fn):
        def body(c, _):
            s, _ = fn(p1 + c * 1e-9, p2, mask_j, key)
            return c + s.astype(jnp.float32) * 0.0, None

        run = jax.jit(lambda: lax.scan(body, jnp.float32(0.0), None,
                                       length=20)[0])
        run(); jax.block_until_ready(run())
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        print(f"{name:<28}{(time.perf_counter()-t0)/20*1e3:9.3f} ms")

    def svd_run(p1, p2, mask, key):
        r = ransac_fundamental(p1, p2, mask, key, n_iters=H_hyp)
        return r.n_inliers, r.inliers

    timed("S svd (current)", svd_run)
    for name, nv in impls.items():
        timed(name, make_ransac(nv))
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
