"""RANSAC solve cost: batched-Cholesky custom-call vs unrolled jnp Cholesky.

The [64,9,9] Cholesky custom-call costs 59us on v5e (x2 eyes = 119us/step).
An unrolled Cholesky + substitution in pure jnp is ~300 tiny [H]-vector ops
that fuse into the surrounding graph.  Also: vmap the two eyes into one call.
"""
import time

import numpy as np


def chol9(M):
    """Unrolled Cholesky of [..., 9, 9] SPD matrices -> list of columns."""
    import jax.numpy as jnp
    n = M.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = M[..., j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(d, 1e-30))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    return L


def chol9_solve(L, b):
    """Solve L L^T x = b with unrolled substitutions. b: [..., 9]."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    import jax.numpy as jnp
    return jnp.stack(x, axis=-1)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    H2 = 128  # both eyes stacked
    A = rng.normal(size=(H2, 8, 9)).astype(np.float32)
    M = np.einsum("hki,hkj->hij", A, A)
    M = M + 1e-6 * np.trace(M, axis1=1, axis2=2)[:, None, None] * np.eye(
        9, dtype=np.float32)
    Mj = jnp.asarray(M)

    def solve_custom(M):
        L = jnp.linalg.cholesky(M)
        x = jnp.full(M.shape[:-1], 1.0 / 3.0, M.dtype)
        for _ in range(2):
            y = jax.scipy.linalg.cho_solve((L, True), x[..., None])[..., 0]
            x = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True),
                                1e-30)
        return x

    def solve_unrolled(M):
        L = chol9(M)
        x = jnp.full(M.shape[:-1], 1.0 / 3.0, M.dtype)
        for _ in range(2):
            y = chol9_solve(L, x)
            x = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True),
                                1e-30)
        return x

    a = np.asarray(jax.jit(solve_custom)(Mj))
    b = np.asarray(jax.jit(solve_unrolled)(Mj))
    # nullspace vectors are sign-ambiguous
    diff = np.minimum(np.abs(a - b), np.abs(a + b)).max()
    print(f"max|diff| {diff:.2e}")

    from jax import lax
    N = 50

    def timed(name, fn):
        def body(c, _):
            return c + fn(Mj + c * 1e-12).sum(), None

        run = jax.jit(lambda: lax.scan(body, jnp.float32(0), None, length=N)[0])
        run(); jax.block_until_ready(run())
        t0 = time.perf_counter(); jax.block_until_ready(run())
        print(f"{name:<26}{(time.perf_counter()-t0)/N*1e6:9.1f} us")

    timed("custom-call cholesky", solve_custom)
    timed("unrolled cholesky", solve_unrolled)
    import jax as j
    print("backend:", j.default_backend())


if __name__ == "__main__":
    main()
