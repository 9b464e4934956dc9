"""A/B the RANSAC nullspace variants on the bench scene's trajectory ATE.

Monkeypatches rso.solver.ransac._solve_eight_point per variant and runs the
exact bench.py accuracy scene (40 frames, KITTI size, speed 0.8).
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import rso.solver.ransac as ransac_mod
    from rso.engine import Engine
    from rso.geometry import pose_matrix
    from rso.metrics.ate import ate_rmse
    from rso.synthetic import make_sequence, synthetic_config
    from rso.geometry.stereo_camera import StereoCamera

    W, H = 1241, 376
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    seq = make_sequence(n_frames=40, n_points=2000, H=H, W=W, cam=cam,
                        speed=0.8)
    cfg = synthetic_config()

    new_solve = ransac_mod._solve_eight_point

    def svd_solve(p1n, p2n):
        def one(a, b):
            x1, y1 = a[:, 0], a[:, 1]
            x2, y2 = b[:, 0], b[:, 1]
            ones = jnp.ones_like(x1)
            A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2,
                           x1, y1, ones], axis=-1)
            _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
            F = Vt[-1].reshape(3, 3)
            U, S, Vt2 = jnp.linalg.svd(F, full_matrices=False)
            return (U * S.at[2].set(0.0)) @ Vt2

        if p1n.ndim == 2:
            return one(p1n, p2n)
        return jax.vmap(one)(p1n, p2n)

    def rank2_cheap(F):
        """F <- F - (Fv) v^T, v = 0-eigvec of F^T F by inverse iteration."""
        M = jnp.einsum("...ki,...kj->...ij", F, F)
        eps = 1e-8 * jnp.trace(M, axis1=-2, axis2=-1)[..., None, None] + 1e-12
        L = jnp.linalg.cholesky(M + eps * jnp.eye(3, dtype=M.dtype))
        v = jnp.full(M.shape[:-1], 1.0 / 3.0, M.dtype)
        import jax.scipy.linalg as jsl
        for _ in range(2):
            y = jsl.cho_solve((L, True), v[..., None])[..., 0]
            v = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True),
                                1e-30)
        Fv = jnp.einsum("...ij,...j->...i", F, v)
        return F - Fv[..., :, None] * v[..., None, :]

    def inv2_rank2(p1n, p2n):
        return rank2_cheap(new_solve(p1n, p2n))

    def run(tag, solve):
        ransac_mod._solve_eight_point = solve
        eng = Engine(cfg, cam)
        eng._step_cache.clear()
        T = np.eye(4)
        poses = [T.copy()]
        for l, r in seq.frames:
            res = eng.process_frame(jnp.asarray(l), jnp.asarray(r))
            if bool(np.asarray(res.valid)):
                T = T @ np.asarray(pose_matrix(res.pose))
            poses.append(T.copy())
        p = np.stack(poses)[: len(seq.poses)]
        print(f"{tag:<24} ATE={ate_rmse(p, seq.poses):.4f} m")

    run("svd+rank2 (old)", svd_solve)
    run("inv2 no-rank2 (current)", new_solve)
    run("inv2 + cheap rank2", inv2_rank2)
    print("backend:", jax.default_backend())


if __name__ == "__main__":
    main()
