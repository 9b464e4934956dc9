"""Geometry core tests: Rodrigues + derivatives vs jacfwd/finite differences,
pose algebra round-trips, projection Jacobian correctness.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rso.geometry import (
    StereoCamera,
    pose_compose,
    pose_from_matrix,
    pose_inverse,
    pose_matrix,
    pose_apply,
    project_stereo,
    project_stereo_with_jacobian,
    rodrigues,
    rodrigues_with_grad,
    rotvec_from_matrix,
    triangulate,
)

CAM = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=607.19, cy_l=185.21,
                        baseline=0.5371)


def random_w(rng, scale=1.0):
    return jnp.asarray(rng.normal(size=3) * scale, dtype=jnp.float32)


class TestRodrigues:
    def test_identity(self):
        R = rodrigues(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-7)

    def test_orthonormal(self, rng):
        for scale in (1e-7, 1e-3, 0.5, 2.0):
            w = random_w(rng, scale)
            R = rodrigues(w)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-5

    def test_matches_scipy(self, rng):
        from scipy.spatial.transform import Rotation
        w = random_w(rng, 0.8)
        R = rodrigues(w)
        R_ref = Rotation.from_rotvec(np.asarray(w)).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_grad_matches_jacfwd(self, rng):
        for scale in (1e-7, 1e-4, 0.3, 1.5):
            w = random_w(rng, scale)
            _, dR = rodrigues_with_grad(w)
            dR_auto = jax.jacfwd(rodrigues)(w)  # [3,3,3] with last axis = dw
            dR_auto = jnp.moveaxis(dR_auto, -1, 0)
            np.testing.assert_allclose(dR, dR_auto, atol=2e-4)

    def test_grad_finite_difference(self, rng):
        w = random_w(rng, 0.7)
        eps = 1e-3  # f32 central differences
        _, dR = rodrigues_with_grad(w)
        for k in range(3):
            dw = np.zeros(3, dtype=np.float32)
            dw[k] = eps
            fd = (rodrigues(w + dw) - rodrigues(w - dw)) / (2 * eps)
            np.testing.assert_allclose(dR[k], fd, atol=5e-3)

    def test_rotvec_roundtrip(self, rng):
        for scale in (1e-6, 0.1, 1.0, 3.0):
            w = random_w(rng, scale)
            w2 = rotvec_from_matrix(rodrigues(w))
            np.testing.assert_allclose(
                rodrigues(w2), rodrigues(w), atol=1e-4,
            )


class TestPose:
    def test_inverse(self, rng):
        p = jnp.asarray(rng.normal(size=6), dtype=jnp.float32)
        pinv = pose_inverse(p)
        T = pose_matrix(p) @ pose_matrix(pinv)
        np.testing.assert_allclose(T, np.eye(4), atol=1e-5)

    def test_compose_matches_matrix_product(self, rng):
        a = jnp.asarray(rng.normal(size=6) * 0.5, dtype=jnp.float32)
        b = jnp.asarray(rng.normal(size=6) * 0.5, dtype=jnp.float32)
        c = pose_compose(a, b)
        np.testing.assert_allclose(
            pose_matrix(c), pose_matrix(a) @ pose_matrix(b), atol=1e-4
        )

    def test_matrix_roundtrip(self, rng):
        p = jnp.asarray(rng.normal(size=6) * 0.8, dtype=jnp.float32)
        p2 = pose_from_matrix(pose_matrix(p))
        np.testing.assert_allclose(pose_matrix(p2), pose_matrix(p), atol=1e-4)

    def test_apply(self, rng):
        p = jnp.asarray(rng.normal(size=6) * 0.5, dtype=jnp.float32)
        pts = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
        out = pose_apply(p, pts)
        T = pose_matrix(p)
        expect = pts @ np.asarray(T[:3, :3]).T + np.asarray(T[:3, 3])
        np.testing.assert_allclose(out, expect, atol=1e-5)


class TestStereoProjection:
    def _make_landmarks(self, rng, n=50):
        pts = np.stack(
            [
                rng.uniform(-5, 5, n),
                rng.uniform(-3, 3, n),
                rng.uniform(2.0, 30.0, n),
            ],
            axis=-1,
        )
        return jnp.asarray(pts, dtype=jnp.float32)

    def test_triangulate_project_roundtrip(self, rng):
        """Project with identity pose then triangulate: must recover the points."""
        lmks = self._make_landmarks(rng)
        pix = project_stereo(CAM, lmks, jnp.zeros(6))
        rec = triangulate(CAM, pix[:, 0], pix[:, 1], pix[:, 2])
        np.testing.assert_allclose(rec, lmks, rtol=1e-3, atol=1e-2)

    def test_epipolar_rows_equal(self, rng):
        """Rectified pair: vl == vr for fy_l == fy_r, cy_l == cy_r."""
        lmks = self._make_landmarks(rng)
        pix = project_stereo(CAM, lmks, jnp.asarray([0.01, -0.02, 0.005, 0.1, -0.05, 0.2]))
        np.testing.assert_allclose(pix[:, 1], pix[:, 3], atol=1e-4)

    def test_jacobian_matches_jacfwd(self, rng):
        lmks = self._make_landmarks(rng, n=20)
        pose = jnp.asarray([0.02, -0.01, 0.03, 0.1, -0.2, 0.05], dtype=jnp.float32)
        _, J = project_stereo_with_jacobian(CAM, lmks, pose)
        J_auto = jax.jacfwd(lambda p: project_stereo(CAM, lmks, p))(pose)  # [N,4,6]
        np.testing.assert_allclose(J, J_auto, rtol=1e-3, atol=1e-2)

    def test_jacobian_small_angle(self, rng):
        lmks = self._make_landmarks(rng, n=10)
        pose = jnp.asarray([1e-8, 0, 0, 0.01, 0, 0], dtype=jnp.float32)
        _, J = project_stereo_with_jacobian(CAM, lmks, pose)
        J_auto = jax.jacfwd(lambda p: project_stereo(CAM, lmks, p))(pose)
        np.testing.assert_allclose(J, J_auto, rtol=1e-3, atol=1e-2)

    def test_disparity_positive(self, rng):
        lmks = self._make_landmarks(rng)
        pix = project_stereo(CAM, lmks, jnp.zeros(6))
        disparity = pix[:, 0] - pix[:, 2]
        assert np.all(np.asarray(disparity) > 0)

    def test_jittable(self, rng):
        lmks = self._make_landmarks(rng, n=8)
        f = jax.jit(lambda l, p: project_stereo_with_jacobian(CAM, l, p))
        pix, J = f(lmks, jnp.zeros(6))
        assert pix.shape == (8, 4) and J.shape == (8, 4, 6)
