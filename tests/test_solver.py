"""Solver tests: synthetic correspondences with known pose (+noise, +outliers),
mirroring the reference's two-phase schedule semantics, and RANSAC recovery.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rso.config import LeastSquaresParams
from rso.geometry import StereoCamera, pose_inverse, project_stereo
from rso.solver import (
    VOEC_NONE,
    ransac_fundamental,
    solve_pose,
)

CAM = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=607.19, cy_l=185.21,
                        baseline=0.5371)


def make_problem(rng, n=200, pose=None, noise=0.0, n_outliers=0, pad_to=None):
    """Build prev/cur stereo observations of a random cloud under a known motion.

    `pose` is the camera motion (current camera pose in previous camera frame);
    the solver's deltaPose is its inverse (points move opposite the camera).
    """
    if pose is None:
        pose = jnp.asarray([0.01, -0.02, 0.005, 0.05, -0.02, 0.3], dtype=jnp.float32)
    pts = np.stack([
        rng.uniform(-10, 10, n),
        rng.uniform(-5, 5, n),
        rng.uniform(5.0, 40.0, n),
    ], axis=-1).astype(np.float32)
    pts = jnp.asarray(pts)

    prev_obs = project_stereo(CAM, pts, jnp.zeros(6))
    delta = pose_inverse(pose)  # point transform from prev frame to cur frame
    cur_obs = project_stereo(CAM, pts, delta)

    if noise > 0:
        prev_obs = prev_obs + jnp.asarray(rng.normal(0, noise, prev_obs.shape), jnp.float32)
        cur_obs = cur_obs + jnp.asarray(rng.normal(0, noise, cur_obs.shape), jnp.float32)

    mask = np.ones(n, dtype=bool)
    if n_outliers > 0:
        idx = rng.choice(n, n_outliers, replace=False)
        cur = np.array(cur_obs)
        cur[idx] += rng.uniform(20, 60, size=(n_outliers, 4)).astype(np.float32)
        cur_obs = jnp.asarray(cur)

    if pad_to is not None and pad_to > n:
        pad = pad_to - n
        prev_obs = jnp.concatenate([prev_obs, jnp.zeros((pad, 4), jnp.float32)])
        cur_obs = jnp.concatenate([cur_obs, jnp.zeros((pad, 4), jnp.float32)])
        mask = np.concatenate([mask, np.zeros(pad, dtype=bool)])

    return prev_obs, cur_obs, jnp.asarray(mask), pose


class TestSolvePose:
    def test_exact_recovery(self, rng):
        prev, cur, mask, pose = make_problem(rng)
        res = solve_pose(CAM, prev, cur, mask, LeastSquaresParams())
        assert bool(res.valid)
        np.testing.assert_allclose(res.pose, pose, atol=1e-3)

    def test_noisy_recovery(self, rng):
        prev, cur, mask, pose = make_problem(rng, noise=0.3)
        res = solve_pose(CAM, prev, cur, mask, LeastSquaresParams())
        assert bool(res.valid)
        np.testing.assert_allclose(res.pose, pose, atol=0.02)

    def test_outlier_rejection(self, rng):
        """Phase-1 residual cut must reject gross outliers (robust kernel +
        residual_threshold, reference stage5_optimization.cpp:601-611)."""
        prev, cur, mask, pose = make_problem(rng, n=300, noise=0.2, n_outliers=60)
        res = solve_pose(CAM, prev, cur, mask, LeastSquaresParams())
        assert bool(res.valid)
        np.testing.assert_allclose(res.pose, pose, atol=0.03)
        n_inl = int(jnp.sum(res.inliers))
        assert 200 <= n_inl <= 260  # outliers dropped, inliers kept

    def test_masked_padding(self, rng):
        """Padded slots must not influence the solution."""
        prev, cur, mask, pose = make_problem(rng, n=150, pad_to=512)
        res = solve_pose(CAM, prev, cur, mask, LeastSquaresParams())
        assert bool(res.valid)
        np.testing.assert_allclose(res.pose, pose, atol=1e-3)

    def test_too_few_points_invalid(self, rng):
        prev, cur, mask, _ = make_problem(rng, n=200)
        mask = jnp.zeros_like(mask).at[:5].set(True)
        res = solve_pose(CAM, prev, cur, mask, LeastSquaresParams())
        assert not bool(res.valid)

    def test_warm_start(self, rng):
        """use_previous_pose_as_initial semantics: warm start reduces iterations."""
        prev, cur, mask, pose = make_problem(rng)
        cold = solve_pose(CAM, prev, cur, mask, LeastSquaresParams())
        warm = solve_pose(CAM, prev, cur, mask, LeastSquaresParams(),
                          initial_pose=cold.delta_pose)
        assert bool(warm.valid)
        assert int(warm.num_it) <= int(cold.num_it)
        np.testing.assert_allclose(warm.pose, pose, atol=1e-3)

    def test_identity_motion(self, rng):
        prev, cur, mask, pose = make_problem(rng, pose=jnp.zeros(6))
        res = solve_pose(CAM, prev, cur, mask, LeastSquaresParams())
        assert bool(res.valid)
        np.testing.assert_allclose(res.pose, jnp.zeros(6), atol=1e-4)
        assert int(res.error_code) == VOEC_NONE

    def test_jit_and_shapes(self, rng):
        prev, cur, mask, pose = make_problem(rng, n=100, pad_to=256)
        f = jax.jit(lambda p, c, m: solve_pose(CAM, p, c, m, LeastSquaresParams()))
        res = f(prev, cur, mask)
        assert res.residuals.shape == (256,)
        np.testing.assert_allclose(res.pose, pose, atol=1e-3)

    def test_no_robust_kernel(self, rng):
        prev, cur, mask, pose = make_problem(rng, noise=0.1)
        res = solve_pose(CAM, prev, cur, mask,
                         LeastSquaresParams(use_robust_kernel=False))
        assert bool(res.valid)
        np.testing.assert_allclose(res.pose, pose, atol=0.01)

    def test_larger_rotation(self, rng):
        pose = jnp.asarray([0.05, 0.1, -0.04, 0.2, 0.1, 0.8], dtype=jnp.float32)
        prev, cur, mask, pose = make_problem(rng, pose=pose)
        res = solve_pose(CAM, prev, cur, mask, LeastSquaresParams())
        assert bool(res.valid)
        np.testing.assert_allclose(res.pose, pose, atol=5e-3)


class TestRansac:
    def test_recovers_inliers(self, rng):
        n, n_out = 200, 50
        prev, cur, mask, _ = make_problem(rng, n=n, noise=0.1)
        p1 = np.array(prev[:, :2])
        p2 = np.array(cur[:, :2])
        out_idx = rng.choice(n, n_out, replace=False)
        p2[out_idx] += rng.uniform(15, 40, size=(n_out, 2))
        res = ransac_fundamental(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(mask),
            jax.random.PRNGKey(0), n_iters=128, threshold=1.0,
        )
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        # (nearly) all outliers rejected, most inliers kept
        assert inl[out_idx].sum() <= 5
        keep = np.setdiff1d(np.arange(n), out_idx)
        assert inl[keep].mean() > 0.8

    def test_degenerate_passthrough(self, rng):
        """With too few points the filter must pass matches through
        (reference stage4_match_consecutive.cpp:256-259)."""
        p1 = jnp.asarray(rng.uniform(0, 100, (30, 2)), jnp.float32)
        p2 = p1 + 1000.0  # garbage geometry
        mask = jnp.zeros(30, dtype=bool).at[:6].set(True)
        res = ransac_fundamental(p1, p2, mask, jax.random.PRNGKey(1), n_iters=16)
        assert not bool(res.ok)
        np.testing.assert_array_equal(res.inliers, mask)

    def test_jittable(self, rng):
        prev, cur, mask, _ = make_problem(rng, n=64)
        f = jax.jit(lambda a, b, m, k: ransac_fundamental(a, b, m, k, n_iters=32))
        res = f(prev[:, :2], cur[:, :2], mask, jax.random.PRNGKey(2))
        assert res.inliers.shape == (64,)


class TestLMMode:
    def test_lm_matches_gn_on_good_geometry(self, rng):
        prev, cur, mask, pose = make_problem(rng, noise=0.2)
        gn = solve_pose(CAM, prev, cur, mask, LeastSquaresParams())
        lm = solve_pose(CAM, prev, cur, mask,
                        LeastSquaresParams(use_lm=True))
        assert bool(gn.valid) and bool(lm.valid)
        np.testing.assert_allclose(np.asarray(lm.pose), np.asarray(gn.pose),
                                   atol=5e-3)

    def test_lm_survives_ill_conditioned_geometry(self):
        """A tight distant point cluster: GN aborts on the condition guard,
        LM (damped) must still return a usable estimate.

        Uses a locally-seeded rng (not the session fixture): the assertion
        that GN's condition guard fires holds for this specific geometry
        draw, not for arbitrary ones.
        """
        from rso.geometry import pose_inverse, project_stereo

        rng = np.random.default_rng(0)

        pts = jnp.asarray(np.stack([
            rng.uniform(-0.5, 0.5, 12), rng.uniform(-0.3, 0.3, 12),
            rng.uniform(55, 60, 12)], -1), jnp.float32)
        pose = jnp.asarray([0.01, -0.02, 0.005, 0.02, -0.01, 0.15],
                           jnp.float32)
        prev = project_stereo(CAM, pts, jnp.zeros(6))
        cur = project_stereo(CAM, pts, pose_inverse(pose)) + jnp.asarray(
            rng.normal(0, 0.3, (12, 4)), jnp.float32)
        mask = jnp.ones(12, bool)
        gn = solve_pose(CAM, prev, cur, mask, LeastSquaresParams())
        lm = solve_pose(CAM, prev, cur, mask,
                        LeastSquaresParams(use_lm=True))
        assert not bool(gn.valid)   # condition guard fires
        assert bool(lm.valid)       # damping keeps the solve alive
        assert float(jnp.max(jnp.abs(lm.pose[:3] - pose[:3]))) < 0.05


class TestSolveBackends:
    """solve_backend='chol' (shipped default) vs 'eigh' (reference JacobiSVD
    semantics): identical pose on well-conditioned solves, same abort code
    on degenerate input (LeastSquaresParams.solve_backend)."""

    def _problem(self, rng):
        from rso.geometry import project_stereo_with_jacobian
        from rso.geometry.stereo_camera import StereoCamera

        cam = StereoCamera.make(fx_l=500.0, fy_l=500.0, cx_l=320.0,
                                cy_l=240.0, baseline=0.5)
        N = 200
        lmks = np.stack([rng.uniform(-8, 8, N), rng.uniform(-4, 4, N),
                         rng.uniform(5, 30, N)], -1).astype(np.float32)
        prev, _ = project_stereo_with_jacobian(cam, jnp.asarray(lmks),
                                               jnp.zeros(6))
        true = jnp.asarray([0.002, -0.004, 0.001, 0.03, -0.01, 0.25],
                           jnp.float32)
        cur, _ = project_stereo_with_jacobian(cam, jnp.asarray(lmks), true)
        cur = cur + jnp.asarray(rng.normal(0, 0.3, cur.shape), jnp.float32)
        cur = cur.at[:10].add(40.0)  # outliers
        return cam, prev, cur, jnp.ones(N, bool)

    def test_backends_agree_on_good_data(self, rng):
        from rso.config import LeastSquaresParams
        from rso.solver.robust_gn import solve_pose

        cam, prev, cur, mask = self._problem(rng)
        out = {be: solve_pose(cam, prev, cur, mask,
                              LeastSquaresParams(solve_backend=be))
               for be in ("eigh", "chol")}
        assert bool(out["eigh"].valid) and bool(out["chol"].valid)
        np.testing.assert_allclose(np.asarray(out["eigh"].pose),
                                   np.asarray(out["chol"].pose), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(out["eigh"].inliers),
                                      np.asarray(out["chol"].inliers))

    def test_backends_agree_on_degenerate_data(self, rng):
        from rso.config import LeastSquaresParams
        from rso.solver.robust_gn import solve_pose

        cam, prev, cur, mask = self._problem(rng)
        garbage = cur * 0 + jnp.asarray(
            rng.normal(0, 1e7, cur.shape), jnp.float32)
        codes = []
        for be in ("eigh", "chol"):
            o = solve_pose(cam, prev, garbage, mask,
                           LeastSquaresParams(solve_backend=be))
            assert not bool(o.valid)
            codes.append(int(o.error_code))
        assert codes[0] == codes[1] == 2  # VOEC_BAD_COND_NUMBER
