"""Marginalization-on-eviction: Schur algebra, prior construction, and the
prior-augmented BA path (rso.ba.marginalization)."""
import numpy as np
import pytest

from rso.ba.marginalization import (
    MargPrior,
    _pose6_from_wc,
    _project_np,
    marginalize_oldest,
    schur_marginalize,
)
from rso.ba.window import KeyframeObs, SlidingWindow
from rso.synthetic import make_sequence, synthetic_config


class TestSchurCore:
    def test_marginal_preserves_minimizer(self):
        """For a linear-Gaussian system the Schur-marginalized system's
        solution equals the keep-block of the full solution — the defining
        property of Gaussian marginalization in information form."""
        rng = np.random.default_rng(0)
        n = 30
        A = rng.normal(size=(n + 10, n))
        H = A.T @ A + 0.1 * np.eye(n)
        b = rng.normal(size=n)
        keep = np.zeros(n, bool)
        keep[: n // 2] = True
        x_full = np.linalg.solve(H, b)
        Hp, bp = schur_marginalize(H, b, keep)
        x_marg = np.linalg.solve(Hp, bp)
        np.testing.assert_allclose(x_marg, x_full[keep], rtol=1e-6, atol=1e-8)

    def test_marginal_psd(self):
        rng = np.random.default_rng(1)
        A = rng.normal(size=(40, 24))
        H = A.T @ A
        b = rng.normal(size=24)
        keep = rng.random(24) < 0.5
        Hp, _ = schur_marginalize(H, b, keep)
        w = np.linalg.eigvalsh(Hp)
        assert w.min() > -1e-6 * max(w.max(), 1.0)

    def test_empty_marginal_set(self):
        H = np.eye(6)
        b = np.ones(6)
        Hp, bp = schur_marginalize(H, b, np.ones(6, bool))
        np.testing.assert_array_equal(Hp, H)
        np.testing.assert_array_equal(bp, b)


class TestProjectionMirror:
    def test_matches_jax_project_grid(self):
        """The f64 numpy projection/Jacobians must mirror rso.ba.ba's
        _project_grid (the prior must compose with the solver's algebra)."""
        import jax.numpy as jnp

        from rso.ba.ba import _project_grid
        from rso.geometry.stereo_camera import StereoCamera

        cam = StereoCamera.make(fx_l=320.0, fy_l=320.0, cx_l=188.0,
                                cy_l=120.0, baseline=0.4)
        rng = np.random.default_rng(2)
        pose = np.array([0.02, -0.01, 0.03, 0.1, -0.05, 0.2])
        X = rng.uniform([-4, -2, 3], [4, 2, 25], (50, 3))
        pix_np, Jp_np, Jl_np = _project_np(cam, pose, X)
        pix_j, Jp_j, Jl_j = _project_grid(
            cam, jnp.asarray(pose[None], jnp.float32),
            jnp.asarray(X, jnp.float32))
        np.testing.assert_allclose(pix_np, np.asarray(pix_j[0]),
                                   rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(Jp_np, np.asarray(Jp_j[0]),
                                   rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(Jl_np, np.asarray(Jl_j[0]),
                                   rtol=1e-3, atol=1e-2)


def _make_window_kfs(n_kf=3, n_lmk=120, seed=0):
    """Synthetic keyframes with exact stereo observations of a shared cloud;
    the first `n_lmk//3` landmarks are seen ONLY by the first two keyframes
    (they die when keyframe 0 is evicted from a min_obs=2 window)."""
    from rso.geometry.stereo_camera import StereoCamera

    cam = StereoCamera.make(fx_l=320.0, fy_l=320.0, cx_l=188.0, cy_l=120.0,
                            baseline=0.4)
    rng = np.random.default_rng(seed)
    X = rng.uniform([-4, -2, 4], [4, 2, 25], (n_lmk, 3))
    fx, cx, cy, b = (float(cam.fx_l), float(cam.cx_l), float(cam.cy_l),
                     float(cam.baseline))
    kfs = []
    for k in range(n_kf):
        T = np.eye(4)
        T[:3, 3] = [0.02 * k, 0.0, 0.35 * k]  # camera-to-world, forward walk
        R_cw = T[:3, :3].T
        Xc = (X - T[:3, 3]) @ T[:3, :3]
        ul = fx * Xc[:, 0] / Xc[:, 2] + cx
        vl = fx * Xc[:, 1] / Xc[:, 2] + cy
        ur = fx * (Xc[:, 0] - b) / Xc[:, 2] + cx
        obs = np.stack([ul, vl, ur, vl], -1).astype(np.float32)
        obs += rng.normal(0, 0.1, obs.shape).astype(np.float32)
        if k >= 2:
            ids = np.arange(n_lmk // 3, n_lmk, dtype=np.int64)
            obs = obs[n_lmk // 3:]
        else:
            ids = np.arange(n_lmk, dtype=np.int64)
        kfs.append(KeyframeObs(pose_wc=T, ids=ids, obs=obs, pose_vo=T.copy()))
    return cam, kfs, X


class TestMarginalizeOldest:
    def test_prior_nonzero_psd(self):
        cam, kfs, _ = _make_window_kfs()
        prior = marginalize_oldest(cam, kfs, None, min_obs=2)
        assert prior.n == 2
        assert prior.H.shape == (12, 12)
        w = np.linalg.eigvalsh(prior.H)
        assert w.min() >= -1e-9
        assert w.max() > 1.0  # dying landmarks carried real information
        assert np.all(np.isfinite(prior.b))

    def test_prior_gradient_small_at_consistent_estimates(self):
        """With near-noiseless observations and estimates at ground truth,
        the marginalized gradient must be near zero (the prior should not
        push a consistent window anywhere)."""
        cam, kfs, _ = _make_window_kfs()
        prior = marginalize_oldest(cam, kfs, None, min_obs=2)
        # |b| relative to the prior's scale: dx pulled by b is H^-1 b
        dx = np.linalg.solve(prior.H + 1e-6 * np.eye(12), prior.b)
        assert np.abs(dx).max() < 5e-3

    def test_chained_prior_absorbed(self):
        """A second eviction must absorb the first prior (information about
        keyframe 1 flows into the 2nd-generation prior)."""
        cam, kfs, _ = _make_window_kfs(n_kf=4, n_lmk=160)
        # rel_w: the odometry factor is the coupling that carries absolute
        # information forward when no dying landmarks span the eviction
        # (with rel_w=0 and no shared dying landmarks a zero marginal is
        # the mathematically correct answer — gauge-null relative info)
        p1 = marginalize_oldest(cam, kfs[:3], None, min_obs=2,
                                rel_w=(4e2, 25.0))
        # shift window: now kfs[1:4], prior p1 covers kfs[1:3]
        p2 = marginalize_oldest(cam, kfs[1:4], p1, min_obs=2,
                                rel_w=(4e2, 25.0))
        assert p2.n == 2
        w = np.linalg.eigvalsh(p2.H)
        assert w.min() >= -1e-9
        # keyframe 2's block must carry info inherited through the chain
        assert np.trace(p2.H[:6, :6]) > 0.1

    def test_relpose_factor_enters(self):
        cam, kfs, _ = _make_window_kfs()
        p_no = marginalize_oldest(cam, kfs, None, min_obs=2, rel_w=(0, 0))
        p_yes = marginalize_oldest(cam, kfs, None, min_obs=2,
                                   rel_w=(4e2, 25.0))
        # the absorbed odometry factor adds information to keyframe 1
        assert np.trace(p_yes.H[:6, :6]) > np.trace(p_no.H[:6, :6])


class TestPriorInBA:
    def test_bundle_adjust_accepts_prior(self):
        import jax.numpy as jnp

        from rso.ba.ba import BAProblem, bundle_adjust

        cam, kfs, X = _make_window_kfs(n_kf=3, n_lmk=120)
        prior = marginalize_oldest(cam, kfs, None, min_obs=2)
        win = SlidingWindow(max_keyframes=2, min_obs=2)
        win.keyframes = kfs[1:]
        prob, _ = win.build_problem(cam)
        P = prob.poses.shape[0]
        mp = (prior.H.reshape(P, 6, P, 6).astype(np.float32),
              prior.b.reshape(P, 6).astype(np.float32),
              prior.lin.astype(np.float32))
        out = bundle_adjust(cam, prob, max_iters=10, marg_prior=mp)
        assert bool(jnp.all(jnp.isfinite(out.poses)))
        assert float(out.cost) < 1e4

    def test_prior_constrains_drift(self):
        """Perturb the window poses: with the prior, BA must pull them back
        toward the marginalization linearization point more strongly than
        without (the prior carries the dead landmarks' information)."""
        import jax.numpy as jnp

        from rso.ba.ba import BAProblem, bundle_adjust

        cam, kfs, X = _make_window_kfs(n_kf=3, n_lmk=150, seed=3)
        prior = marginalize_oldest(cam, kfs, None, min_obs=2)

        win = SlidingWindow(max_keyframes=2, min_obs=2)
        win.keyframes = kfs[1:]
        prob, _ = win.build_problem(cam)
        # perturb the SECOND pose (first is gauge-fixed)
        poses = np.asarray(prob.poses).copy()
        true_pose1 = poses[1].copy()
        poses[1, 3:] += np.array([0.04, -0.03, 0.05], np.float32)
        prob = prob._replace(poses=jnp.asarray(poses))

        P = 2
        mp = (prior.H.reshape(P, 6, P, 6).astype(np.float32),
              prior.b.reshape(P, 6).astype(np.float32),
              prior.lin.astype(np.float32))
        out_with = bundle_adjust(cam, prob, max_iters=15, marg_prior=mp)
        err_with = np.abs(np.asarray(out_with.poses)[1] - true_pose1).max()
        # the reprojection factors alone also fix it; the prior must not
        # degrade the recovery
        out_wo = bundle_adjust(cam, prob, max_iters=15)
        err_wo = np.abs(np.asarray(out_wo.poses)[1] - true_pose1).max()
        assert err_with < 0.01
        assert err_with <= err_wo + 5e-3


class TestWindowIntegration:
    def test_eviction_builds_prior(self):
        cam, kfs, _ = _make_window_kfs(n_kf=3, n_lmk=120)
        win = SlidingWindow(max_keyframes=2, min_obs=2, marginalize=True,
                            cam=cam)
        for kf in kfs:
            win.add_keyframe(kf)
        assert win.prior is not None and win.prior.n == 2
        terms = win.prior_terms()
        assert terms is not None
        H, b, lin = terms
        assert H.shape == (2, 6, 2, 6) and b.shape == (2, 6)
        assert np.all(np.isfinite(H)) and np.all(np.isfinite(b))

    def test_prior_pads_for_new_keyframes(self):
        cam, kfs, _ = _make_window_kfs(n_kf=4, n_lmk=160)
        win = SlidingWindow(max_keyframes=3, min_obs=2, marginalize=True,
                            cam=cam)
        for kf in kfs:
            win.add_keyframe(kf)  # 4th triggers eviction; prior covers 3
        H, b, lin = win.prior_terms()
        assert H.shape == (3, 6, 3, 6)

    def test_pipeline_smoke(self):
        """VOWithBA with marginalization runs a short sequence end-to-end."""
        from rso.ba.pipeline import VOWithBA
        from rso.metrics.ate import ate_rmse

        seq = make_sequence(n_frames=40, n_points=1200, seed=0, speed=0.4)
        vo = VOWithBA(synthetic_config(), seq.cam, max_keyframes=4,
                      max_landmarks=512, min_kf_gap=2, marginalize=True)
        poses = [np.eye(4)]
        for l, r in seq.frames:
            out = vo.process_frame(l, r)
            poses.append(out.pose_wc)
        assert vo.window.prior is not None  # evictions happened
        ate = ate_rmse(np.stack(poses)[: len(seq.poses)], seq.poses)
        assert np.isfinite(ate) and ate < 1.0
