"""Bundle adjustment tests: recovery on synthetic problems, distributed ==
single-device over a virtual 8-chip mesh, window bookkeeping, keyframe policy,
and the VO+BA pipeline end-to-end.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from rso.ba import (
    BAProblem,
    KeyframeObs,
    SlidingWindow,
    bundle_adjust,
    distributed_bundle_adjust,
    make_mesh,
    should_make_keyframe,
)
from rso.ba.ba import _project_grid
from rso.geometry.stereo_camera import StereoCamera

CAM = StereoCamera.make(fx_l=500.0, fy_l=500.0, cx_l=320.0, cy_l=240.0,
                        baseline=0.5)


def make_ba_problem(rng, P=5, L=96, noise=0.2, pose_pert=0.01, lmk_pert=0.2,
                    drop=0.0):
    true_poses = []
    for p in range(P):
        T_wc = np.array([0.01 * p, -0.005 * p, 0.4 * p])
        w = np.array([0.0, 0.002 * p, 0.0])
        R = Rotation.from_rotvec(w).as_matrix()
        Rwc = R.T
        t = -Rwc @ T_wc
        true_poses.append(
            np.concatenate([Rotation.from_matrix(Rwc).as_rotvec(), t]))
    true_poses = jnp.asarray(np.stack(true_poses), jnp.float32)
    lmks_true = jnp.asarray(np.stack([
        rng.uniform(-8, 8, L), rng.uniform(-4, 4, L), rng.uniform(5, 30, L),
    ], -1), jnp.float32)
    pix, _, _ = _project_grid(CAM, true_poses, lmks_true)
    obs = pix + jnp.asarray(rng.normal(0, noise, pix.shape), jnp.float32)
    mask = jnp.asarray(rng.random((P, L)) >= drop)
    poses0 = (true_poses + jnp.asarray(
        rng.normal(0, pose_pert, (P, 6)), jnp.float32)).at[0].set(true_poses[0])
    lmks0 = lmks_true + jnp.asarray(rng.normal(0, lmk_pert, (L, 3)), jnp.float32)
    return (BAProblem(poses0, lmks0, obs, mask), true_poses, lmks_true)


class TestBundleAdjust:
    def test_recovery(self, rng):
        prob, true_poses, _ = make_ba_problem(rng)
        res = bundle_adjust(CAM, prob, max_iters=25)
        err0 = float(jnp.mean(jnp.abs(prob.poses - true_poses)))
        err1 = float(jnp.mean(jnp.abs(res.poses - true_poses)))
        assert err1 < err0 / 5

    def test_reprojection_reaches_noise_floor(self, rng):
        prob, tp, tl = make_ba_problem(rng, noise=0.2)
        res = bundle_adjust(CAM, prob, max_iters=30)
        pix, _, _ = _project_grid(CAM, res.poses, res.lmks)
        rmse = float(jnp.sqrt(jnp.mean(jnp.sum((prob.obs - pix) ** 2, -1))))
        assert rmse < 0.6  # 4-channel residual, 0.2px/channel noise floor ~0.4

    def test_gauge_fixed(self, rng):
        prob, true_poses, _ = make_ba_problem(rng)
        res = bundle_adjust(CAM, prob, max_iters=10)
        np.testing.assert_array_equal(np.asarray(res.poses[0]),
                                      np.asarray(prob.poses[0]))

    def test_masked_observations(self, rng):
        prob, true_poses, _ = make_ba_problem(rng, drop=0.4)
        res = bundle_adjust(CAM, prob, max_iters=25)
        err1 = float(jnp.mean(jnp.abs(res.poses - true_poses)))
        assert err1 < 0.003

    def test_cost_decreases(self, rng):
        prob, _, _ = make_ba_problem(rng)
        r5 = bundle_adjust(CAM, prob, max_iters=3)
        r25 = bundle_adjust(CAM, prob, max_iters=25)
        assert float(r25.cost) <= float(r5.cost) + 1e-3


class TestDistributedBA:
    def test_matches_single_device(self, rng):
        """8-way landmark-sharded Schur == single device (f32 tolerance)."""
        assert len(jax.devices()) >= 8
        prob, _, _ = make_ba_problem(rng, L=96)
        res1 = bundle_adjust(CAM, prob, max_iters=12)
        res8 = distributed_bundle_adjust(CAM, prob, make_mesh(8), max_iters=12)
        np.testing.assert_allclose(np.asarray(res8.poses),
                                   np.asarray(res1.poses), atol=1e-4)
        np.testing.assert_allclose(np.asarray(res8.lmks[:96]),
                                   np.asarray(res1.lmks), atol=1e-3)

    def test_uneven_padding(self, rng):
        prob, true_poses, _ = make_ba_problem(rng, L=67)  # not divisible by 8
        res1 = bundle_adjust(CAM, prob, max_iters=12)
        res8 = distributed_bundle_adjust(CAM, prob, make_mesh(8), max_iters=12)
        # padding slots must not change the solution vs single-device
        np.testing.assert_allclose(np.asarray(res8.poses),
                                   np.asarray(res1.poses), atol=1e-4)

    def test_two_device_mesh(self, rng):
        prob, _, _ = make_ba_problem(rng, L=96)
        res1 = bundle_adjust(CAM, prob, max_iters=8)
        res2 = distributed_bundle_adjust(CAM, prob, make_mesh(2), max_iters=8)
        np.testing.assert_allclose(np.asarray(res2.poses),
                                   np.asarray(res1.poses), atol=1e-4)


class TestWindow:
    def _kf(self, rng, ids, z=0.0):
        n = len(ids)
        obs = np.stack([rng.uniform(100, 500, n), rng.uniform(100, 300, n),
                        rng.uniform(80, 480, n), rng.uniform(100, 300, n)], -1)
        obs[:, 2] = obs[:, 0] - rng.uniform(5, 40, n)  # positive disparity
        obs[:, 3] = obs[:, 1]
        T = np.eye(4)
        T[2, 3] = z
        return KeyframeObs(pose_wc=T, ids=np.asarray(ids, np.int64),
                           obs=obs.astype(np.float32))

    def test_eviction(self, rng):
        w = SlidingWindow(max_keyframes=3)
        for i in range(5):
            w.add_keyframe(self._kf(rng, [1, 2, 3], z=i))
        assert len(w) == 3
        assert w.keyframes[0].pose_wc[2, 3] == 2.0  # oldest two evicted

    def test_build_problem_shared_only(self, rng):
        w = SlidingWindow(max_keyframes=4, max_landmarks=16)
        w.add_keyframe(self._kf(rng, [1, 2, 3, 99]))
        w.add_keyframe(self._kf(rng, [2, 3, 4], z=0.3))
        prob, ids = w.build_problem(CAM)
        nv = int(np.asarray(prob.mask).any(0).sum())
        assert nv == 2  # only ids 2 and 3 are shared
        assert set(ids[ids >= 0].tolist()) == {2, 3}

    def test_apply_result_roundtrip(self, rng):
        w = SlidingWindow(max_keyframes=4)
        w.add_keyframe(self._kf(rng, [1, 2, 3]))
        w.add_keyframe(self._kf(rng, [1, 2, 3], z=0.5))
        prob, _ = w.build_problem(CAM)
        out = w.apply_result(np.asarray(prob.poses))  # identity refinement
        np.testing.assert_allclose(out[1][2, 3], 0.5, atol=1e-5)


class TestKeyframePolicy:
    def test_policy(self):
        assert should_make_keyframe(10, 100)        # ratio below 0.5
        assert should_make_keyframe(30, 100)        # below min_abs 40
        assert not should_make_keyframe(80, 100)
        assert should_make_keyframe(0, 0)


class TestPipeline:
    def test_vo_with_ba_improves_or_matches(self, rng):
        from rso.ba.pipeline import VOWithBA
        from rso.engine import Engine
        from rso.geometry import pose_matrix
        from rso.metrics.ate import ate_rmse
        from rso.synthetic import make_sequence, synthetic_config

        seq = make_sequence(n_frames=16, n_points=2000, speed=0.25,
                            yaw_rate=0.01)
        cfg = synthetic_config()

        eng = Engine(cfg, seq.cam)
        T = np.eye(4)
        poses_vo = [T.copy()]
        for l, r in seq.frames:
            res = eng.process_frame(l, r)
            if bool(res.valid):
                T = T @ np.asarray(pose_matrix(res.pose))
            poses_vo.append(T.copy())
        ate_vo = ate_rmse(np.stack(poses_vo)[: len(seq.poses)], seq.poses)

        vo = VOWithBA(cfg, seq.cam, max_keyframes=8, max_landmarks=768)
        poses_ba = [np.eye(4)]
        n_kf = 0
        for l, r in seq.frames:
            out = vo.process_frame(l, r)
            n_kf += int(out.is_keyframe)
            poses_ba.append(out.pose_wc)
        ate_ba = ate_rmse(np.stack(poses_ba)[: len(seq.poses)], seq.poses)

        assert 3 <= n_kf < len(seq.frames)  # keyframes are spaced
        assert np.isfinite(ate_ba)
        assert ate_ba < ate_vo * 1.5  # BA never catastrophically degrades


def _rel_from_poses(poses6):
    """Ground-truth consecutive relative transforms [P-1,6] from world->cam
    pose 6-vectors (same convention as SlidingWindow.rel_measurements)."""
    out = []
    poses6 = np.asarray(poses6)
    for a, b in zip(poses6[:-1], poses6[1:]):
        Ra = Rotation.from_rotvec(a[:3]).as_matrix()
        Rb = Rotation.from_rotvec(b[:3]).as_matrix()
        R_rel = Rb @ Ra.T
        t_rel = b[3:] - R_rel @ a[3:]
        out.append(np.concatenate([
            Rotation.from_matrix(R_rel).as_rotvec(), t_rel]))
    return np.stack(out).astype(np.float32)


class TestOdometryPrior:
    def test_relpose_residual_zero_at_truth(self, rng):
        from rso.ba.ba import _relpose_residuals

        prob, true_poses, _ = make_ba_problem(rng)
        rel = jnp.asarray(_rel_from_poses(true_poses))
        e = _relpose_residuals(true_poses, rel)
        assert float(jnp.max(jnp.abs(e))) < 1e-5

    def test_prior_improves_weak_problem(self, rng):
        """Few noisy observations -> the unconstrained window solve wanders;
        an exact odometry prior must pull poses toward truth."""
        prob, true_poses, _ = make_ba_problem(rng, P=5, L=24, noise=1.5,
                                              pose_pert=0.02, lmk_pert=0.5)
        rel = jnp.asarray(_rel_from_poses(true_poses))
        res_free = bundle_adjust(CAM, prob, max_iters=25)
        res_prior = bundle_adjust(CAM, prob, max_iters=25, rel_meas=rel,
                                  rel_w_rot=1e6, rel_w_trans=1e6)
        err_free = float(jnp.mean(jnp.abs(res_free.poses - true_poses)))
        err_prior = float(jnp.mean(jnp.abs(res_prior.poses - true_poses)))
        assert err_prior <= err_free * 1.05
        # with a near-hard prior the relative chain must match VO
        from rso.ba.ba import _relpose_residuals

        e = _relpose_residuals(res_prior.poses, rel)
        assert float(jnp.max(jnp.abs(e))) < 5e-3

    def test_prior_does_not_hurt_strong_problem(self, rng):
        prob, true_poses, _ = make_ba_problem(rng)
        rel = jnp.asarray(_rel_from_poses(true_poses))
        res = bundle_adjust(CAM, prob, max_iters=25, rel_meas=rel,
                            rel_w_rot=4e4, rel_w_trans=2.5e3)
        err0 = float(jnp.mean(jnp.abs(prob.poses - true_poses)))
        err1 = float(jnp.mean(jnp.abs(res.poses - true_poses)))
        assert err1 < err0 / 5

    def test_distributed_matches_single_with_prior(self, rng):
        prob, true_poses, _ = make_ba_problem(rng, L=64)
        rel = jnp.asarray(_rel_from_poses(true_poses))
        mesh = make_mesh()
        res_s = bundle_adjust(CAM, prob, max_iters=12, rel_meas=rel,
                              rel_w_rot=4e4, rel_w_trans=2.5e3)
        res_d = distributed_bundle_adjust(CAM, prob, mesh, max_iters=12,
                                          rel_meas=rel, rel_w_rot=4e4,
                                          rel_w_trans=2.5e3)
        np.testing.assert_allclose(np.asarray(res_s.poses),
                                   np.asarray(res_d.poses), atol=2e-4)

    def test_window_rel_measurements(self, rng):
        w = SlidingWindow(4, 64)
        T0, T1 = np.eye(4), np.eye(4)
        T1[:3, 3] = [0.1, 0.0, 0.4]
        w.add_keyframe(KeyframeObs(pose_wc=T0, ids=np.array([1, 2]),
                                   obs=np.zeros((2, 4), np.float32),
                                   pose_vo=T0))
        w.add_keyframe(KeyframeObs(pose_wc=T1, ids=np.array([1, 2]),
                                   obs=np.zeros((2, 4), np.float32),
                                   pose_vo=T1))
        rel = w.rel_measurements()
        assert rel.shape == (1, 6)
        # relative cam motion: X_c1 = inv(T1) @ T0 @ X_c0
        np.testing.assert_allclose(rel[0, 3:], -T1[:3, 3], atol=1e-6)
        # missing pose_vo -> None
        w.add_keyframe(KeyframeObs(pose_wc=T1, ids=np.array([1]),
                                   obs=np.zeros((1, 4), np.float32)))
        assert w.rel_measurements() is None


class TestLandmarkWeighting:
    def test_window_emits_two_view_weights(self, rng):
        """build_problem: 2-KF landmarks get two_view_weight, 3+ get 1.0."""
        w = SlidingWindow(4, 64, two_view_weight=0.2)
        T = np.eye(4)
        obs = np.array([[320.0, 240.0, 300.0, 240.0]], np.float32)
        # id 1 in 3 KFs, id 2 in 2 KFs
        for ids in ([1, 2], [1, 2], [1]):
            o = np.repeat(obs, len(ids), 0)
            w.add_keyframe(KeyframeObs(pose_wc=T, ids=np.array(ids), obs=o))
        prob, slot_ids = w.build_problem(CAM)
        lw = np.asarray(prob.lmk_weight)
        s1 = list(slot_ids).index(1)
        s2 = list(slot_ids).index(2)
        assert lw[s1] == 1.0
        assert lw[s2] == pytest.approx(0.2)

    def test_weighted_distributed_matches_single(self, rng):
        prob, true_poses, _ = make_ba_problem(rng, L=64)
        lw = jnp.asarray(rng.choice([0.2, 1.0], 64), jnp.float32)
        prob = prob._replace(lmk_weight=lw)
        mesh = make_mesh()
        res_s = bundle_adjust(CAM, prob, max_iters=12)
        res_d = distributed_bundle_adjust(CAM, prob, mesh, max_iters=12)
        np.testing.assert_allclose(np.asarray(res_s.poses),
                                   np.asarray(res_d.poses), atol=2e-4)

    def test_zero_weight_equals_masked_out(self, rng):
        """lmk_weight=0 must equal removing those landmarks from the mask."""
        prob, _tp, _tl = make_ba_problem(rng, L=64)
        drop = jnp.asarray(rng.random(64) < 0.3)
        res_w = bundle_adjust(
            CAM, prob._replace(lmk_weight=jnp.where(drop, 0.0, 1.0)),
            max_iters=10)
        res_m = bundle_adjust(
            CAM, prob._replace(mask=prob.mask & ~drop[None, :]),
            max_iters=10)
        np.testing.assert_allclose(np.asarray(res_w.poses),
                                   np.asarray(res_m.poses), atol=5e-4)


class TestObsOutlierGating:
    def test_keyframe_obs_excludes_flagged_slots(self):
        """keyframe_obs_from_state(obs_outlier=...) must drop exactly the
        flagged valid-match slots from the keyframe's observation set."""
        from rso.ba.pipeline import keyframe_obs_from_state
        from rso.engine import Engine
        from rso.synthetic import make_sequence, synthetic_config

        seq = make_sequence(n_frames=3, n_points=1500)
        cfg = synthetic_config()
        eng = Engine(cfg, seq.cam)
        for l, r in seq.frames:
            res = eng.process_frame(l, r)

        T = np.eye(4)
        kf_all = keyframe_obs_from_state(eng.state, cfg, T)
        outlier = np.asarray(res.obs_outlier)
        kf_gated = keyframe_obs_from_state(eng.state, cfg, T,
                                           obs_outlier=outlier)
        # gated set is a subset of the ungated set
        assert set(kf_gated.ids.tolist()) <= set(kf_all.ids.tolist())
        # count the flagged slots that would otherwise have contributed
        dropped = 0
        off = 0
        for od in eng.state.prev.octaves:
            valid = np.asarray(od.matches.valid)
            ids = np.asarray(od.match_ids)
            k_o = valid.shape[0]
            flag = outlier[off:off + k_o]
            off += k_o
            dropped += int(np.sum(valid & flag & (ids >= 0)))
        assert len(kf_all.ids) - len(kf_gated.ids) == dropped

    def test_obs_outlier_subset_of_solver_outliers(self):
        """Every flagged current slot traces back to a track that entered the
        solve and was rejected; counts can only shrink through the scatter."""
        from rso.engine import Engine
        from rso.synthetic import make_sequence, synthetic_config

        seq = make_sequence(n_frames=3, n_points=1500)
        eng = Engine(synthetic_config(), seq.cam)
        for l, r in seq.frames:
            res = eng.process_frame(l, r)
        n_out_prev = int(np.sum(np.asarray(res.track_mask)
                                & ~np.asarray(res.inliers)))
        n_flag = int(np.sum(np.asarray(res.obs_outlier)))
        assert n_flag <= n_out_prev
        # flagged slots are real current matches
        off = 0
        for od in eng.state.prev.octaves:
            k_o = np.asarray(od.matches.valid).shape[0]
            flag = np.asarray(res.obs_outlier)[off:off + k_o]
            off += k_o
            assert np.all(~flag | np.asarray(od.matches.valid))


class TestProjectGrid:
    def test_vectorized_matches_per_element(self, rng):
        """The batched projection must equal the per-element vmap form."""
        import jax

        from rso.ba.ba import _project_grid, _project_one

        poses = jnp.asarray(rng.normal(0, 0.3, (4, 6)), jnp.float32)
        lmks = jnp.asarray(np.stack([
            rng.uniform(-5, 5, 16), rng.uniform(-3, 3, 16),
            rng.uniform(4, 30, 16)], -1), jnp.float32)
        ref = jax.vmap(jax.vmap(_project_one, in_axes=(None, None, 0)),
                       in_axes=(None, 0, None))(CAM, poses, lmks)
        out = _project_grid(CAM, poses, lmks)
        for a, b in zip(out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)
