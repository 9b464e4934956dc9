"""Engine end-to-end tests on synthetic sequences: pose accuracy, error-code
semantics, recovery behavior, match-ID/KF bookkeeping.
"""
import dataclasses

import jax

import jax.numpy as jnp
import numpy as np
import pytest

from rso.engine import Engine, init_state
from rso.geometry import pose_matrix
from rso.solver.robust_gn import (
    VOEC_BAD_TRACKING,
    VOEC_FIRST_ITERATION,
    VOEC_NONE,
)
from rso.synthetic import make_sequence, synthetic_config


@pytest.fixture(scope="module")
def seq():
    return make_sequence(n_frames=6, n_points=2000)


@pytest.fixture(scope="module")
def engine_run(seq):
    eng = Engine(synthetic_config(), seq.cam)
    results = [eng.process_frame(l, r) for l, r in seq.frames]
    return eng, results


class TestEngineE2E:
    def test_first_frame_semantics(self, engine_run):
        _, results = engine_run
        r0 = results[0]
        assert not bool(r0.valid)
        assert int(r0.error_code) == VOEC_FIRST_ITERATION
        assert int(np.asarray(r0.detected_feats).sum()) > 100

    def test_subsequent_frames_valid(self, engine_run):
        _, results = engine_run
        ok = [bool(r.valid) for r in results[1:]]
        assert sum(ok) >= len(ok) - 1  # allow at most one dropout

    def test_pose_accuracy(self, seq, engine_run):
        _, results = engine_run
        errs = []
        for i, r in enumerate(results):
            if i == 0 or not bool(r.valid):
                continue
            est = np.asarray(pose_matrix(r.pose))
            gt = seq.rel_poses[i - 1]
            errs.append(np.linalg.norm(est[:3, 3] - gt[:3, 3]))
        assert np.mean(errs) < 0.05  # <20% of the 0.25 m step
        # rotation accuracy
        for i, r in enumerate(results):
            if i == 0 or not bool(r.valid):
                continue
            est = np.asarray(pose_matrix(r.pose))
            gt = seq.rel_poses[i - 1]
            cosang = (np.trace(est[:3, :3].T @ gt[:3, :3]) - 1) / 2
            assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 0.5

    def test_counters(self, engine_run):
        _, results = engine_run
        for r in results[1:]:
            assert int(r.tracked_feats_from_last_frame) >= 0
            assert int(np.asarray(r.stereo_matches).sum()) > 30

    def test_match_ids_monotonic_and_propagated(self, seq):
        eng = Engine(synthetic_config(), seq.cam)
        eng.process_frame(*seq.frames[0])
        ids0 = np.asarray(eng.state.prev.octaves[0].match_ids)
        eng.process_frame(*seq.frames[1])
        ids1 = np.asarray(eng.state.prev.octaves[0].match_ids)
        v0, v1 = ids0 >= 0, ids1 >= 0
        assert v0.sum() > 20 and v1.sum() > 20
        # propagated IDs survive: a healthy fraction of frame-1 ids existed in frame 0
        shared = np.intersect1d(ids0[v0], ids1[v1])
        assert len(shared) > 10
        # uniqueness within frame
        assert len(np.unique(ids1[v1])) == v1.sum()

    def test_keyframe_watermark(self, seq):
        eng = Engine(synthetic_config(), seq.cam)
        eng.process_frame(*seq.frames[0])
        eng.set_this_frame_as_kf()
        wm = int(eng.state.last_kf_max_id)
        assert wm >= 0
        r = eng.process_frame(*seq.frames[1])
        assert int(r.tracked_feats_from_last_KF) > 10

    def test_reset_ids(self, seq):
        eng = Engine(synthetic_config(), seq.cam)
        eng.process_frame(*seq.frames[0])
        eng.reset_ids()
        ids = np.asarray(eng.state.prev.octaves[0].match_ids)
        v = ids >= 0
        assert set(ids[v]) == set(range(v.sum()))

    def test_bad_tracking_recovery(self, seq):
        """A blank frame must yield voecBadTracking and NOT consume the
        previous frame (reference process_new_image_pair.cpp:86-95)."""
        eng = Engine(synthetic_config(), seq.cam)
        eng.process_frame(*seq.frames[0])
        good_state_xy = np.asarray(eng.state.prev.octaves[0].left.xy)
        blank = np.full_like(seq.frames[0][0], 128)
        r = eng.process_frame(blank, blank)
        assert not bool(r.valid)
        assert int(r.error_code) == VOEC_BAD_TRACKING
        # prev frame kept (recovery): state still holds the good frame
        np.testing.assert_array_equal(
            np.asarray(eng.state.prev.octaves[0].left.xy), good_state_xy)
        # next good frame recovers against the retained frame
        r2 = eng.process_frame(*seq.frames[1])
        assert bool(r2.valid)

    def test_recovery_is_bounded(self, seq):
        """After max_recovery_frames consecutive failures the engine must
        consume the frame anyway (bounded keep-prev: the camera keeps
        moving, so an unbounded skip wedges against an ever-staler frame)."""
        eng = Engine(synthetic_config(), seq.cam)
        eng.process_frame(*seq.frames[0])
        good_xy = np.asarray(eng.state.prev.octaves[0].left.xy)
        blank = np.full_like(seq.frames[0][0], 128)
        k = eng.cfg.general.max_recovery_frames
        for i in range(k):
            r = eng.process_frame(blank, blank)
            assert not bool(r.valid)
            # still holding the good frame during the recovery window
            np.testing.assert_array_equal(
                np.asarray(eng.state.prev.octaves[0].left.xy), good_xy)
        r = eng.process_frame(blank, blank)
        assert not bool(r.valid)
        # window exhausted: the blank frame was consumed
        assert not np.array_equal(
            np.asarray(eng.state.prev.octaves[0].left.xy), good_xy)
        assert int(eng.state.err_streak) == 0

    def test_process_chunk_matches_sequential(self, seq):
        """process_chunk (one-dispatch lax.scan) must evolve state and emit
        results identically to sequential process_frame calls."""
        import jax.numpy as jnp

        eng1 = Engine(synthetic_config(), seq.cam)
        eng2 = Engine(synthetic_config(), seq.cam)
        n = 4
        seq_results = [eng1.process_frame(l, r) for l, r in seq.frames[:n]]
        lefts = jnp.stack([jnp.asarray(l) for l, _ in seq.frames[:n]])
        rights = jnp.stack([jnp.asarray(r) for _, r in seq.frames[:n]])
        chunk = eng2.process_chunk(lefts, rights)
        for k in range(n):
            np.testing.assert_array_equal(np.asarray(seq_results[k].pose),
                                          np.asarray(chunk.pose[k]))
            assert bool(chunk.valid[k]) == bool(seq_results[k].valid)
        # internal state must match too (next frame behaves the same)
        r1 = eng1.process_frame(*seq.frames[n])
        r2 = eng2.process_frame(*seq.frames[n])
        np.testing.assert_array_equal(np.asarray(r1.pose), np.asarray(r2.pose))

    def test_flow_chunk_slicing_matches_single_dispatch(self):
        """Splitting an OPTICAL_FLOW chunk across process_chunk calls must
        not change results (state threads through the carry on device)."""
        import dataclasses
        import jax.numpy as jnp
        from rso.config import IFMatchMethod

        s = make_sequence(n_frames=35, n_points=500, H=96, W=160)
        cfg = synthetic_config().replace(
            if_match=dataclasses.replace(synthetic_config().if_match,
                                         ifm_method=IFMatchMethod.OPTICAL_FLOW))
        lefts = jnp.stack([jnp.asarray(l) for l, _ in s.frames])
        rights = jnp.stack([jnp.asarray(r) for _, r in s.frames])
        eng1 = Engine(cfg, s.cam)
        sliced = eng1.process_chunk(lefts, rights)      # 32 + 3 dispatches
        eng2 = Engine(cfg, s.cam)
        a = eng2.process_chunk(lefts[:20], rights[:20])  # different split
        b = eng2.process_chunk(lefts[20:], rights[20:])
        joined = np.concatenate([np.asarray(a.pose), np.asarray(b.pose)])
        np.testing.assert_allclose(np.asarray(sliced.pose), joined,
                                   rtol=0, atol=0)
        assert sliced.pose.shape[0] == 35

    def test_deterministic(self, seq):
        eng1 = Engine(synthetic_config(), seq.cam)
        eng2 = Engine(synthetic_config(), seq.cam)
        for (l, r) in seq.frames[:3]:
            res1 = eng1.process_frame(l, r)
            res2 = eng2.process_frame(l, r)
        np.testing.assert_array_equal(np.asarray(res1.pose), np.asarray(res2.pose))


class TestEngineAPIs:
    def test_repeat_semantics(self, seq):
        """repeat=True must rerun against the same prev frame: the state's
        prev view after a repeat call reflects the new images, but tracking
        happened against the pre-previous state."""
        from rso.synthetic import synthetic_config

        eng = Engine(synthetic_config(), seq.cam)
        eng.process_frame(*seq.frames[0])
        eng.process_frame(*seq.frames[1])
        r_norm = eng.process_frame(*seq.frames[2])
        # rebuild and compare: processing frame 2 twice with repeat gives the
        # same result both times (same prev each time)
        eng2 = Engine(synthetic_config(), seq.cam)
        eng2.process_frame(*seq.frames[0])
        eng2.process_frame(*seq.frames[1])
        ra = eng2.process_frame(*seq.frames[2])
        rb = eng2.process_frame(*seq.frames[2], repeat=True)
        np.testing.assert_allclose(np.asarray(ra.pose), np.asarray(rb.pose),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ra.pose), np.asarray(r_norm.pose),
                                   atol=1e-6)

    def test_threshold_accessors(self, seq):
        from rso.synthetic import synthetic_config

        eng = Engine(synthetic_config(), seq.cam)
        eng.set_fast_threshold(999)
        assert eng.get_fast_threshold() == eng.cfg.detect.fast_max_th
        assert eng.is_fast_th_max()
        eng.set_fast_threshold(-5)
        assert eng.is_fast_th_min()
        eng.reset_fast_threshold()
        assert eng.get_fast_threshold() == eng.cfg.detect.initial_FAST_threshold
        eng.set_orb_threshold(0)
        assert eng.is_orb_th_min()

    def test_set_ids(self, seq):
        from rso.synthetic import synthetic_config

        eng = Engine(synthetic_config(), seq.cam)
        eng.process_frame(*seq.frames[0])
        eng.set_ids(np.arange(10) + 100)
        ids = np.asarray(eng.state.prev.octaves[0].match_ids)
        assert ids[:10].tolist() == list(range(100, 110))
        assert int(eng.state.last_match_id) >= 110

    def test_adaptive_nms_mode(self, seq):
        import dataclasses

        from rso.config import NMSMethod
        from rso.synthetic import synthetic_config

        cfg = synthetic_config()
        cfg = cfg.replace(detect=dataclasses.replace(
            cfg.detect, nmsMethod=NMSMethod.ADAPTIVE))
        eng = Engine(cfg, seq.cam)
        eng.process_frame(*seq.frames[0])
        r = eng.process_frame(*seq.frames[1])
        assert int(np.asarray(r.detected_feats).sum()) > 100
        assert bool(r.valid)


class TestDegenerateImages:
    """Pathological frames (flat black/white, pure noise) must flow through
    the whole jitted step without NaN/Inf anywhere — the failure-detection
    contract: report an error code, keep the state finite, recover when the
    scene comes back."""

    def test_flat_and_noise_frames_stay_finite_then_recover(self):
        seq = make_sequence(n_frames=4, n_points=1200, H=120, W=160)
        eng = Engine(synthetic_config(), seq.cam)
        eng.process_frame(*seq.frames[0])
        eng.process_frame(*seq.frames[1])

        rng = np.random.default_rng(3)
        bad = [np.zeros((120, 160), np.uint8),
               np.full((120, 160), 255, np.uint8),
               rng.integers(0, 255, (120, 160), np.uint8)]
        for img in bad:
            res = eng.process_frame(img, img)
            assert not bool(res.valid)
            assert np.isfinite(np.asarray(res.pose)).all()
            assert np.isfinite(np.asarray(res.residuals)).all()
            # the carried state must stay finite too, or the next good
            # frame inherits the poison
            for leaf in jax.tree_util.tree_leaves(eng.state):
                arr = np.asarray(leaf)
                if arr.dtype.kind == "f":
                    assert np.isfinite(arr).all()

        for l, r in seq.frames[2:]:
            res = eng.process_frame(l, r)
        assert np.isfinite(np.asarray(res.pose)).all()
