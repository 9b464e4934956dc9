"""Config-mode coverage: every detector / matcher / tracker enum value runs
end-to-end, plus LK flow unit behavior and the FAST threshold servo."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rso.config import DetectMethod, IFMatchMethod, StereoMatchMethod
from rso.engine import Engine
from rso.synthetic import make_sequence, synthetic_config


@pytest.fixture(scope="module")
def seq():
    return make_sequence(n_frames=4, n_points=1800, H=160, W=240)


def _run3(cfg, seq):
    eng = Engine(cfg, seq.cam)
    results = [eng.process_frame(l, r) for l, r in seq.frames[:4]]
    return results


class TestDetectorModes:
    def test_klt_mode(self, seq):
        cfg = synthetic_config()
        cfg = cfg.replace(detect=dataclasses.replace(
            cfg.detect, detect_method=DetectMethod.KLT,
            minimum_KLT_response=5.0))
        rs = _run3(cfg, seq)
        assert any(bool(r.valid) for r in rs[1:])
        assert int(np.asarray(rs[1].detected_feats).sum()) > 100

    def test_orb_mode_single_octave(self, seq):
        cfg = synthetic_config()
        cfg = cfg.replace(
            detect=dataclasses.replace(cfg.detect,
                                       detect_method=DetectMethod.ORB,
                                       orb_upright=True),
            lr_match=dataclasses.replace(
                cfg.lr_match, match_method=StereoMatchMethod.DESC_BF,
                orb_max_distance=64.0, max_y_diff=1.5, use_z_gate=False),
            if_match=dataclasses.replace(
                cfg.if_match, ifm_method=IFMatchMethod.DESC_BF,
                orb_max_distance=64.0),
        )
        assert cfg.n_octaves == 1  # ORB forces one octave
        rs = _run3(cfg, seq)
        assert any(bool(r.valid) for r in rs[1:])

    def test_fast_orb_desc_win(self, seq):
        cfg = synthetic_config()
        cfg = cfg.replace(
            detect=dataclasses.replace(cfg.detect,
                                       detect_method=DetectMethod.FAST_ORB,
                                       orb_upright=True),
            lr_match=dataclasses.replace(
                cfg.lr_match, match_method=StereoMatchMethod.DESC_RBR,
                orb_max_distance=64.0, max_y_diff=1.5, use_z_gate=False),
            if_match=dataclasses.replace(
                cfg.if_match, ifm_method=IFMatchMethod.DESC_WIN,
                orb_max_distance=64.0),
        )
        rs = _run3(cfg, seq)
        assert any(bool(r.valid) for r in rs[1:])


class TestFASTServo:
    def test_threshold_adapts(self, seq):
        """With update_dyn_thresholds the per-octave FAST threshold moves
        toward target_feats_per_pixel (reference stage2_detect.cpp:537-550)."""
        cfg = synthetic_config()
        cfg = cfg.replace(detect=dataclasses.replace(
            cfg.detect, update_dyn_thresholds=True,
            target_feats_per_pixel=0.05,   # demand far more corners than exist
            initial_FAST_threshold=25))
        eng = Engine(cfg, seq.cam)
        th0 = int(eng.cfg.detect.initial_FAST_threshold)
        for l, r in seq.frames:
            eng.process_frame(l, r)
        th1 = np.asarray(eng.state.fast_th)
        assert (th1 < th0).all()  # servo lowered the threshold to find more

    def test_threshold_static_by_default(self, seq):
        cfg = synthetic_config()
        eng = Engine(cfg, seq.cam)
        for l, r in seq.frames[:2]:
            eng.process_frame(l, r)
        np.testing.assert_array_equal(
            np.asarray(eng.state.fast_th),
            cfg.detect.initial_FAST_threshold)


class TestLKFlow:
    def test_recovers_known_shift(self, rng):
        """lk_track must recover a pure integer translation exactly."""
        from rso.frontend.optical_flow import lk_track
        from rso.frontend.pyramid import build_pyramid
        from rso.synthetic import make_sequence

        seq = make_sequence(n_frames=1, n_points=900, H=160, W=240)
        img = jnp.asarray(seq.frames[0][0], jnp.float32)
        shifted = jnp.roll(img, shift=(3, -5), axis=(0, 1))  # dy=+3? see below
        # roll(img, (3,-5)) => shifted[y,x] = img[y-3, x+5]: content moves
        # +3 rows, -5 cols
        # track detected corners (random points mostly sit on flat
        # background where LK has no signal)
        from rso.frontend.detect import detect_features
        from rso.synthetic import synthetic_config

        cfg = synthetic_config()
        f = detect_features(img, cfg.detect, 64, jnp.int32(20), False)
        pts = f.xy[f.valid & (f.xy[:, 0] > 20) & (f.xy[:, 0] < 215)
                   & (f.xy[:, 1] > 20) & (f.xy[:, 1] < 140)][:40]
        p1 = build_pyramid(img, 2)
        p2 = build_pyramid(shifted, 2)
        res = lk_track(p1, p2, pts, jnp.ones(pts.shape[0], bool),
                       win=8, iters=12)
        ok = np.asarray(res.status)
        assert ok.mean() > 0.7
        flow = np.asarray(res.pos - pts)[ok]
        med = np.median(flow, axis=0)
        np.testing.assert_allclose(med, [-5.0, 3.0], atol=0.15)

    def test_flat_region_rejected(self, rng):
        from rso.frontend.optical_flow import lk_track

        img = jnp.full((64, 64), 100.0)
        pts = jnp.asarray([[32.0, 32.0]])
        res = lk_track([img], [img], pts, jnp.ones(1, bool))
        assert not bool(res.status[0])  # no gradient -> not trackable


class TestMultihostHelpers:
    def test_initialize_noop_without_env(self, monkeypatch):
        from rso.ba.multihost import initialize_multihost

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert initialize_multihost() is False

    def test_global_mesh(self):
        from rso.ba.multihost import global_landmark_mesh

        mesh = global_landmark_mesh()
        assert mesh.devices.size == len(jax.devices())
