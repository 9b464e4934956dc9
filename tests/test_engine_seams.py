"""Engine seams: precomputed-data injection (reference use_precomputed_data)
and on-device rectification maps."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from rso.config import DetectMethod, IFMatchMethod, StereoMatchMethod
from rso.engine import Engine
from rso.frontend.detect import detect_features
from rso.synthetic import make_sequence, synthetic_config


@pytest.fixture(scope="module")
def seq():
    return make_sequence(n_frames=4, n_points=1500, H=160, W=240)


def orb_like_config():
    cfg = synthetic_config()
    return cfg.replace(
        rectify=dataclasses.replace(cfg.rectify, nOctaves=1),
        detect=dataclasses.replace(cfg.detect,
                                   detect_method=DetectMethod.FAST_ORB),
        lr_match=dataclasses.replace(
            cfg.lr_match, match_method=StereoMatchMethod.DESC_RBR,
            orb_max_distance=64.0, max_y_diff=1.5,
            enable_robust_1to1_match=True, use_z_gate=False),
        if_match=dataclasses.replace(
            cfg.if_match, ifm_method=IFMatchMethod.DESC_WIN,
            orb_max_distance=64.0),
    )


class TestPrecomputedSeam:
    def test_injected_features_run_pipeline(self, seq):
        """Inject our own detector's output through the seam: results must
        match the full pipeline's within the same frame."""
        cfg = orb_like_config()
        H, W = seq.frames[0][0].shape

        eng_full = Engine(cfg, seq.cam)
        eng_pre = Engine(cfg, seq.cam)

        n_both_valid = 0
        for i, (l, r) in enumerate(seq.frames[:3]):
            res_full = eng_full.process_frame(l, r)
            # extract the same features the full pipeline detected
            fl = detect_features(jnp.asarray(l, jnp.float32), cfg.detect,
                                 cfg.tpu.max_kps_per_octave, jnp.int32(20),
                                 need_desc=True)
            fr = detect_features(jnp.asarray(r, jnp.float32), cfg.detect,
                                 cfg.tpu.max_kps_per_octave, jnp.int32(20),
                                 need_desc=True)
            res_pre = eng_pre.process_precomputed([fl], [fr], img_hw=(H, W))
            np.testing.assert_array_equal(
                np.asarray(res_pre.stereo_matches),
                np.asarray(res_full.stereo_matches))
            assert (int(res_pre.tracked_feats_from_last_frame)
                    == int(res_full.tracked_feats_from_last_frame))
            if bool(res_pre.valid) and bool(res_full.valid):
                n_both_valid += 1
                np.testing.assert_allclose(np.asarray(res_pre.pose),
                                           np.asarray(res_full.pose),
                                           atol=1e-4)
        assert n_both_valid >= 1

    def test_injected_matches(self, seq):
        """Also inject the stereo matches (skip stage 3)."""
        cfg = orb_like_config()
        H, W = seq.frames[0][0].shape
        eng = Engine(cfg, seq.cam)
        l, r = seq.frames[0]
        fl = detect_features(jnp.asarray(l, jnp.float32), cfg.detect,
                             cfg.tpu.max_kps_per_octave, jnp.int32(20), True)
        fr = detect_features(jnp.asarray(r, jnp.float32), cfg.detect,
                             cfg.tpu.max_kps_per_octave, jnp.int32(20), True)
        li = np.asarray([0, 1, 2, 3, 4])
        ri = np.asarray([0, 1, 2, 3, 4])
        res = eng.process_precomputed([fl], [fr], matches=[(li, ri)],
                                      img_hw=(H, W))
        assert int(np.asarray(res.stereo_matches)[0]) == 5

    def test_optical_flow_mode_rejected(self, seq):
        cfg = orb_like_config()
        cfg = cfg.replace(if_match=dataclasses.replace(
            cfg.if_match, ifm_method=IFMatchMethod.OPTICAL_FLOW))
        eng = Engine(cfg, seq.cam)
        with pytest.raises(ValueError, match="precomputed"):
            eng.process_precomputed([None], [None], img_hw=(160, 240))


class TestRectifyMaps:
    def test_identity_maps_equal_no_maps(self, seq):
        cfg = synthetic_config()
        H, W = seq.frames[0][0].shape
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        maps = ((xs, ys), (xs, ys))

        e1 = Engine(cfg, seq.cam)
        e2 = Engine(cfg, seq.cam, rectify_maps=maps)
        for l, r in seq.frames[:2]:
            r1 = e1.process_frame(l, r)
            r2 = e2.process_frame(l, r)
        np.testing.assert_allclose(np.asarray(r1.pose), np.asarray(r2.pose),
                                   atol=1e-5)

    def test_shift_maps_shift_features(self, seq):
        """A +3px x-shift map must shift detected features by -3px."""
        cfg = synthetic_config()
        H, W = seq.frames[0][0].shape
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        maps = ((xs + 3.0, ys), (xs + 3.0, ys))
        e1 = Engine(cfg, seq.cam)
        e2 = Engine(cfg, seq.cam, rectify_maps=maps)
        l, r = seq.frames[0]
        e1.process_frame(l, r)
        e2.process_frame(l, r)
        xy1 = np.asarray(e1.state.prev.octaves[0].left.xy)
        v1 = np.asarray(e1.state.prev.octaves[0].left.valid)
        xy2 = np.asarray(e2.state.prev.octaves[0].left.xy)
        v2 = np.asarray(e2.state.prev.octaves[0].left.valid)
        # compare mean x of strong features (sets nearly identical)
        assert abs((xy1[v1][:50, 0].mean() - 3.0) - xy2[v2][:50, 0].mean()) < 1.0
