"""Multi-sequence data parallelism over a virtual device mesh + preset configs."""
import numpy as np
import pytest

import jax

from rso.config import load_config
from rso.parallel import BatchEngine
from rso.synthetic import make_sequence, synthetic_config


class TestBatchEngine:
    def test_batch_matches_individual(self):
        """Each lane of the batched engine must reproduce the single-engine
        result for its own sequence."""
        from rso.engine import Engine

        seqs = [make_sequence(n_frames=3, n_points=1200, H=120, W=160, seed=s)
                for s in range(4)]
        cfg = synthetic_config()

        be = BatchEngine(cfg, seqs[0].cam, batch=4, img_h=120, img_w=160)
        for t in range(3):
            res_b = be.process_frames(
                np.stack([s.frames[t][0] for s in seqs]),
                np.stack([s.frames[t][1] for s in seqs]))

        for i, s in enumerate(seqs):
            eng = Engine(cfg, s.cam)
            for t in range(3):
                res_1 = eng.process_frame(*s.frames[t])
            assert bool(res_b.valid[i]) == bool(res_1.valid)
            np.testing.assert_allclose(np.asarray(res_b.pose[i]),
                                       np.asarray(res_1.pose), atol=1e-5)

    def test_mesh_sharding(self):
        assert len(jax.devices()) >= 8
        cfg = synthetic_config()
        seq = make_sequence(n_frames=2, n_points=800, H=96, W=128)
        be = BatchEngine(cfg, seq.cam, batch=8, img_h=96, img_w=128)
        assert be.mesh.devices.size == 8
        res = be.process_frames(
            np.stack([seq.frames[0][0]] * 8), np.stack([seq.frames[0][1]] * 8))
        assert res.pose.shape == (8, 6)


class TestPresetConfigs:
    @pytest.mark.parametrize("name", ["kitti", "euroc"])
    def test_loads(self, name):
        cfg = load_config(f"configs/{name}.ini")
        assert cfg.rectify.nOctaves == 3
        assert cfg.general.vo_use_matches_ids is True
        assert cfg.lr_match.max_y_diff > 0
        assert isinstance(hash(cfg), int)
