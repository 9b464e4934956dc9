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

    def test_chunk_matches_per_frame(self):
        """process_chunk (scan of the vmapped step, one dispatch) must
        evolve every lane exactly like per-frame process_frames calls."""
        seqs = [make_sequence(n_frames=5, n_points=1200, H=120, W=160, seed=s)
                for s in range(2)]
        cfg = synthetic_config()

        be_f = BatchEngine(cfg, seqs[0].cam, batch=2, img_h=120, img_w=160)
        per_frame = [be_f.process_frames(
            np.stack([s.frames[t][0] for s in seqs]),
            np.stack([s.frames[t][1] for s in seqs])) for t in range(5)]

        be_c = BatchEngine(cfg, seqs[0].cam, batch=2, img_h=120, img_w=160)
        res = be_c.process_chunk(
            np.stack([np.stack([l for l, _ in s.frames]) for s in seqs]),
            np.stack([np.stack([r for _, r in s.frames]) for s in seqs]))

        assert res.pose.shape == (5, 2, 6)
        for t in range(5):
            np.testing.assert_array_equal(np.asarray(res.valid[t]),
                                          np.asarray(per_frame[t].valid))
            np.testing.assert_allclose(np.asarray(res.pose[t]),
                                       np.asarray(per_frame[t].pose),
                                       atol=1e-5)

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


class TestFleetCLI:
    def test_synthetic_fleet_end_to_end(self, tmp_path, capsys):
        """rso-fleet over 2 synthetic sequences: per-sequence trajectories,
        ATE lines, and a parseable JSON summary."""
        import json

        from rso.cli.fleet import main

        rc = main(["--synthetic", "2", "--frames", "6", "--chunk", "4",
                   "--out-dir", str(tmp_path), "--coast"])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        summary = json.loads(out[-1])
        assert summary["sequences"] == 2
        assert summary["frames_per_seq"] == 6
        assert summary["valid_frac"] > 0.5
        assert len(summary["ate_rmse_m"]) == 2
        assert all(a is not None and a < 1.0 for a in summary["ate_rmse_m"])
        for i in range(2):
            f = tmp_path / f"seq_synthetic_{i}.txt"
            assert f.exists()
            assert len(f.read_text().strip().splitlines()) == 7  # id + 6

    def test_no_sources_is_an_error(self):
        import pytest as _pytest

        from rso.cli.fleet import main

        with _pytest.raises(SystemExit):
            main(["--frames", "4"])

    def test_image_size_mismatch_is_an_error(self, tmp_path):
        """Two real-layout image dirs with different sizes must be refused
        (the fleet step compiles one [H,W])."""
        import cv2
        import pytest as _pytest

        from rso.cli.fleet import main

        cam_ini = tmp_path / "cam.ini"
        cam_ini.write_text(
            "[CAMERA_PARAMS]\nresolution=[64 48]\nfx=60\nfy=60\n"
            "cx=32\ncy=24\nbaseline=0.12\n")
        rng = np.random.default_rng(0)
        for name, (h, w) in (("a", (48, 64)), ("b", (56, 72))):
            d = tmp_path / name
            d.mkdir()
            for t in range(2):
                for side in ("left", "right"):
                    cv2.imwrite(str(d / f"{side}_{t:04d}.png"),
                                rng.integers(0, 255, (h, w), np.uint8))
        with _pytest.raises(SystemExit, match="must match|different"):
            main(["--img-dir", str(tmp_path / "a"),
                  "--img-dir", str(tmp_path / "b"),
                  "--cam", str(cam_ini), "--frames", "2",
                  "--out-dir", str(tmp_path / "out")])
