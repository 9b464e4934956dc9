"""Live streaming input (--watch): the headless camera-stream analogue.

The reference demo consumes live/recorded streams until the stream ends
(demo-main.cpp:210-239); here the stream is a directory that grows
left_*/right_* files.  Covers: frames yielded as they appear, pairs held
until both halves exist with stable sizes, stream-over on idle timeout,
and the demo CLI end-to-end in watch mode.
"""
import threading
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rso.io.datasets import watch_image_dir


def _write_pair(d, i, img_l, img_r):
    cv2.imwrite(str(d / f"left_{i:04d}.png"), img_l)
    cv2.imwrite(str(d / f"right_{i:04d}.png"), img_r)


class TestWatchImageDir:
    def test_streams_frames_as_they_appear(self, tmp_path):
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (24, 32), np.uint8) for _ in range(8)]
        _write_pair(tmp_path, 0, imgs[0], imgs[0])

        def writer():
            for i in range(1, 4):
                time.sleep(0.15)
                _write_pair(tmp_path, i, imgs[i], imgs[i])

        th = threading.Thread(target=writer)
        th.start()
        got = list(watch_image_dir(str(tmp_path), poll_s=0.05,
                                   idle_timeout_s=1.0))
        th.join()
        assert [f.index for f in got] == [0, 1, 2, 3]
        for f, img in zip(got, imgs):
            np.testing.assert_array_equal(f.left, img)

    def test_left_without_right_is_held_back(self, tmp_path):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (24, 32), np.uint8)
        cv2.imwrite(str(tmp_path / "left_0000.png"), img)

        def late_right():
            time.sleep(0.4)
            cv2.imwrite(str(tmp_path / "right_0000.png"), img)

        th = threading.Thread(target=late_right)
        t0 = time.monotonic()
        th.start()
        got = list(watch_image_dir(str(tmp_path), poll_s=0.05,
                                   idle_timeout_s=1.0))
        th.join()
        assert len(got) == 1
        assert time.monotonic() - t0 >= 0.4  # waited for the right half

    def test_empty_dir_times_out(self, tmp_path):
        t0 = time.monotonic()
        got = list(watch_image_dir(str(tmp_path), poll_s=0.05,
                                   idle_timeout_s=0.3))
        assert got == []
        assert 0.25 <= time.monotonic() - t0 < 3.0


class TestWatchCLI:
    def test_demo_watch_end_to_end(self, tmp_path):
        """rso-demo --watch over a growing dir: all frames processed, KITTI
        trajectory written when the stream goes idle."""
        from rso.cli.demo import main
        from rso.synthetic import make_sequence

        seq = make_sequence(n_frames=4, n_points=800, H=120, W=160)
        d = tmp_path / "stream"
        d.mkdir()
        cam_ini = tmp_path / "cam.ini"
        cam_ini.write_text(
            "[CAMERA_PARAMS]\nresolution=[160 120]\nfx=100\nfy=100\n"
            "cx=80\ncy=60\nbaseline=0.3\n")
        for i, (l, r) in enumerate(seq.frames):
            _write_pair(d, i, l, r)
        out = tmp_path / "traj.txt"
        rc = main(["--img-dir", str(d), "--cam", str(cam_ini), "--watch",
                   "--watch-idle", "1", "--out", str(out)])
        assert rc == 0
        lines = out.read_text().strip().splitlines()
        assert len(lines) == 5  # identity + 4 frames
        assert all(len(ln.split()) == 12 for ln in lines)


class TestWatchRobustness:
    def test_backlog_drains_multiple_pairs_per_poll(self, tmp_path):
        """6 pre-existing pairs must drain in ~2 polls (size-stability pass
        + yield pass), not one pair per poll."""
        rng = np.random.default_rng(2)
        for i in range(6):
            img = rng.integers(0, 255, (24, 32), np.uint8)
            _write_pair(tmp_path, i, img, img)
        t0 = time.monotonic()
        got = list(watch_image_dir(str(tmp_path), poll_s=0.5,
                                   idle_timeout_s=0.8))
        drain = time.monotonic() - t0
        assert [f.index for f in got] == list(range(6))
        # one-pair-per-poll would sleep >= 6 polls (3.0 s) before idle even
        # starts; the multi-drain path needs ~2 polls (1.0 s) + 0.8 s idle.
        # 3.2 s splits the two with >= 0.6 s margin either way under load
        assert drain < 3.2

    def test_missing_partner_skips_only_that_frame(self, tmp_path):
        """left_0002 without right_0002 must not shift later pairs off by
        one — stem matching pairs 0003 with 0003."""
        rng = np.random.default_rng(4)
        imgs = [rng.integers(0, 255, (24, 32), np.uint8) for _ in range(4)]
        for i in range(4):
            cv2.imwrite(str(tmp_path / f"left_{i:04d}.png"), imgs[i])
            if i != 2:
                cv2.imwrite(str(tmp_path / f"right_{i:04d}.png"), imgs[i])
        got = list(watch_image_dir(str(tmp_path), poll_s=0.05,
                                   idle_timeout_s=0.5))
        assert len(got) == 3
        for f, want in zip(got, [imgs[0], imgs[1], imgs[3]]):
            np.testing.assert_array_equal(f.right, want)
