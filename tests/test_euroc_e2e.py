"""End-to-end EuRoC path: on-disk mav0 tree -> load_euroc -> rectify maps ->
Engine / demo CLI.

Round-1 regression: load_euroc computed the rectification maps and threw them
away, and the demo built Engine() without them, feeding raw distorted images
to a rectified-pinhole engine (reference applies its cached rectify map every
frame, stage1_rectify.cpp:66-73).  These tests drive the whole wiring through
the public surfaces, not the seam.
"""
import os

import numpy as np
import pytest

from rso.synthetic import make_unrectified_sequence

cv2 = pytest.importorskip("cv2")

DIST = (-0.28, 0.07, 0.001, -0.001, 0.0)
RIG_ROT = (0.012, 0.02, 0.008)


def _yaml(T_BS, intr, dist, W, H):
    rows = ", ".join(f"{x:.12f}" for x in np.asarray(T_BS).ravel())
    return (
        "sensor_type: camera\n"
        "T_BS:\n"
        "  rows: 4\n  cols: 4\n"
        f"  data: [{rows}]\n"
        "rate_hz: 20\n"
        f"resolution: [{W}, {H}]\n"
        "camera_model: pinhole\n"
        f"intrinsics: [{', '.join(str(x) for x in intr)}]\n"
        "distortion_model: radial-tangential\n"
        f"distortion_coefficients: [{', '.join(str(x) for x in dist)}]\n"
    )


@pytest.fixture(scope="module")
def euroc_tree(tmp_path_factory):
    """A fake EuRoC sequence dir rendered from the distorted synthetic rig."""
    root = tmp_path_factory.mktemp("euroc_seq")
    seq, calib = make_unrectified_sequence(
        n_frames=6, n_points=1800, dist=DIST, rig_rot=RIG_ROT)
    H, W = calib.size
    T_l = np.eye(4)  # cam0 == body
    T_r = np.eye(4)  # X_body = R_lr X_r + t_lr
    T_r[:3, :3] = calib.R_lr
    T_r[:3, 3] = calib.t_lr
    for name, T_BS, K, d in (("cam0", T_l, calib.K_l, calib.dist_l),
                             ("cam1", T_r, calib.K_r, calib.dist_r)):
        data = os.path.join(root, "mav0", name, "data")
        os.makedirs(data)
        intr = [K[0, 0], K[1, 1], K[0, 2], K[1, 2]]
        with open(os.path.join(root, "mav0", name, "sensor.yaml"), "w") as f:
            f.write(_yaml(T_BS, intr, d[:4], W, H))
    for i, (l, r) in enumerate(seq.frames):
        ts = 1403636579763555584 + i * 50_000_000  # EuRoC-style ns stamps
        cv2.imwrite(os.path.join(root, "mav0", "cam0", "data", f"{ts}.png"), l)
        cv2.imwrite(os.path.join(root, "mav0", "cam1", "data", f"{ts}.png"), r)
    return str(root), seq


def test_load_euroc_returns_rectify_maps(euroc_tree):
    from rso.io.datasets import load_euroc

    root, seq = euroc_tree
    ds = load_euroc(root)
    assert len(ds) == 6
    assert ds.rectify_maps is not None
    (mlx, mly), (mrx, mry) = ds.rectify_maps
    H, W = seq.frames[0][0].shape
    assert mlx.shape == (H, W) and mry.shape == (H, W)
    # maps must be non-trivial (distortion present)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    assert np.abs(mlx - xs).max() > 2.0


def test_engine_with_loader_maps_tracks_accurately(euroc_tree):
    """Frames decoded from disk + loader-provided maps: per-frame pose error
    must be small; dropping the maps must lose matches (the round-1 bug)."""
    from rso.engine import Engine
    from rso.geometry import pose_matrix
    from rso.io.datasets import load_euroc
    from rso.synthetic import synthetic_config

    root, seq = euroc_tree
    ds = load_euroc(root)
    cfg = synthetic_config()

    def run(maps):
        eng = Engine(cfg, ds.cam, rectify_maps=maps)
        errs, nmatch = [], []
        for f in ds:
            res = eng.process_frame(f.left, f.right)
            nmatch.append(int(np.asarray(res.stereo_matches).sum()))
            if f.index and bool(res.valid):
                M = np.asarray(pose_matrix(res.pose))
                errs.append(np.linalg.norm(
                    M[:3, 3] - seq.rel_poses[f.index - 1][:3, 3]))
        return (np.mean(errs) if errs else np.inf), np.mean(nmatch)

    err_r, m_r = run(ds.rectify_maps)
    err_0, m_0 = run(None)
    assert err_r < 0.06
    assert m_r > m_0 * 1.3


def test_demo_cli_euroc_end_to_end(euroc_tree, tmp_path):
    """The full CLI: rso-demo --euroc must rectify on device and produce a
    trajectory close to ground truth."""
    from rso.cli import demo

    root, seq = euroc_tree
    ini = tmp_path / "synth.ini"
    ini.write_text(
        "[MATCH]\n"
        "max_y_diff = 1.0\n"
        "sad_max_distance = 4000\n"
        "sad_max_ratio = 0.7\n"
        "enable_robust_1to1_match = 1\n"
        "use_z_gate = 1\n"
        "min_z = 2.0\n"
        "max_z = 25.0\n"
        "[IF-MATCH]\n"
        "sad_max_distance = 4000\n"
    )
    out = tmp_path / "traj.txt"
    rc = demo.main(["--euroc", root, "--config", str(ini),
                    "--out", str(out), "--verbosity", "0"])
    assert rc == 0
    traj = np.loadtxt(out).reshape(-1, 3, 4)
    # row 0 is the pre-frame identity; image i corresponds to row i+1
    traj = traj[1:]
    n = min(len(traj), len(seq.poses))
    err = np.linalg.norm(traj[:n, :3, 3] - seq.poses[:n, :3, 3], axis=-1)
    # 6 frames x 0.25 m/frame forward motion; a broken (unrectified) run
    # loses tracking entirely and stays near the origin
    assert err.max() < 0.12
    assert np.linalg.norm(traj[n - 1, :3, 3]) > 0.8
