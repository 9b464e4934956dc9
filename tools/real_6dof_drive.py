"""Real-pixel multi-axis motion contracts: roll, pitch, yaw, forward scale.

Round-4's real-data validation covered only zero motion and a 1-DoF pan
(tools/real_kitti_drive.py).  This extends it to per-axis rotation and
forward-scale motion on the SAME real photographs (the reference's
rectified fixture pair /root/reference/libstereo-odometry/tests/0L.png|0R.png,
GT correspondence computeSAD8_unittest.cpp:27), with analytic ground truth:

* Rotation axes: frame i is BOTH eyes warped by the homography
  H_i = K R(i*theta)^T K^-1 about the crop's principal point.  Warping both
  eyes identically is EXACTLY a rigid rig rotation when the axis is the
  baseline (pitch here maps the baseline to itself); for yaw/roll the
  residual rig inconsistency is O(theta*B/Z) in observation space
  (~0.0044 rad * 0.12 m / 5 m * 520 px = 0.05 px/frame) — far below the
  10% per-frame bounds asserted.  Expected per-frame delta: rotation vector
  theta*axis, translation ~0.
* Forward: frame i is both eyes scaled by s^i about the principal point.
  Scaled disparity reads as depth Z/s^i, i.e. approach; the implied
  translation is scene-depth-dependent, so the contract is directional and
  statistical: dominant +z translation, consistent across frames, rotation
  ~0.  (Exact forward GT needs per-pixel depth; a 2-D warp cannot fake it
  on a non-planar real scene.)

Writes docs/artifacts/real_6dof_r5.json; the cheap CI version lives in
tests/test_real_fixture.py::TestSixDofRealPixels.
Reference contract: the demo's real-stream loop, demo-main.cpp:210-287.
"""
import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = "/root/reference/libstereo-odometry/tests"
sys.path.insert(0, ROOT)


def load_fixture():
    from PIL import Image

    L = np.asarray(Image.open(os.path.join(FIX, "0L.png")).convert("L"))
    R = np.asarray(Image.open(os.path.join(FIX, "0R.png")).convert("L"))
    return L, R


def rot(axis, theta):
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def warp_sequence(L, R, n_frames, H_of_i, crop, offset, f):
    """Frame i = both eyes warped by the 3x3 pixel homography H_of_i(i) about
    the crop's principal point, then cropped."""
    import cv2

    W, Hc = crop
    x0, y0 = offset
    frames = []
    for i in range(n_frames):
        Hm = H_of_i(i)
        li = cv2.warpPerspective(L, Hm, (L.shape[1], L.shape[0]),
                                 flags=cv2.INTER_LINEAR)
        ri = cv2.warpPerspective(R, Hm, (R.shape[1], R.shape[0]),
                                 flags=cv2.INTER_LINEAR)
        frames.append((li[y0:y0 + Hc, x0:x0 + W], ri[y0:y0 + Hc, x0:x0 + W]))
    return frames


def K_of(f, cx_full, cy_full):
    return np.array([[f, 0, cx_full], [0, f, cy_full], [0, 0, 1.0]])


def run_engine(frames, crop, f, baseline):
    import jax.numpy as jnp

    from rso.engine import Engine
    from rso.geometry.stereo_camera import StereoCamera
    from rso.synthetic import textured_config

    W, Hc = crop
    cam = StereoCamera.make(fx_l=f, fy_l=f, cx_l=W / 2.0, cy_l=Hc / 2.0,
                            baseline=baseline)
    eng = Engine(textured_config(), cam)
    Ls = jnp.stack([jnp.asarray(l) for l, _ in frames])
    Rs = jnp.stack([jnp.asarray(r) for _, r in frames])
    res = eng.process_chunk(Ls, Rs)
    return np.asarray(res.pose), np.asarray(res.valid)


def measure_axis(L, R, axis_name, axis, theta_deg, n_frames, crop, offset,
                 f, baseline):
    """Per-frame deltas under cumulative rotation i*theta about `axis`."""
    W, Hc = crop
    x0, y0 = offset
    K = K_of(f, x0 + W / 2.0, y0 + Hc / 2.0)
    Kinv = np.linalg.inv(K)
    th = np.radians(theta_deg)

    def H_of_i(i):
        return K @ rot(axis, i * th).T @ Kinv

    frames = warp_sequence(L, R, n_frames, H_of_i, crop, offset, f)
    poses, valid = run_engine(frames, crop, f, baseline)
    # frame 0 bootstraps (identity delta by construction)
    w = poses[1:, :3][valid[1:]]
    t = poses[1:, 3:][valid[1:]]
    angs = np.degrees(np.linalg.norm(w, axis=1))
    dom = np.abs(w).argmax(1)
    entry = {
        "axis": axis_name, "theta_deg_per_frame": theta_deg,
        "n_valid": int(valid[1:].sum()), "n_frames": n_frames - 1,
        "rot_deg_per_frame": [round(float(a), 4) for a in angs],
        "median_rot_deg": round(float(np.median(angs)), 4),
        "dominant_axis_frac": round(float(
            (dom == int(np.argmax(np.abs(axis)))).mean()), 3),
        "max_trans_m": round(float(np.linalg.norm(t, axis=1).max()), 5),
        "median_rot_err_pct": round(float(
            abs(np.median(angs) - theta_deg) / theta_deg * 100), 2),
    }
    entry["pass"] = bool(
        entry["n_valid"] == n_frames - 1
        and entry["median_rot_err_pct"] < 10.0
        and entry["dominant_axis_frac"] >= 0.99
        and entry["max_trans_m"] < 0.005)
    return entry


def measure_forward(L, R, scale_per_frame, n_frames, crop, offset, f,
                    baseline):
    W, Hc = crop
    x0, y0 = offset
    cxf, cyf = x0 + W / 2.0, y0 + Hc / 2.0

    def H_of_i(i):
        s = scale_per_frame ** i
        return np.array([[s, 0, (1 - s) * cxf],
                         [0, s, (1 - s) * cyf],
                         [0, 0, 1.0]])

    frames = warp_sequence(L, R, n_frames, H_of_i, crop, offset, f)
    poses, valid = run_engine(frames, crop, f, baseline)
    w = poses[1:, :3][valid[1:]]
    t = poses[1:, 3:][valid[1:]]
    angs = np.degrees(np.linalg.norm(w, axis=1))
    tz = t[:, 2]
    entry = {
        "axis": "forward(scale)", "scale_per_frame": scale_per_frame,
        "n_valid": int(valid[1:].sum()), "n_frames": n_frames - 1,
        "tz_m_per_frame": [round(float(v), 4) for v in tz],
        "median_tz_m": round(float(np.median(tz)), 4),
        "tz_dominance": round(float(
            np.median(np.abs(tz) / np.maximum(
                np.linalg.norm(t, axis=1), 1e-12))), 3),
        "tz_spread": round(float(
            np.abs(tz - np.median(tz)).max() / abs(np.median(tz))), 3),
        "max_rot_deg": round(float(angs.max()), 4),
    }
    entry["pass"] = bool(
        entry["n_valid"] == n_frames - 1
        and entry["median_tz_m"] > 0.01        # it saw the approach
        and entry["tz_dominance"] > 0.95       # translation is along +z
        and entry["tz_spread"] < 0.35          # consistent frame to frame
        # the scale warp moves scene points (X,Y,Z)->(X,Y,Z/s) — NON-rigid —
        # so the best-fit rigid motion leaks a small apparent rotation on a
        # depth-asymmetric scene (measured ~0.09 deg at 1.4 cm/frame on the
        # fixture); bound it well below the 0.25 deg/frame rotation arms
        and entry["max_rot_deg"] < 0.12)
    return entry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=9)
    ap.add_argument("--theta", type=float, default=0.25, help="deg/frame")
    ap.add_argument("--scale", type=float, default=1.006)
    ap.add_argument("--out", default=os.path.join(
        ROOT, "docs", "artifacts", "real_6dof_r5.json"))
    args = ap.parse_args()

    L, R = load_fixture()
    crop, offset, f, baseline = (640, 480), (80, 60), 520.0, 0.12
    results = {}
    for name, axis in (("yaw", (0, 1, 0)), ("pitch", (1, 0, 0)),
                       ("roll", (0, 0, 1))):
        e = measure_axis(L, R, name, axis, args.theta, args.frames, crop,
                         offset, f, baseline)
        results[name] = e
        print(json.dumps({name: e}), flush=True)
    e = measure_forward(L, R, args.scale, args.frames, crop, offset, f,
                        baseline)
    results["forward"] = e
    print(json.dumps({"forward": e}), flush=True)

    doc = {
        "what": "real-photograph per-axis motion contracts (roll/pitch/yaw "
                "exact rotation homographies + approximate forward scale) "
                "through the full engine",
        "fixture": f"{FIX}/0L.png|0R.png (800x600, real rectified stereo)",
        "all_pass": all(r["pass"] for r in results.values()),
        "results": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fo:
        json.dump(doc, fo, indent=1)
    print(f"wrote {args.out}")
    return 0 if doc["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
