"""Measure the reference-algorithm CPU baseline (FPS + ATE) on the bench scenes.

Runs native/rso_baseline (the faithful OpenCV port of the reference pipeline;
the reference itself cannot build here — MRPT is absent, see BASELINE.md) on
the SAME scene bench.py uses, and writes BASELINE_MEASURED.json at the repo
root.  bench.py computes vs_baseline from this artifact instead of the
round-1 estimate.

Usage: python tools/measure_baseline.py [--frames 120] [--scene blob|textured|both]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(ROOT, "native", "rso_baseline")


def _write_scene(seq, tmp):
    try:
        import cv2

        for i, (l, r) in enumerate(seq.frames):
            cv2.imwrite(os.path.join(tmp, f"left_{i:04d}.png"), l)
            cv2.imwrite(os.path.join(tmp, f"right_{i:04d}.png"), r)
    except ImportError:
        from PIL import Image

        for i, (l, r) in enumerate(seq.frames):
            Image.fromarray(l).save(os.path.join(tmp, f"left_{i:04d}.png"))
            Image.fromarray(r).save(os.path.join(tmp, f"right_{i:04d}.png"))


def _integrate(deltas_path, n):
    """Compose baseline_deltas.txt (w1..3 t1..3 valid per frame) into [N,4,4]
    camera-to-world poses, bridging invalid frames with identity (the same
    convention the Python bench uses)."""
    from scipy.spatial.transform import Rotation

    rows = np.loadtxt(deltas_path).reshape(-1, 7)
    T = np.eye(4)
    poses = []
    for f in range(n):
        w = rows[f, :3]
        t = rows[f, 3:6]
        if rows[f, 6] > 0:
            M = np.eye(4)
            M[:3, :3] = Rotation.from_rotvec(w).as_matrix()
            M[:3, 3] = t
            T = T @ M
        poses.append(T.copy())
    return np.stack(poses), int(rows[:, 6].sum())


def measure(scene: str, n_frames: int, width=1241, height=376):
    from rso.geometry.stereo_camera import StereoCamera
    from rso.metrics.ate import ate_rmse
    from rso.synthetic import make_sequence, make_textured_sequence

    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=width / 2.0,
                            cy_l=height / 2.0, baseline=0.5371)
    if scene == "blob":
        seq = make_sequence(n_frames=n_frames,
                            n_points=max(2000, n_frames * 17),
                            H=height, W=width, cam=cam, speed=0.8)
        max_sad = 4000.0   # blob texture: synthetic_config() SAD level
    else:
        seq = make_textured_sequence(n_frames=n_frames, H=height, W=width,
                                     cam=cam, speed=0.8, px_per_m=24.0,
                                     corridor=(8.0, 3.0))
        max_sad = 1500.0   # real-texture SAD level (textured_config())

    with tempfile.TemporaryDirectory() as tmp:
        _write_scene(seq, tmp)
        cmd = [BIN, tmp, str(n_frames), "718.856", str(width / 2.0),
               str(height / 2.0), "0.5371", "20", str(max_sad)]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        stats = json.loads(out.stdout.strip().splitlines()[-1])
        poses, nvalid = _integrate(os.path.join(tmp, "baseline_deltas.txt"),
                                   n_frames)
    ate = float(ate_rmse(poses, seq.poses))
    return {"scene": scene, "frames": n_frames,
            "fps": round(stats["fps"], 3),
            "seconds": stats["seconds"],
            "valid_frames": nvalid,
            "ate_rmse_m": round(ate, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--scene", choices=("blob", "textured", "both"),
                    default="both")
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "BASELINE_MEASURED.json"))
    args = ap.parse_args()
    if not os.path.exists(BIN):
        print(f"[measure_baseline] {BIN} not built (run native/build.sh)",
              file=sys.stderr)
        return 1

    import platform

    scenes = ["blob", "textured"] if args.scene == "both" else [args.scene]
    results = [measure(s, args.frames) for s in scenes]
    for r in results:
        print(json.dumps(r))
    doc = {
        "what": "reference-algorithm CPU baseline, measured "
                "(native/rso_baseline: OpenCV port of famoreno/stereo-vo "
                "stages 1-5; the reference itself needs MRPT, absent here)",
        "host_cpu": platform.processor() or platform.machine(),
        "nproc": os.cpu_count(),
        "hostname": platform.node(),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    main()
