#!/usr/bin/env python
"""Driver benchmark: steady-state stereo-VO frames/sec/chip at KITTI image size.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline note: the reference (famoreno/stereo-vo) publishes no end-to-end
numbers (BASELINE.md); the only in-tree figures are compute_SAD8 latencies.
`vs_baseline` is therefore computed against a measured-class estimate of the
C++ pipeline on a desktop CPU: ~20 frames/s at KITTI 1241x376 with default
feature counts (SAD stereo path; consistent with the IJRR'16 real-time claim
of 10 Hz+ with margin).  BASELINE.json's target is >=5x that per chip.
"""
import json
import sys

REFERENCE_FPS_ESTIMATE = 20.0


def main():
    from rso.cli.bench import run_bench

    # 480-frame chunks: the one-dispatch fixed cost (~60 ms through the
    # remote-TPU tunnel) amortizes to ~0.13 ms/frame; per-step device time is
    # unchanged (scan-length slope-validated in tools/bench_slope.py).
    # n_points scales with n_frames: the synthetic blob field anchors points
    # uniformly along the trajectory, so density per metre must stay equal to
    # the original 120-frame scene or the tracker starves.
    out = run_bench(n_frames=480, n_points=8000, width=1241, height=376,
                    repeat_passes=4)
    line = {
        "metric": "vo_frames_per_sec_per_chip_kitti_size",
        "value": round(out["fps"], 3),
        "unit": "frames/s",
        "vs_baseline": round(out["fps"] / REFERENCE_FPS_ESTIMATE, 3),
        "ate_rmse_m": round(out["ate_rmse_m"], 4),
        "ba_iters_per_sec": round(out["ba_iters_per_sec"], 1),
        "backend": out["backend"],
        "device": out["device"],
    }
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
