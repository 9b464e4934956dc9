"""rso-eval: evaluate a trajectory file against ground truth (ATE/RPE)."""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("rso-eval", description=__doc__)
    p.add_argument("estimate", help="estimated trajectory (KITTI or TUM format)")
    p.add_argument("ground_truth", help="ground-truth trajectory")
    p.add_argument("--tum", action="store_true", help="inputs are TUM format")
    p.add_argument("--align-scale", action="store_true", help="Sim(3) alignment")
    p.add_argument("--rpe-delta", type=int, default=1)
    args = p.parse_args(argv)

    from rso.io.trajectory import read_kitti, read_tum
    from rso.metrics.ate import ate_rmse, rpe

    if args.tum:
        _, est = read_tum(args.estimate)
        _, gt = read_tum(args.ground_truth)
    else:
        est = read_kitti(args.estimate)
        gt = read_kitti(args.ground_truth)
    n = min(len(est), len(gt))
    a = ate_rmse(est[:n], gt[:n], with_scale=args.align_scale)
    rt, rr = rpe(est[:n], gt[:n], delta=args.rpe_delta)
    print(f"ATE RMSE: {a:.4f} m")
    print(f"RPE({args.rpe_delta}): {rt:.4f} m / {rr:.4f} deg")
    return 0


if __name__ == "__main__":
    sys.exit(main())
