"""Long-sequence BA quality evaluation: pure VO vs window BA variants.

Usage: python tools/eval_ba_quality.py [n_frames] [seed]
Prints ATE RMSE for pure VO, BA without the odometry prior, and BA with it,
over the synthetic corridor sequence (exact ground truth).
"""
import sys

import numpy as np

from rso.ba.pipeline import VOWithBA
from rso.engine import Engine
from rso.geometry import pose_matrix
from rso.metrics.ate import ate_rmse
from rso.synthetic import make_sequence, synthetic_config


def run_vo(cfg, seq):
    eng = Engine(cfg, seq.cam)
    T = np.eye(4)
    poses = [T.copy()]
    for l, r in seq.frames:
        res = eng.process_frame(l, r)
        if bool(res.valid):
            T = T @ np.asarray(pose_matrix(res.pose))
        poses.append(T.copy())
    return np.stack(poses)[: len(seq.poses)]


def run_ba(cfg, seq, **kw):
    vo = VOWithBA(cfg, seq.cam, max_keyframes=8, max_landmarks=768, **kw)
    poses = [np.eye(4)]
    ncorr = 0
    for l, r in seq.frames:
        out = vo.process_frame(l, r)
        if out.ba_cost is not None:
            ncorr += 1
        poses.append(out.pose_wc)
    return np.stack(poses)[: len(seq.poses)], ncorr


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    yaw = float(sys.argv[3]) if len(sys.argv) > 3 else 0.004
    seq = make_sequence(n_frames=n, n_points=max(2000, n * 12), seed=seed,
                        speed=0.5, yaw_rate=yaw)
    cfg = synthetic_config()
    path_len = float(np.sum(np.linalg.norm(
        np.diff(seq.poses[:, :3, 3], axis=0), axis=1)))

    p_vo = run_vo(cfg, seq)
    a_vo = ate_rmse(p_vo, seq.poses)
    print(f"frames={n} path={path_len:.1f}m")
    print(f"VO          ATE={a_vo:.4f} m ({100*a_vo/path_len:.3f}%)")

    variants = [
        ("2view-w0.2", dict()),
        ("2view-w0.05", dict(two_view_weight=0.05)),
        ("marg", dict(marginalize=True)),
    ]
    for name, kw in variants:
        p, nsolve = run_ba(cfg, seq, **kw)
        a = ate_rmse(p, seq.poses)
        print(f"BA {name:16s} ATE={a:.4f} m ({100*a/path_len:.3f}%) "
              f"solves={nsolve}")


if __name__ == "__main__":
    main()
