"""Flow-mode fast-motion envelope after the coarse SAD seed (ADVICE r2 #3).

Sweeps per-frame speed on the textured corridor and reports flow-mode ATE +
valid counts vs the SAD mode at the same speed.  The round-2 one-hot LK
clamped trackable motion to ~_LK_SLACK*2^(L-1) px; the coarse integer SAD
seed (optical_flow._coarse_sad_seed) extends the reach to
~(seed_range + slack)*2^(L-1) px.  CPU-runnable at reduced resolution.

Usage: [env] python tools/exp_flow_speed.py [--frames N] [--width W]
"""
import argparse
import dataclasses
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--width", type=int, default=620)
    ap.add_argument("--height", type=int, default=188)
    ap.add_argument("--speeds", type=str, default="0.4,0.8,1.6,2.4")
    args = ap.parse_args()

    import numpy as np
    import jax

    from rso.config import IFMatchMethod
    from rso.engine import Engine
    from rso.geometry import pose_matrix
    from rso.metrics.ate import ate_rmse
    from rso.synthetic import make_textured_sequence, textured_config

    speeds = [float(s) for s in args.speeds.split(",")]
    for speed in speeds:
        seq = make_textured_sequence(n_frames=args.frames,
                                     H=args.height, W=args.width,
                                     speed=speed, seed=0)
        row = [f"speed {speed:4.1f} m/f"]
        for name, method in (("SAD", IFMatchMethod.SAD),
                             ("FLOW", IFMatchMethod.OPTICAL_FLOW)):
            cfg = textured_config()
            cfg = dataclasses.replace(cfg, if_match=dataclasses.replace(
                cfg.if_match, ifm_method=method))
            eng = Engine(cfg, seq.cam)
            T = np.eye(4)
            poses = [T.copy()]
            n_valid = 0
            last = None
            for (l, r) in seq.frames:
                res = eng.process_frame(l, r)
                if bool(res.valid):
                    n_valid += 1
                    last = np.asarray(pose_matrix(res.pose))
                if last is not None:
                    T = T @ last
                poses.append(T.copy())
            ate = ate_rmse(np.stack(poses), seq.poses)
            row.append(f"{name}: ate={ate:7.3f} m valid={n_valid}/{args.frames}")
        print("   ".join(row), flush=True)


if __name__ == "__main__":
    main()
