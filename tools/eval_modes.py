"""End-to-end ATE for every reference mode combination on the bench scene.

Detector x stereo-matcher x inter-frame-tracker matrix (reference modes
dmKLT/dmORB/dmFAST_ORB/dmFASTER x smSAD/smDescBF/smDescRbR x
ifmSAD/ifmDescBF/ifmDescWin/ifmOpticalFlow), 60 frames KITTI size, chunked.

Usage: tools/tpu_run.sh tools/eval_modes.py [n_frames]
"""
import dataclasses
import sys

import numpy as np


def main():
    import jax, jax.numpy as jnp
    from rso.config import (DetectMethod, IFMatchMethod, StereoMatchMethod)
    from rso.engine import Engine
    from rso.geometry import pose_matrix
    from rso.metrics.ate import ate_rmse
    from rso.synthetic import make_sequence, synthetic_config
    from rso.geometry.stereo_camera import StereoCamera

    W, H = 1241, 376
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    speed = float(sys.argv[3]) if len(sys.argv) > 3 else 0.8
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    seq = make_sequence(n_frames=N, n_points=max(2000, N * 17), H=H, W=W,
                        cam=cam, speed=speed)
    base = synthetic_config()
    L = jnp.stack([jnp.asarray(l) for l, _ in seq.frames])
    R = jnp.stack([jnp.asarray(r) for _, r in seq.frames])

    # the reference's meaningful combinations (stage3/stage4 cross-support):
    combos = [
        # name, detector, stereo matcher, tracker
        ("FASTER +SAD   +SAD  (default)",
         DetectMethod.FASTER, StereoMatchMethod.SAD, IFMatchMethod.SAD),
        ("FASTER +SAD   +LK   (optical flow)",
         DetectMethod.FASTER, StereoMatchMethod.SAD, IFMatchMethod.OPTICAL_FLOW),
        ("KLT    +SAD   +SAD",
         DetectMethod.KLT, StereoMatchMethod.SAD, IFMatchMethod.SAD),
        ("ORB    +DescBF+DescBF (1 octave)",
         DetectMethod.ORB, StereoMatchMethod.DESC_BF, IFMatchMethod.DESC_BF),
        ("FAST_ORB+DescRbR+DescWin",
         DetectMethod.FAST_ORB, StereoMatchMethod.DESC_RBR, IFMatchMethod.DESC_WIN),
        ("FAST_ORB+DescBF+DescBF",
         DetectMethod.FAST_ORB, StereoMatchMethod.DESC_BF, IFMatchMethod.DESC_BF),
        ("FAST_ORB+SAD  +DescWin",
         DetectMethod.FAST_ORB, StereoMatchMethod.SAD, IFMatchMethod.DESC_WIN),
    ]
    skip = sys.argv[2].split(",") if len(sys.argv) > 2 else []
    for ci, (name, dm, sm, ifm) in enumerate(combos):
        if str(ci) in skip:
            continue
        cfg = base.replace(
            detect=dataclasses.replace(
                base.detect, detect_method=dm,
                minimum_ORB_response=0.0),
            lr_match=dataclasses.replace(base.lr_match, match_method=sm,
                                         orb_max_distance=90.0),
            if_match=dataclasses.replace(base.if_match, ifm_method=ifm,
                                         orb_max_distance=90.0),
        )
        if dm == DetectMethod.ORB:
            cfg = cfg.replace(rectify=dataclasses.replace(cfg.rectify,
                                                          nOctaves=1))
        eng = Engine(cfg, cam)
        try:
            res = eng.process_chunk(L, R)
        except Exception as e:  # keep the matrix running
            print(f"{name:<40} ERROR {type(e).__name__}: {e}", flush=True)
            continue
        rel = np.asarray(res.pose); ok = np.asarray(res.valid)
        T = np.eye(4); est = [T.copy()]; last = None
        for k in range(N):
            if ok[k]:
                last = np.asarray(pose_matrix(rel[k]))
            if last is not None:
                T = T @ last
            est.append(T.copy())
        a = ate_rmse(np.asarray(est[:N]), seq.poses)
        nval = int(ok.sum())
        print(f"{name:<40} ATE {a:7.4f} m   valid {nval}/{N}", flush=True)
    print(f"backend: {jax.default_backend()}")


if __name__ == "__main__":
    main()
