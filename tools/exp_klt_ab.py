"""Interleaved A/B: KLT (dense Shi-Tomasi) vs FASTER (FAST+KLT-rank) detector.

The round-4 mode matrix (docs/MODES.md) shows KLT+SAD+SAD beating the
shipped FASTER+SAD+SAD default on BOTH scenes (0.102/0.111 vs 0.145/0.128)
with equal-or-better validity — but the default was inherited from the
reference's default detector (stage2_detect.cpp:439-454 dmKLT branch vs the
:519-576 FASTER branch), never A/B'd.  This settles it:

  * bench blob scene (1241x376, speed 0.8, bench ATE window), 3 seeds
  * textured corridor (same size/speed), 3 seeds
  * device step time per detector by the scan-length slope method

Usage: TPU_RUN_TIMEOUT=3000 tools/tpu_run.sh tools/exp_klt_ab.py \
           [--json docs/artifacts/klt_ab_r5.json]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def run_scene(scene, seed, dm, W, H, N, cam):
    import jax
    import jax.numpy as jnp

    from rso.engine import Engine
    from rso.geometry import pose_matrix
    from rso.metrics.ate import ate_rmse
    from rso.synthetic import (make_sequence, make_textured_sequence,
                               synthetic_config, textured_config)

    if scene == "blob":
        seq = make_sequence(n_frames=N, n_points=max(2000, N * 17), H=H, W=W,
                            cam=cam, speed=0.8, seed=seed)
        base = synthetic_config()
    else:
        seq = make_textured_sequence(n_frames=N, H=H, W=W, cam=cam, speed=0.8,
                                     px_per_m=24.0, corridor=(8.0, 3.0),
                                     seed=seed)
        base = textured_config()
    cfg = base.replace(detect=dataclasses.replace(base.detect,
                                                  detect_method=dm))
    L = jnp.stack([jnp.asarray(l) for l, _ in seq.frames])
    R = jnp.stack([jnp.asarray(r) for _, r in seq.frames])
    eng = Engine(cfg, cam)
    res = eng.process_chunk(L, R)
    rel = np.asarray(res.pose)
    ok = np.asarray(res.valid)
    T = np.eye(4)
    est = [T.copy()]
    last = None
    for k in range(N):
        if ok[k]:
            last = np.asarray(pose_matrix(rel[k]))
        if last is not None:
            T = T @ last
        est.append(T.copy())
    a = float(ate_rmse(np.stack(est)[: N + 1], seq.poses[: N + 1]))
    return a, int(ok.sum())


def step_slope(dm, W, H, cam):
    """Device ms/step by scan-length slope (tunnel fixed costs cancel)."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.engine import init_state, make_step
    from rso.synthetic import make_sequence, synthetic_config

    base = synthetic_config()
    cfg = base.replace(detect=dataclasses.replace(base.detect,
                                                  detect_method=dm))
    seq = make_sequence(n_frames=2, n_points=600, H=H, W=W, cam=cam,
                        speed=0.8)
    step = make_step(cfg, cam, H, W)
    st0 = jax.device_put(init_state(cfg, (H, W)))
    l0 = jax.device_put(jnp.asarray(seq.frames[0][0]))
    r0 = jax.device_put(jnp.asarray(seq.frames[0][1]))
    l1 = jax.device_put(jnp.asarray(seq.frames[1][0]))
    r1 = jax.device_put(jnp.asarray(seq.frames[1][1]))
    st0, _ = jax.jit(step)(st0, l0, r0)
    st0 = jax.block_until_ready(st0)
    imgs = jnp.stack([l0, r0, l1, r1])

    @partial(jax.jit, static_argnames=("n",))
    def slope_run(st, ims, n):
        def body(carry, _):
            s, flip = carry
            l = jnp.where(flip, ims[0], ims[2])
            r = jnp.where(flip, ims[1], ims[3])
            s, _ = step(s, l, r)
            return (s, ~flip), None

        return lax.scan(body, (st, jnp.bool_(True)), None, length=n)[0]

    def t(n):
        jax.block_until_ready(slope_run(st0, imgs, n))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(slope_run(st0, imgs, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(120) - t(20)) / 100 * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    import jax

    from rso.config import DetectMethod
    from rso.geometry.stereo_camera import StereoCamera

    W, H = 1241, 376
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    dets = [("FASTER", DetectMethod.FASTER), ("KLT", DetectMethod.KLT)]
    out = {"backend": jax.default_backend(), "scenes": {}, "step_ms": {}}
    for scene, N in (("blob", 120), ("textured", 60)):
        rows = {}
        for seed in range(args.seeds):
            # interleaved: same scene instance feeds both arms back to back
            for name, dm in dets:
                a, nv = run_scene(scene, seed, dm, W, H, N, cam)
                rows.setdefault(name, []).append(
                    {"seed": seed, "ate_m": a, "valid": nv, "frames": N})
                print(f"{scene:<9} seed {seed} {name:<7} "
                      f"ATE {a:7.4f} m  valid {nv}/{N}", flush=True)
        out["scenes"][scene] = rows
        for name in rows:
            ates = [r["ate_m"] for r in rows[name]]
            print(f"{scene:<9} {name:<7} mean ATE {np.mean(ates):7.4f} m",
                  flush=True)
    for name, dm in dets:
        ms = step_slope(dm, W, H, cam)
        out["step_ms"][name] = ms
        print(f"step {name:<7} {ms:7.4f} ms/frame device", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
