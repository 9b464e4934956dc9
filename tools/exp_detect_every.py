"""A/B the amortized-detection mode (TPUParams.detect_every) at bench scale.

detect_every=N runs full detection every Nth frame and LK-propagates the
matched stereo pairs between (rso/engine.py _propagate — the reference's
flow-mode feature-decay semantics as a scheduled perf mode).  Measures, in
one TPU claim:
  * ATE on the blob (120 f) and textured (60 f) scenes, KITTI size,
    3 seeds each, for detect_every in {1, 2, 3}
  * device step time by scan slope for each N (the slope averages the
    detect/propagate frame mix, which is the honest per-frame number)

Usage: TPU_RUN_TIMEOUT=3500 PYTHONPATH=/root/repo bash tools/tpu_run.sh \
           tools/exp_detect_every.py [--json docs/artifacts/detect_every_r5.json]
"""
import argparse
import dataclasses
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def cfg_with(base, n):
    return base.replace(tpu=dataclasses.replace(base.tpu, detect_every=n))


def run_scene(scene, seed, n_every, W, H, N, cam):
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
    eng = Engine(cfg_with(base, n_every), cam)
    L = jnp.stack([jnp.asarray(l) for l, _ in seq.frames])
    R = jnp.stack([jnp.asarray(r) for _, r in seq.frames])
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


def step_slope(n_every, W, H, cam):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.engine import init_state, make_step
    from rso.synthetic import make_sequence, synthetic_config

    cfg = cfg_with(synthetic_config(), n_every)
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
    ap.add_argument("--every", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--scenes", nargs="+", default=["blob", "textured"],
                    choices=["blob", "textured"])
    args = ap.parse_args()

    import jax

    from rso.geometry.stereo_camera import StereoCamera

    W, H = 1241, 376
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    out = {"backend": jax.default_backend(), "scenes": {}, "step_ms": {}}
    for scene, N in (("blob", 120), ("textured", 60)):
        if scene not in args.scenes:
            continue
        rows = {}
        for seed in range(args.seeds):
            for n in args.every:
                a, nv = run_scene(scene, seed, n, W, H, N, cam)
                rows.setdefault(str(n), []).append(
                    {"seed": seed, "ate_m": a, "valid": nv, "frames": N})
                print(f"{scene:<9} seed {seed} every={n} "
                      f"ATE {a:7.4f} m  valid {nv}/{N}", flush=True)
        out["scenes"][scene] = rows
        for n in rows:
            ates = [r["ate_m"] for r in rows[n]]
            print(f"{scene:<9} every={n} mean ATE {np.mean(ates):7.4f} m",
                  flush=True)
    for n in args.every:
        ms = step_slope(n, W, H, cam)
        out["step_ms"][str(n)] = ms
        print(f"step every={n}: {ms:7.4f} ms/frame device (mix average)",
              flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
