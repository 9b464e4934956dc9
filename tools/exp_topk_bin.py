"""Same-claim interleaved A/B: binned (1x4) top-K vs flat approx_max_k.

Round-5 SoL table (docs/PERF.md): detect is 49% of the step and its
response sweeps are near their formulation floor — the remaining cost is
selection plumbing, led by lax.approx_max_k over the full H*W masked map.
After radius-3 NMS surviving same-row peaks are >= 4 px apart, so a 1x4
row-binned max (argmax-in-bin recovers the exact column) shrinks the
top-K input 4x with an IDENTICAL peak set (CPU-verified exact; equal-value
plateau duplicates are the only divergence and those are duplicates of the
same corner).

Measures: 8-round interleaved full-step slope (bin 1 vs 4) + isolated
2-eye 3-octave detect slope both ways.

Usage: TPU_RUN_TIMEOUT=2400 PYTHONPATH=/root/repo bash tools/tpu_run.sh \
           tools/exp_topk_bin.py [--json docs/artifacts/topk_bin_r5.json]
"""
import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

ROUNDS = 8
N1, N2 = 20, 120


def build_step(bin_w):
    import jax
    import jax.numpy as jnp
    from jax import lax

    import rso.frontend.detect as detect_mod
    from rso.engine import init_state, make_step
    from rso.geometry.stereo_camera import StereoCamera
    from rso.synthetic import make_sequence, synthetic_config

    H, W = 376, 1241
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    seq = make_sequence(n_frames=2, n_points=2000, H=H, W=W, cam=cam,
                        speed=0.8)
    cfg = synthetic_config()
    detect_mod._TOPK_BIN_OVERRIDE = bin_w
    try:
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

        jax.block_until_ready(slope_run(st0, imgs, N1))
        jax.block_until_ready(slope_run(st0, imgs, N2))
    finally:
        detect_mod._TOPK_BIN_OVERRIDE = None
    return slope_run, st0, imgs


def build_detect(bin_w):
    import jax
    import jax.numpy as jnp
    from jax import lax

    import rso.frontend.detect as detect_mod
    from rso.frontend.detect import (detect_features, octave_budget,
                                     octave_k_slots)
    from rso.frontend.pyramid import build_pyramid, to_grayscale
    from rso.synthetic import make_sequence, synthetic_config

    H, W = 376, 1241
    seq = make_sequence(n_frames=2, n_points=2000, H=H, W=W)
    cfg = synthetic_config()
    O = cfg.n_octaves
    Ks = octave_k_slots(cfg.detect.orb_nfeats, O,
                        cfg.tpu.max_kps_per_octave,
                        cfg.tpu.octave_slot_decay)
    il = jax.device_put(jnp.asarray(seq.frames[0][0]))
    ir = jax.device_put(jnp.asarray(seq.frames[0][1]))
    detect_mod._TOPK_BIN_OVERRIDE = bin_w
    try:
        @partial(jax.jit, static_argnames=("n",))
        def run(a, b, n):
            def body(carry, _):
                acc = carry
                out = jnp.float32(0)
                for img in (a, b):
                    pyr = build_pyramid(to_grayscale(img + acc * 1e-30), O)
                    for o in range(O):
                        f = detect_features(pyr[o], cfg.detect, Ks[o],
                                            jnp.int32(20), False,
                                            arc=cfg.tpu.fast_arc)
                        out = out + jnp.sum(f.response) + jnp.sum(f.patch)
                return out * 1e-30, None

            return lax.scan(body, jnp.float32(0), None, length=n)[0]

        jax.block_until_ready(run(il, ir, N1))
        jax.block_until_ready(run(il, ir, N2))
    finally:
        detect_mod._TOPK_BIN_OVERRIDE = None
    return run, il, ir


def slope_ms(fn, *args):
    import jax

    def t(n):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(N2) - t(N1)) / (N2 - N1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import jax

    print("building bin-1 step...", flush=True)
    run1, st1, im1 = build_step(1)
    print("building bin-4 step...", flush=True)
    run4, st4, im4 = build_step(4)
    steps = {"1": [], "4": []}
    for r in range(ROUNDS):
        a = slope_ms(run1, st1, im1)
        b = slope_ms(run4, st4, im4)
        steps["1"].append(a)
        steps["4"].append(b)
        print(f"round {r}: bin1 {a:.4f} ms  bin4 {b:.4f} ms  "
              f"delta {100 * (b - a) / a:+.2f}%", flush=True)
    med1 = float(np.median(steps["1"]))
    med4 = float(np.median(steps["4"]))
    print(f"median step: bin1 {med1:.4f} ms  bin4 {med4:.4f} ms  "
          f"({100 * (med4 - med1) / med1:+.2f}%)", flush=True)

    d1, a1, b1 = build_detect(1)
    d4, a4, b4 = build_detect(4)
    det1 = float(np.median([slope_ms(d1, a1, b1) for _ in range(3)]))
    det4 = float(np.median([slope_ms(d4, a4, b4) for _ in range(3)]))
    print(f"isolated detect (2 eyes, 3 octaves): bin1 {det1 * 1e3:.0f} us  "
          f"bin4 {det4 * 1e3:.0f} us", flush=True)

    out = {"backend": jax.default_backend(), "step_ms": steps,
           "step_median_ms": {"1": med1, "4": med4},
           "delta_pct": 100 * (med4 - med1) / med1,
           "detect_us": {"1": det1 * 1e3, "4": det4 * 1e3}}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
