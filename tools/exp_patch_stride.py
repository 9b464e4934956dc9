"""Same-claim interleaved A/B: patch-window stride 32 (r3 shipped) vs 56.

The [H, n_win, 64] window stack _extract_rect materializes before its row
take is the dominant byte cost of patch extraction (~12% of the step,
docs/PERF.md round-4 anatomy).  Stride 56 (the maximal exact stride for
8-wide patches) shrinks it 1.7x at KITTI width (n_win 39 -> 23).  This
builds BOTH full-step programs in one process via the trace-time
_WIN_STRIDE_OVERRIDE hook and interleaves slope timings A,B,A,B...
(the only measurement that decides sub-5% step questions — docs/PERF.md
"Measurement honesty").  Also slope-times extraction in ISOLATION for the
byte-model row in the speed-of-light table.

Usage: TPU_RUN_TIMEOUT=2400 PYTHONPATH=/root/repo bash tools/tpu_run.sh \
           tools/exp_patch_stride.py [--json docs/artifacts/patch_stride_r5.json]
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


def build_step(stride):
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
    detect_mod._WIN_STRIDE_OVERRIDE = stride
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

        # pre-compile both lengths while the override is active
        jax.block_until_ready(slope_run(st0, imgs, N1))
        jax.block_until_ready(slope_run(st0, imgs, N2))
    finally:
        detect_mod._WIN_STRIDE_OVERRIDE = None
    return slope_run, st0, imgs


def build_extract(stride):
    """Isolated extraction slope: 6 per-step feature sets at engine K."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    import rso.frontend.detect as detect_mod
    from rso.frontend.detect import extract_patches

    H, W = 376, 1241
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    xy = jnp.asarray(np.stack([rng.uniform(4, W - 5, 512),
                               rng.uniform(4, H - 5, 512)], -1), jnp.float32)
    detect_mod._WIN_STRIDE_OVERRIDE = stride
    try:
        @partial(jax.jit, static_argnames=("n",))
        def run(img, xy, n):
            def body(carry, _):
                acc = carry
                p = extract_patches(img + acc * 1e-30, xy)
                return jnp.sum(p) * 1e-30, None

            return lax.scan(body, jnp.float32(0), None, length=n)[0]

        jax.block_until_ready(run(img, xy, N1))
        jax.block_until_ready(run(img, xy, N2))
    finally:
        detect_mod._WIN_STRIDE_OVERRIDE = None
    return run, img, xy


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

    print("building stride-32 step...", flush=True)
    run32, st32, im32 = build_step(32)
    print("building stride-56 step...", flush=True)
    run56, st56, im56 = build_step(56)
    steps = {"32": [], "56": []}
    for r in range(ROUNDS):
        a = slope_ms(run32, st32, im32)
        b = slope_ms(run56, st56, im56)
        steps["32"].append(a)
        steps["56"].append(b)
        print(f"round {r}: stride32 {a:.4f} ms  stride56 {b:.4f} ms  "
              f"delta {100 * (b - a) / a:+.2f}%", flush=True)
    med32 = float(np.median(steps["32"]))
    med56 = float(np.median(steps["56"]))
    print(f"median step: stride32 {med32:.4f} ms  stride56 {med56:.4f} ms  "
          f"({100 * (med56 - med32) / med32:+.2f}%)", flush=True)

    ex32, i32, x32 = build_extract(32)
    ex56, i56, x56 = build_extract(56)
    e32 = [slope_ms(ex32, i32, x32) for _ in range(3)]
    e56 = [slope_ms(ex56, i56, x56) for _ in range(3)]
    print(f"isolated [512,8,8] extract: stride32 {np.median(e32) * 1e3:.1f} us"
          f"  stride56 {np.median(e56) * 1e3:.1f} us", flush=True)

    out = {"backend": jax.default_backend(),
           "step_ms": steps,
           "step_median_ms": {"32": med32, "56": med56},
           "delta_pct": 100 * (med56 - med32) / med32,
           "extract_us": {"32": [v * 1e3 for v in e32],
                          "56": [v * 1e3 for v in e56]}}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
