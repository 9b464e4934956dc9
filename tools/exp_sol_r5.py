"""Whole-step speed-of-light measurement: per-stage slopes + byte model.

Measures, in ONE TPU claim (scan-length slopes, alternating real frames,
carry-perturbed inputs, reduced outputs — docs/PERF.md "Measurement
discipline"), the cumulative composites pyramid / +detect(+patches) /
+stereo-match / +track / full-step under the bench configuration, plus
isolated RANSAC and the pose-GN tail, plus the engine's actual GN
iteration counts on the bench scene.  Unlike the round-4 composites
(static frames, patches DCE'd in the detect-only composite), these
composites CONSUME patches and responses so extraction is attributed to
stage 2 where it runs, and frames alternate so the GN tail converges
realistically.

Emits the speed-of-light table for docs/PERF.md: per stage, measured us vs
two modeled floors — "must-move" (bytes the stage's inputs/outputs force
through HBM at the v5e ~819 GB/s peak) and "formulation" (bytes the
current pass structure materializes) — with utilization against each.

Usage: TPU_RUN_TIMEOUT=3000 PYTHONPATH=/root/repo bash tools/tpu_run.sh \
           tools/exp_sol_r5.py [--json docs/artifacts/sol_r5.json]
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

HBM_GBPS = 819.0   # TPU v5e peak HBM bandwidth
N1, N2 = 20, 120


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.engine import Engine, init_state, make_step
    from rso.frontend.detect import (detect_features, octave_budget,
                                     octave_k_slots)
    from rso.frontend.pyramid import build_pyramid, to_grayscale
    from rso.frontend.stereo_match import match_left_right
    from rso.frontend.track import track_interframe
    from rso.geometry.stereo_camera import StereoCamera
    from rso.solver import ransac_fundamental
    from rso.synthetic import make_sequence, synthetic_config

    H, W = 376, 1241
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    seq = make_sequence(n_frames=2, n_points=2000, H=H, W=W, cam=cam,
                        speed=0.8)
    cfg = synthetic_config()
    O = cfg.n_octaves
    K = cfg.tpu.max_kps_per_octave
    Ks = octave_k_slots(cfg.detect.orb_nfeats, O, K,
                        cfg.tpu.octave_slot_decay)
    budgets = octave_budget(cfg.detect.orb_nfeats, O)
    imgs = jnp.stack([jnp.asarray(seq.frames[0][0]),
                      jnp.asarray(seq.frames[0][1]),
                      jnp.asarray(seq.frames[1][0]),
                      jnp.asarray(seq.frames[1][1])])
    imgs = jax.device_put(imgs)

    def detect_all(img, th):
        pyr = build_pyramid(to_grayscale(img), O)
        feats = []
        for o in range(O):
            f = detect_features(pyr[o], cfg.detect, Ks[o], th, False,
                                arc=cfg.tpu.fast_arc,
                                use_pallas_detect=cfg.tpu.use_pallas_detect,
                                interpret_pallas=cfg.tpu.interpret_pallas)
            slot_ok = jnp.arange(Ks[o]) < budgets[o]
            feats.append(f._replace(valid=f.valid & slot_ok))
        return feats

    def alt(ims, flip):
        l = jnp.where(flip, ims[0], ims[2])
        r = jnp.where(flip, ims[1], ims[3])
        return l, r

    # ---- composites (each consumes every stage output it runs) ----------
    def comp_pyr(ims, flip, acc):
        l, r = alt(ims, flip)
        out = jnp.float32(0)
        for img in (l, r):
            pyr = build_pyramid(to_grayscale(img + acc * 1e-30), O)
            out = out + sum(jnp.sum(p) for p in pyr)
        return out * 1e-30

    def comp_s12(ims, flip, acc):
        l, r = alt(ims, flip)
        out = jnp.float32(0)
        for img in (l, r):
            for f in detect_all(img + acc * 1e-30, jnp.int32(20)):
                out = out + jnp.sum(f.response) + jnp.sum(f.patch)
        return out * 1e-30

    def make_comp_s123(with_track):
        ifm = dataclasses.replace(cfg.if_match, filter_fund_matrix=False)

        def f(ims, flip, acc, prev):
            l, r = alt(ims, flip)
            fls = detect_all(l + acc * 1e-30, jnp.int32(20))
            frs = detect_all(r + acc * 1e-30, jnp.int32(20))
            out = jnp.float32(0)
            cur = []
            for o in range(O):
                m = match_left_right(
                    fls[o], frs[o], cfg.lr_match, W >> o, 0.0,
                    fx_baseline=float(cam.fx_l) * float(cam.baseline) / 2**o,
                    use_mxu=cfg.tpu.use_mxu_distance,
                    use_fused=cfg.tpu.use_fused_match)
                out = out + jnp.sum(m.dist)
                cur.append((fls[o], frs[o], m))
                if with_track:
                    pfl, pfr, pm = prev[o]
                    trk = track_interframe(
                        pfl, pfr, pm, fls[o], frs[o], m, ifm,
                        jax.random.PRNGKey(0),
                        use_mxu=cfg.tpu.use_mxu_distance,
                        use_fused=cfg.tpu.use_fused_match)
                    out = out + trk.n_tracked.astype(jnp.float32)
            return out * 1e-30, cur

        return f

    # warm prev-features for the track composite
    feats0 = jax.jit(lambda im: detect_all(im, jnp.int32(20)))(imgs[0])
    feats0r = jax.jit(lambda im: detect_all(im, jnp.int32(20)))(imgs[1])
    m0 = []
    for o in range(O):
        m0.append(jax.jit(partial(
            match_left_right, params=cfg.lr_match, img_w=W >> o,
            min_response=0.0,
            fx_baseline=float(cam.fx_l) * float(cam.baseline) / 2**o,
            use_mxu=cfg.tpu.use_mxu_distance,
            use_fused=cfg.tpu.use_fused_match))(feats0[o], feats0r[o]))
    prev0 = [(feats0[o], feats0r[o], m0[o]) for o in range(O)]
    prev0 = jax.device_put(prev0)

    s123 = make_comp_s123(False)
    s1234 = make_comp_s123(True)

    def scan_of(fn, needs_prev):
        @partial(jax.jit, static_argnames=("n",))
        def run(ims, prev, n):
            def body(carry, _):
                acc, flip = carry
                if needs_prev:
                    out, _ = fn(ims, flip, acc, prev)
                else:
                    out = fn(ims, flip, acc)
                return (out, ~flip), None

            return lax.scan(body, (jnp.float32(0), jnp.bool_(True)), None,
                            length=n)[0]

        return run

    run_pyr = scan_of(comp_pyr, False)
    run_s12 = scan_of(comp_s12, False)
    run_s123 = scan_of(s123, True)
    run_s1234 = scan_of(s1234, True)

    # full step
    step = make_step(cfg, cam, H, W)
    st0 = jax.device_put(init_state(cfg, (H, W)))
    st0, _ = jax.jit(step)(st0, imgs[0], imgs[1])
    st0 = jax.block_until_ready(st0)

    @partial(jax.jit, static_argnames=("n",))
    def run_full(st, ims, n):
        def body(carry, _):
            s, flip = carry
            l, r = alt(ims, flip)
            s, _ = step(s, l, r)
            return (s, ~flip), None

        return lax.scan(body, (st, jnp.bool_(True)), None, length=n)[0]

    # isolated RANSAC at engine shapes ([T] tracked pairs)
    T = K
    rngk = jax.random.PRNGKey(0)
    p_prev = jax.random.uniform(rngk, (T, 2)) * jnp.asarray([W, H])
    p_cur = p_prev + jax.random.normal(jax.random.PRNGKey(1), (T, 2)) * 2.0
    mask0 = jnp.ones(T, bool)

    @partial(jax.jit, static_argnames=("n",))
    def run_ransac(pp, pc, n):
        def body(carry, _):
            acc = carry
            res = ransac_fundamental(pp + acc * 1e-30, pc, mask0,
                                     jax.random.PRNGKey(2),
                                     n_iters=cfg.tpu.ransac_iters,
                                     threshold=cfg.tpu.ransac_threshold)
            return (jnp.sum(res.inliers.astype(jnp.float32))
                    + jnp.sum(res.F)) * 1e-30, None

        return lax.scan(body, jnp.float32(0), None, length=n)[0]

    def slope_ms(fn, *args):
        def t(n):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(*args, n))
                best = min(best, time.perf_counter() - t0)
            return best

        # warm both lengths
        jax.block_until_ready(fn(*args, N1))
        jax.block_until_ready(fn(*args, N2))
        return (t(N2) - t(N1)) / (N2 - N1) * 1e3

    rows = {}
    print("timing composites...", flush=True)
    rows["pyramid"] = slope_ms(run_pyr, imgs, None)
    print(f"pyramid            {rows['pyramid']:.4f} ms", flush=True)
    rows["s12"] = slope_ms(run_s12, imgs, None)
    print(f"+detect(+patches)  {rows['s12']:.4f} ms", flush=True)
    rows["s123"] = slope_ms(run_s123, imgs, prev0)
    print(f"+stereo match      {rows['s123']:.4f} ms", flush=True)
    rows["s1234"] = slope_ms(run_s1234, imgs, prev0)
    print(f"+track             {rows['s1234']:.4f} ms", flush=True)
    rows["full"] = slope_ms(run_full, st0, imgs)
    print(f"full step          {rows['full']:.4f} ms", flush=True)
    rows["ransac_iso"] = slope_ms(run_ransac, p_prev, p_cur)
    print(f"ransac isolated    {rows['ransac_iso']:.4f} ms", flush=True)

    # engine GN iteration counts on the bench scene
    seq2 = make_sequence(n_frames=30, n_points=2000, H=H, W=W, cam=cam,
                         speed=0.8)
    eng = Engine(cfg, cam)
    L = jnp.stack([jnp.asarray(l) for l, _ in seq2.frames])
    R = jnp.stack([jnp.asarray(r) for _, r in seq2.frames])
    res = eng.process_chunk(L, R)
    it1 = np.asarray(res.num_it)[1:]
    it2 = np.asarray(res.num_it_final)[1:]
    rows["gn_iters_phase1_mean"] = float(it1.mean())
    rows["gn_iters_phase2_mean"] = float(it2.mean())
    print(f"GN iters/frame: phase1 {it1.mean():.1f} phase2 {it2.mean():.1f}",
          flush=True)

    # ---- byte model ------------------------------------------------------
    a0 = H * W * 4.0                      # octave-0 f32 image bytes
    areas = [a0 / 4**o for o in range(O)]
    us = lambda b: b / HBM_GBPS / 1e3     # bytes -> microseconds

    # pyramid: must-move = u8 read + f32 L0 write + per-level read+write
    pyr_must = 2 * (a0 / 4 + a0 + sum(areas[o - 1] + areas[o]
                                      for o in range(1, O)))
    # detect: must-move = read each octave image once + tiny [K] outputs
    det_must = 2 * sum(areas)
    # detect formulation: committed round-4 model = ~15 image sweeps per
    # octave pass (FAST neighbors + grad products + separable box sums +
    # response + NMS + top-K), docs/PERF.md detect row
    det_form = 2 * 15 * sum(areas)
    # patches: formulation = win stack write (64/stride x area) + img read
    # + row take out/in + [K,64] out, per eye per octave
    stride = 56.0
    patch_form = 0.0
    patch_must = 0.0
    for o in range(O):
        win = areas[o] * (64.0 / stride)
        take = Ks[o] * 8 * 64 * 4.0
        patch_form += 2 * (areas[o] + win + 2 * take + Ks[o] * 64 * 4.0)
        patch_must += 2 * (Ks[o] * 64 * 4.0 + areas[o])
    model = {
        "pyramid_must_us": us(pyr_must),
        "detect_must_us": us(det_must),
        "detect_formulation_us": us(det_form),
        "patch_must_us": us(patch_must),
        "patch_formulation_us": us(patch_form),
        "hbm_gbps": HBM_GBPS,
    }
    for k, v in model.items():
        print(f"{k}: {v:.2f}", flush=True)

    out = {"backend": jax.default_backend(), "measured_ms": rows,
           "model": model, "k_slots": Ks,
           "note": "composites consume patches+responses (no DCE); "
                   "alternating frames so the GN tail is realistic"}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
