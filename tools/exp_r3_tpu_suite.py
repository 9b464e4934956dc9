"""Round-3 consolidated TPU measurement suite — ONE process, one claim.

Runs every pending measurement in a single interpreter so the TPU claim is
taken once and released cleanly at exit (round-3 incident: killing a python
mid-device_put wedges the remote claim for hours — this script must always
run to completion; budget its timeout at >= 40 min).

Ordering is deliberately risk-sorted: XLA-only measurements first, the new
Pallas kernels LAST and individually try/except'd, so a kernel fault cannot
waste the whole claim window.
"""
import time
import traceback


def _slope_timer(jax, lax, body, n1, n2, passes=4):
    import jax.numpy as jnp

    def t(n):
        run = jax.jit(lambda: lax.scan(body, jnp.float32(0.0), None,
                                       length=n)[0])
        jax.block_until_ready(run())
        best = 1e9
        for _ in range(passes):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n2) - t(n1)) / (n2 - n1) * 1e3


def main():
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.config import RSOConfig
    from rso.engine import Engine, init_state, make_step
    from rso.frontend.detect import Features, detect_features
    from rso.frontend.stereo_match import match_left_right
    from rso.frontend.track import track_interframe
    from rso.geometry.stereo_camera import StereoCamera
    from rso.synthetic import make_sequence, synthetic_config

    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

    H, W = 376, 1241
    cam = StereoCamera.make(fx_l=718.856, fy_l=718.856, cx_l=W / 2.0,
                            cy_l=H / 2.0, baseline=0.5371)
    seq = make_sequence(n_frames=2, n_points=2000, H=H, W=W, cam=cam)
    cfg = synthetic_config()
    img_l = jnp.asarray(seq.frames[0][0])
    img_r = jnp.asarray(seq.frames[0][1])
    img_l2 = jnp.asarray(seq.frames[1][0])
    img_r2 = jnp.asarray(seq.frames[1][1])

    def step_slope(cfg_v, label):
        step = make_step(cfg_v, cam, H, W)
        st0 = init_state(cfg_v, (H, W))
        st0, _ = jax.jit(step)(st0, img_l, img_r)
        st0 = jax.block_until_ready(st0)

        def body(carry, _):
            st, flip = carry
            l = jnp.where(flip, img_l, img_l2)
            r = jnp.where(flip, img_r, img_r2)
            st, res = step(st, l, r)
            return (st, ~flip), None

        def t(n):
            run = jax.jit(lambda: lax.scan(body, (st0, jnp.bool_(True)),
                                           None, length=n)[0])
            jax.block_until_ready(run())
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                jax.block_until_ready(run())
                best = min(best, time.perf_counter() - t0)
            return best

        per = (t(120) - t(20)) / 100 * 1e3
        print(f"full step ({label}): {per:.3f} ms ({1e3 / per:.0f} FPS)",
              flush=True)

    # ---- 1. XLA-only: full-step slope (default engine = r3 eyes-batched) ---
    step_slope(cfg, "default/mxu")

    # ---- 2. XLA-only: detect dense core + stage3/4 mxu ----------------------
    from rso.kernels.fast_detect import corner_response_jnp

    img = jnp.asarray(seq.frames[0][0], jnp.float32)
    th = jnp.int32(20)

    def xla_core(c, _):
        out = corner_response_jnp(img + c * 1e-9, th)
        return c + out.max(), None

    print(f"detect core XLA:    "
          f"{_slope_timer(jax, lax, xla_core, 30, 150):.4f} ms", flush=True)

    rng = np.random.default_rng(0)
    K = 512

    def mk(K):
        return Features(
            xy=jnp.asarray(np.stack([rng.uniform(8, W - 8, K),
                                     rng.uniform(8, 368, K)], -1),
                           jnp.float32),
            response=jnp.asarray(rng.uniform(1, 100, K), jnp.float32),
            valid=jnp.ones((K,), bool),
            desc=jnp.zeros((K, 8), jnp.uint32),
            patch=jnp.asarray(rng.uniform(0, 255, (K, 64)), jnp.float32),
        )

    L, R = mk(K), mk(K)

    def match_var(use_mxu, use_fused):
        def body(c, _):
            eps = c * 1e-30
            l = L._replace(patch=L.patch + eps, xy=L.xy + eps)
            r = R._replace(patch=R.patch + eps, xy=R.xy + eps)
            m = match_left_right(l, r, cfg.lr_match, W, 0.0,
                                 fx_baseline=718.0 * 0.54,
                                 use_mxu=use_mxu, use_fused=use_fused)
            return c + jnp.sum(m.dist), None
        return body

    print(f"stage3 mxu-shortlist: "
          f"{_slope_timer(jax, lax, match_var(True, False), 40, 200):.4f} ms",
          flush=True)

    m0 = match_left_right(L, R, cfg.lr_match, W, 0.0)

    def track_var(use_mxu, use_fused):
        def body(c, _):
            eps = c * 1e-30
            l = L._replace(patch=L.patch + eps, xy=L.xy + eps)
            r = R._replace(patch=R.patch + eps, xy=R.xy + eps)
            trk = track_interframe(l, r, m0, l, r, m0, cfg.if_match,
                                   jax.random.PRNGKey(0),
                                   use_mxu=use_mxu, use_fused=use_fused)
            return c + jnp.sum(trk.cur_idx.astype(jnp.float32)), None
        return body

    print(f"stage4 mxu-shortlist: "
          f"{_slope_timer(jax, lax, track_var(True, False), 40, 200):.4f} ms",
          flush=True)

    # ---- 3. XLA-only: chunk dispatch decomposition ---------------------------
    try:
        print("generating 240-frame scene for chunk decomposition...",
              flush=True)
        seq2 = make_sequence(n_frames=240, n_points=4000, H=H, W=W, cam=cam,
                             speed=0.8)
        eng = Engine(synthetic_config(), seq2.cam)
        lefts = jax.device_put(
            jnp.stack([jnp.asarray(l) for l, _ in seq2.frames]))
        rights = jax.device_put(
            jnp.stack([jnp.asarray(r) for _, r in seq2.frames]))
        jax.block_until_ready(rights)
        print("frames on device", flush=True)
        st_init = jax.device_put(init_state(eng.cfg, (H, W)))
        jax.block_until_ready(st_init.last_pose)

        def timed(n, passes=4):
            ls, rs = lefts[:n], rights[:n]
            eng.state = st_init
            r = eng.process_chunk(ls, rs)
            jax.block_until_ready(r.pose)
            best = 1e9
            for _ in range(passes):
                eng.state = st_init
                t0 = time.perf_counter()
                r = eng.process_chunk(ls, rs)
                jax.block_until_ready(r.pose)
                best = min(best, time.perf_counter() - t0)
            return best

        t60 = timed(60)
        print(f"chunk t(60)={t60 * 1e3:.1f} ms", flush=True)
        t240 = timed(240)
        slope = (t240 - t60) / 180.0
        print(f"chunk t(240)={t240 * 1e3:.1f} ms", flush=True)
        print(f"chunk slope: {slope * 1e3:.3f} ms/frame "
              f"({1.0 / slope:.0f} FPS); "
              f"intercept {1e3 * (t60 - slope * 60):.1f} ms", flush=True)
        del lefts, rights, seq2
    except Exception:
        traceback.print_exc()

    # ---- 4. Pallas kernels, riskiest LAST, each guarded ----------------------
    try:
        from rso.kernels.stereo_fused import stereo_sad_fused

        # device equivalence spot-check vs the dense path
        dense = match_left_right(L, R, cfg.lr_match, W, 0.0, use_mxu=False)
        fused = match_left_right(L, R, cfg.lr_match, W, 0.0, use_fused=True)
        agree = (np.asarray(dense.valid) == np.asarray(fused.valid)).mean()
        print(f"stage3 fused-vs-dense valid agreement: {agree:.6f}",
              flush=True)
        print(f"stage3 fused kernel:  "
              f"{_slope_timer(jax, lax, match_var(False, True), 40, 200):.4f}"
              f" ms", flush=True)
    except Exception:
        traceback.print_exc()

    try:
        print(f"stage4 fused kernel:  "
              f"{_slope_timer(jax, lax, track_var(False, True), 40, 200):.4f}"
              f" ms", flush=True)
    except Exception:
        traceback.print_exc()

    try:
        from rso.kernels.fast_detect import corner_response_pallas

        ref = corner_response_jnp(img, th)
        out = corner_response_pallas(img, th)
        inner = np.s_[5:-5, 5:-5]
        ref_i = np.asarray(ref)[inner]
        out_i = np.asarray(out)[inner]
        same = (np.isneginf(ref_i) == np.isneginf(out_i)).mean()
        print(f"pallas-detect mask agreement: {same:.6f}", flush=True)

        def pallas_core(c, _):
            o = corner_response_pallas(img + c * 1e-9, th)
            return c + o.max(), None

        print(f"detect core Pallas: "
              f"{_slope_timer(jax, lax, pallas_core, 30, 150):.4f} ms",
              flush=True)
    except Exception:
        traceback.print_exc()

    # ---- 5. full-step slope with fused kernels ON ---------------------------
    try:
        cfg_f = dataclasses.replace(
            cfg, tpu=dataclasses.replace(cfg.tpu, use_fused_match=True))
        step_slope(cfg_f, "use_fused_match")
    except Exception:
        traceback.print_exc()

    print("suite done", flush=True)


if __name__ == "__main__":
    main()
