"""Where does stage 3's ~0.22 ms go?  (kernel cores are only ~0.04 ms)

Scan-slope composites at engine shapes (decayed octave slots 512/256/128),
each adding one layer of the real match_left_right:

  A: the 3 fused pallas kernels alone (per-octave stereo_sad_fused)
  B: + ratio test + z-gate
  C: + _arbitrate_right (the [K,K] one-to-one planes)
  D: the real match_left_right x3 (everything incl. mask building)

Usage: PYTHONPATH=/root/repo TPU_RUN_TIMEOUT=1500 bash tools/tpu_run.sh tools/exp_stage3_decomp.py
"""
import time


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from rso.frontend.detect import Features
    from rso.frontend.stereo_match import _arbitrate_right, match_left_right
    from rso.kernels.stereo_fused import stereo_sad_fused
    from rso.synthetic import synthetic_config

    print("backend:", jax.default_backend(), flush=True)
    cfg = synthetic_config()
    rng = np.random.default_rng(0)
    Ks = (512, 256, 128)
    W = 1241

    feats = []
    for K in Ks:
        def mk(K=K):
            xy = np.stack([rng.uniform(20, W - 20, K),
                           rng.uniform(20, 350, K)], -1).astype(np.float32)
            return Features(
                xy=jnp.asarray(xy),
                response=jnp.asarray(rng.uniform(1, 100, K), jnp.float32),
                valid=jnp.asarray(rng.random(K) > 0.1),
                desc=jnp.zeros((K, 8), jnp.uint32),
                patch=jnp.asarray(rng.integers(0, 255, (K, 64)), jnp.float32))
        feats.append((mk(), mk()))

    p = cfg.lr_match

    def kernels_only(eps):
        out = jnp.float32(0)
        for (fl, fr) in feats:
            br, bd, sd = stereo_sad_fused(
                fl.patch + eps, fr.patch, fl.xy, fr.xy, fl.valid, fr.valid,
                max_y_diff=float(p.max_y_diff), max_disp=W * 0.7,
                max_distance=float(p.sad_max_distance))
            out += jnp.sum(bd) + jnp.sum(br)
        return out

    def plus_ratio(eps):
        out = jnp.float32(0)
        for (fl, fr) in feats:
            K = fl.patch.shape[0]
            br, bd, sd = stereo_sad_fused(
                fl.patch + eps, fr.patch, fl.xy, fr.xy, fl.valid, fr.valid,
                max_y_diff=float(p.max_y_diff), max_disp=W * 0.7,
                max_distance=float(p.sad_max_distance))
            ok = bd < 1e9
            ok &= (sd >= 1e9) | (bd / jnp.maximum(sd, 1e-6)
                                 <= p.sad_max_ratio)
            disp = fl.xy[:, 0] - fr.xy[jnp.clip(br, 0, K - 1), 0]
            ok &= (disp >= 1.0) & (disp <= 300.0)
            out += jnp.sum(jnp.where(ok, bd, 0))
        return out

    def plus_arb(eps):
        out = jnp.float32(0)
        for (fl, fr) in feats:
            K = fl.patch.shape[0]
            br, bd, sd = stereo_sad_fused(
                fl.patch + eps, fr.patch, fl.xy, fr.xy, fl.valid, fr.valid,
                max_y_diff=float(p.max_y_diff), max_disp=W * 0.7,
                max_distance=float(p.sad_max_distance))
            ok = bd < 1e9
            ok &= (sd >= 1e9) | (bd / jnp.maximum(sd, 1e-6)
                                 <= p.sad_max_ratio)
            surv = _arbitrate_right(br, bd, ok, K, keep_best=True)
            out += jnp.sum(jnp.where(surv, bd, 0))
        return out

    def full(eps):
        out = jnp.float32(0)
        for o, (fl, fr) in enumerate(feats):
            fl2 = fl._replace(patch=fl.patch + eps)
            m = match_left_right(fl2, fr, p, W >> o, 0.0,
                                 use_fused=True)
            out += jnp.sum(m.dist)
        return out

    def slope(fn, n1=100, n2=600):
        def run(n):
            def body(c, _):
                acc, = c
                return (acc + fn(acc * 1e-30),), None
            return lax.scan(body, (jnp.float32(0),), None, length=n)[0][0]
        fa = jax.jit(lambda: run(n1))
        fb = jax.jit(lambda: run(n2))
        jax.block_until_ready(fa()); jax.block_until_ready(fb())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(fa())
            ta = time.perf_counter() - t0
            t0 = time.perf_counter(); jax.block_until_ready(fb())
            tb = time.perf_counter() - t0
            best = min(best, (tb - ta) / (n2 - n1))
        return best * 1e6

    a = slope(kernels_only)
    b = slope(plus_ratio)
    c = slope(plus_arb)
    d = slope(full)
    print(f"A kernels only (3 octaves):  {a:7.1f} us", flush=True)
    print(f"B + ratio/z-gate:            {b:7.1f} us  (+{b-a:.1f})",
          flush=True)
    print(f"C + 1-to-1 arbitration:      {c:7.1f} us  (+{c-b:.1f})",
          flush=True)
    print(f"D real match_left_right x3:  {d:7.1f} us  (+{d-c:.1f})",
          flush=True)


if __name__ == "__main__":
    main()
