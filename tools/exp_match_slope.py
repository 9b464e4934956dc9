"""Slope-timed breakdown of the stereo-match internals at K=512.

Every input is carry-perturbed so nothing hoists out of the scan (the flaw
that invalidated exp_octave_batch's numbers).
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.config import RSOConfig
    from rso.frontend.detect import Features
    from rso.frontend.stereo_match import match_left_right, _arbitrate_right
    from rso.kernels.distance import ssd_matrix, sad_topk_refine
    from rso.synthetic import synthetic_config

    cfg = synthetic_config()
    K = 512
    W = 1241
    rng = np.random.default_rng(0)

    def mk(K):
        return Features(
            xy=jnp.asarray(np.stack([rng.uniform(8, W - 8, K),
                                     rng.uniform(8, 368, K)], -1), jnp.float32),
            response=jnp.asarray(rng.uniform(1, 100, K), jnp.float32),
            valid=jnp.ones((K,), bool),
            desc=jnp.zeros((K, 8), jnp.uint32),
            patch=jnp.asarray(rng.uniform(0, 255, (K, 64)), jnp.float32),
        )

    L, R = mk(K), mk(K)
    N1, N2, PASSES = 40, 200, 4

    def slope(name, fn):
        def body(carry, _):
            eps = carry * 1e-30
            l = L._replace(patch=L.patch + eps, xy=L.xy + eps)
            r = R._replace(patch=R.patch + eps, xy=R.xy + eps)
            return fn(l, r), None

        def t(n):
            run = jax.jit(lambda: lax.scan(body, jnp.float32(0.0), None,
                                           length=n)[0])
            run().block_until_ready()
            best = 1e9
            for _ in range(PASSES):
                t0 = time.perf_counter()
                run().block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (t(N2) - t(N1)) / (N2 - N1) * 1e3
        print(f"{name:<40}{dt:9.4f} ms", flush=True)
        return dt

    slope("ssd_matrix bf16 [512,512]",
          lambda l, r: jnp.sum(ssd_matrix(l.patch, r.patch,
                                          precision=lax.Precision.DEFAULT)))

    def masks_only(l, r):
        xl, yl = l.xy[:, 0], l.xy[:, 1]
        xr, yr = r.xy[:, 0], r.xy[:, 1]
        ok = l.valid[:, None] & r.valid[None, :]
        dy = jnp.abs(jnp.round(yl)[:, None] - jnp.round(yr)[None, :])
        ok &= dy <= 1.0
        disp = xl[:, None] - xr[None, :]
        ok &= (disp >= 1.0) & (disp <= W * 0.7)
        return jnp.sum(ok.astype(jnp.float32))

    slope("pair_ok masks [512,512]", masks_only)

    def topk_path(l, r):
        ok = jnp.ones((K, K), bool)
        idx, sad, okk = sad_topk_refine(l.patch, r.patch, ok)
        return jnp.sum(sad)

    slope("sad_topk_refine (ssd+maxk+gather+sad)", topk_path)

    def maxk_only(l, r):
        ssd = ssd_matrix(l.patch, r.patch, precision=lax.Precision.DEFAULT)
        neg, idx = lax.approx_max_k(-ssd, 8, recall_target=1.0)
        return jnp.sum(neg)

    slope("ssd + approx_max_k", maxk_only)

    def gather_sad(l, r):
        idx = (jnp.arange(K, dtype=jnp.int32)[:, None]
               + jnp.arange(8, dtype=jnp.int32)[None, :]) % K
        idx = idx + (l.patch[0, 0] * 0).astype(jnp.int32)
        cand = r.patch[idx]
        return jnp.sum(jnp.abs(l.patch[:, None, :] - cand))

    slope("gather [512,8,64] + exact SAD", gather_sad)

    def arb_only(l, r):
        cand_r = (jnp.arange(K, dtype=jnp.int32)
                  + (l.patch[0, 0] * 0).astype(jnp.int32)) % K
        cand_d = l.response
        return jnp.sum(_arbitrate_right(cand_r, cand_d, l.valid, K,
                                        keep_best=True).astype(jnp.float32))

    slope("_arbitrate_right [512,512]", arb_only)

    slope("match_left_right FULL (mxu)",
          lambda l, r: jnp.sum(match_left_right(
              l, r, cfg.lr_match, W, 0.0, fx_baseline=718.0 * 0.54,
              use_mxu=True).dist))

    if jax.default_backend() != "cpu":
        from rso.kernels.stereo_fused import stereo_sad_fused

        def fused_kernel_only(l, r):
            br, bd, sd = stereo_sad_fused(
                l.patch, r.patch, l.xy, r.xy, l.valid, r.valid,
                max_y_diff=1.0, max_disp=W * 0.7, max_distance=3000.0)
            return jnp.sum(bd) + jnp.sum(sd)

        slope("stereo_sad_fused kernel only", fused_kernel_only)

        slope("match_left_right FULL (fused)",
              lambda l, r: jnp.sum(match_left_right(
                  l, r, cfg.lr_match, W, 0.0, fx_baseline=718.0 * 0.54,
                  use_fused=True).dist))

    print(f"backend: {jax.default_backend()}")


if __name__ == "__main__":
    main()
