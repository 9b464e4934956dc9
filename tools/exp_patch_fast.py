"""Patch-extraction formulations, measured at engine shapes.

exp_stage3_decomp.py showed the stage-3 composite's +0.22 ms is NOT the
match kernels (~33 us): patch extraction is DCE'd from the detect-only
composite and lands in the match delta.  The current _extract_rect builds a
[K*8, 64, 8] one-hot select — candidate reformulations measured here:

  A: current extract_patches (one-hot multiply-sum over 64 lanes)
  B: take_along_axis lane gather (dynamic lane select)
  C: one-hot as [K*8,64]@[64x8 one-hot matmul] via segment trick? -> skip
  D: current but with bf16 select weights (half the select bytes; patches
     are u8-valued so bf16 0/1 weights are exact)

Each x6 (2 eyes x 3 octaves) is the real per-step count.

Usage: PYTHONPATH=/root/repo TPU_RUN_TIMEOUT=1200 bash tools/tpu_run.sh tools/exp_patch_fast.py
"""
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from rso.frontend.detect import _extract_rect, extract_patches

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    H, W = 376, 1241
    img = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.float32)
    K = 512
    xy = jnp.asarray(np.stack([rng.uniform(10, W - 10, K),
                               rng.uniform(10, H - 10, K)], -1), jnp.float32)

    def variant_a(img, xy):
        return extract_patches(img, xy)

    def variant_b(img, xy):
        size, offset = 8, 3
        x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - offset, 0,
                      W - size)
        y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - offset, 0,
                      H - size)
        Wp = -(-W // 64) * 64
        imp = jnp.pad(img, ((0, 0), (0, Wp - W)))
        n_win = (Wp - 64) // 32 + 1
        win = jnp.stack([lax.slice(imp, (0, 32 * i), (H, 32 * i + 64))
                         for i in range(n_win)], axis=1)
        wi = jnp.clip(x0 // 32, 0, n_win - 1)
        off = x0 - 32 * wi
        rows = y0[:, None] + jnp.arange(size, dtype=jnp.int32)[None, :]
        ridx = (rows * n_win + wi[:, None]).reshape(-1)
        rowvals = jnp.take(win.reshape(H * n_win, 64), ridx, axis=0)
        lanes = (off[:, None] + jnp.arange(size, dtype=jnp.int32)[None, :])
        lanes = jnp.repeat(lanes, size, axis=0)      # [K*8, 8]
        out = jnp.take_along_axis(rowvals, lanes, axis=1)
        return out.reshape(K, size * size)

    def variant_d(img, xy):
        size, offset = 8, 3
        x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - offset, 0,
                      W - size)
        y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - offset, 0,
                      H - size)
        Wp = -(-W // 64) * 64
        imp = jnp.pad(img, ((0, 0), (0, Wp - W)))
        n_win = (Wp - 64) // 32 + 1
        win = jnp.stack([lax.slice(imp, (0, 32 * i), (H, 32 * i + 64))
                         for i in range(n_win)], axis=1)
        wi = jnp.clip(x0 // 32, 0, n_win - 1)
        off = x0 - 32 * wi
        rows = y0[:, None] + jnp.arange(size, dtype=jnp.int32)[None, :]
        ridx = (rows * n_win + wi[:, None]).reshape(-1)
        rowvals = jnp.take(win.reshape(H * n_win, 64), ridx, axis=0)
        lane = jnp.arange(64, dtype=jnp.int32)
        offb = jnp.repeat(off, size)
        sel = (lane[None, :, None] ==
               (offb[:, None, None]
                + jnp.arange(size, dtype=jnp.int32)[None, None, :]))
        out = jnp.einsum("rl,rls->rs", rowvals.astype(jnp.bfloat16),
                         sel.astype(jnp.bfloat16))
        return out.astype(jnp.float32).reshape(K, size * size)


    def variant_e(img, xy):
        """i16 window stack (x16 scaling is exact for every pyramid value;
        cf. TPUParams.fast_i16): halves the materialized stack+gather bytes,
        converts back to the identical f32 patch after the select."""
        size, offset = 8, 3
        x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - offset, 0,
                      W - size)
        y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - offset, 0,
                      H - size)
        Wp = -(-W // 64) * 64
        imp = jnp.pad(jnp.round(img * 16.0).astype(jnp.int16),
                      ((0, 0), (0, Wp - W)))
        n_win = (Wp - 64) // 32 + 1
        win = jnp.stack([lax.slice(imp, (0, 32 * i), (H, 32 * i + 64))
                         for i in range(n_win)], axis=1)
        wi = jnp.clip(x0 // 32, 0, n_win - 1)
        off = x0 - 32 * wi
        rows = y0[:, None] + jnp.arange(size, dtype=jnp.int32)[None, :]
        ridx = (rows * n_win + wi[:, None]).reshape(-1)
        rowvals = jnp.take(win.reshape(H * n_win, 64), ridx, axis=0)
        lane = jnp.arange(64, dtype=jnp.int32)
        offb = jnp.repeat(off, size)
        sel = (lane[None, :, None] ==
               (offb[:, None, None]
                + jnp.arange(size, dtype=jnp.int32)[None, None, :]))
        out = jnp.sum(rowvals[:, :, None] * sel.astype(jnp.int16), axis=1)
        return (out.astype(jnp.float32) / 16.0).reshape(K, size * size)

    def slope(fn, n1=100, n2=600):
        def run(n):
            def body(c, _):
                acc, = c
                p = fn(img + acc * 1e-30, xy)
                # x6: 2 eyes x 3 octaves worth of extractions
                for _ in range(5):
                    p = p + fn(img + p.sum() * 1e-30, xy)
                return (acc + jnp.sum(p),), None
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

    # correctness first
    a = variant_a(img, xy)
    b = variant_b(img, xy)
    d = variant_d(img, xy)
    e = variant_e(img, xy)
    print("b==a:", bool(jnp.all(a == b)), " d==a:", bool(jnp.all(a == d)),
          " e==a:", bool(jnp.all(a == e)), flush=True)

    print(f"A one-hot f32 (current) x6: {slope(variant_a):7.1f} us",
          flush=True)
    print(f"B take_along_axis x6:       {slope(variant_b):7.1f} us",
          flush=True)
    print(f"D one-hot bf16 x6:          {slope(variant_d):7.1f} us",
          flush=True)
    print(f"E i16 stack x6:             {slope(variant_e):7.1f} us",
          flush=True)


if __name__ == "__main__":
    main()
