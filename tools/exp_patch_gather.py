"""Experiments: patch-extraction formulations (the #1 profiled step cost).

Profiling (tools -> /tmp/jaxtrace) shows the fused pointwise 2D gather in
extract_patches costs ~10 ns/element on v5e (scalar-unit bound): 333 us for
[512,64] at octave 0, ~1.16 ms/step over all octaves/images.  The rescore
row gather (contiguous 64-wide slices) is fast -> contiguous-slice gathers
vectorize.  Variants:

  A. current pointwise [K,8,8] advanced-indexing gather
  B. flat row-slice: one lax.gather of K*8 slices of 8 contiguous elements
  C. vmapped 2D dynamic_slice (1,8) per patch row
  D. Pallas: image in VMEM, xy scalar-prefetched, fori_loop of (8,8)
     dynamic-slice loads
"""
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.frontend.detect import extract_patches
    from rso.synthetic import make_sequence

    H, W = 376, 1241
    seq = make_sequence(n_frames=1, n_points=2000, H=H, W=W)
    img = jnp.asarray(seq.frames[0][0], jnp.float32)
    K = 512
    N = 30
    rng = np.random.default_rng(0)
    xy = jnp.asarray(
        rng.uniform([8, 8], [W - 9, H - 9], (K, 2)).astype(np.float32))

    # --- B: flat row-slice gather --------------------------------------
    def extract_rowslice(im, xy):
        Hh, Ww = im.shape
        x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - 3, 0, Ww - 8)
        y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - 3, 0, Hh - 8)
        rows = y0[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :]  # [K,8]
        starts = (rows * Ww + x0[:, None]).reshape(-1, 1)             # [K*8,1]
        flat = im.reshape(-1)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,))
        out = lax.gather(flat, starts, dn, slice_sizes=(8,),
                         mode=lax.GatherScatterMode.CLIP)
        return out.reshape(xy.shape[0], 64)

    # --- C: vmapped 2D (1,8) dynamic slices ----------------------------
    def extract_ds2d(im, xy):
        Hh, Ww = im.shape
        x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - 3, 0, Ww - 8)
        y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - 3, 0, Hh - 8)
        rows = (y0[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :]
                ).reshape(-1)
        cols = jnp.repeat(x0, 8)

        def one(r, c):
            return lax.dynamic_slice(im, (r, c), (1, 8))[0]

        out = jax.vmap(one)(rows, cols)
        return out.reshape(xy.shape[0], 64)

    # --- D: Pallas VMEM kernel -----------------------------------------
    def make_pallas(Hh, Ww, K):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Hp = -(-Hh // 8) * 8
        Wp = -(-Ww // 128) * 128

        def kernel(xy_ref, img_ref, out_ref):
            def body(k, _):
                y0 = xy_ref[k, 0]
                x0 = xy_ref[k, 1]
                p = img_ref[pl.ds(y0, 8), pl.ds(x0, 8)]
                out_ref[pl.ds(k * 8, 8), :] = p
                return 0

            lax.fori_loop(0, K, body, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K * 8, 8), jnp.float32),
            grid_spec=grid_spec,
        )

        def run(im, xy):
            x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - 3, 0, Ww - 8)
            y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - 3, 0, Hh - 8)
            yx = jnp.stack([y0, x0], axis=1)                  # [K,2]
            imp = jnp.pad(im, ((0, Hp - Hh), (0, Wp - Ww)))
            out = call(yx, imp)
            return out.reshape(K, 64)

        return run

    impls = [("A current pointwise", extract_patches),
             ("B flat row-slice gather", extract_rowslice),
             ("C vmapped (1,8) dyn-slice", extract_ds2d)]
    try:
        pall = make_pallas(H, W, K)
        _ = jax.jit(pall)(img, xy)
        impls.append(("D pallas vmem loop", pall))
    except Exception as e:  # noqa
        print("pallas variant failed:", type(e).__name__, str(e)[:300])

    ref = np.asarray(extract_patches(img, xy))
    for name, fn in impls[1:]:
        got = np.asarray(jax.jit(fn)(img, xy))
        print(f"{name:<30} max|diff| {float(np.abs(got-ref).max()):.1e}")

    def timed(name, fn):
        def body(carry, _):
            out = fn(img + carry * 1e-9, xy).sum()
            return carry + out, None

        run = jax.jit(lambda: lax.scan(body, jnp.float32(0.0), None,
                                       length=N)[0])
        run()
        jax.block_until_ready(run())
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        print(f"{name:<34}{(time.perf_counter()-t0)/N*1e3:9.3f} ms")

    for name, fn in impls:
        timed(name, fn)
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
