"""Experiments: TPU-friendlier formulations of the detection hot spots.

Variants (each timed as device-only via in-graph lax.scan, like bench_detect):
  A. fast_corner_mask     — current [16,H,W] stacked run-length formulation
  B. fast_corner_bits     — bit-packed uint32 per pixel; arc test via integer
                            rotate+AND (no [16,H,W] materialization)
  C. extract_patches      — current fused advanced-indexing gather
  D. extract_patches_mxu  — one-hot row/col matmuls on the MXU (bit-exact for
                            u8-valued images: integers <=256 are exact in bf16
                            and one-hot sums select single elements)
  E. extract_patches_rows — row-take then take_along_axis columns
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.frontend.detect import (
        _FAST_OFFSETS, fast_corner_mask, extract_patches, _shift2d,
    )
    from rso.synthetic import make_sequence

    H, W = 376, 1241
    seq = make_sequence(n_frames=1, n_points=2000, H=H, W=W)
    img = jnp.asarray(seq.frames[0][0], jnp.float32)
    K = 512
    N_ITER = 30
    th = jnp.int32(20)

    # --- variant B: bit-packed FAST ------------------------------------
    def fast_corner_bits(im, threshold, arc=12):
        t = threshold.astype(im.dtype)
        hi = im + t
        lo = im - t
        bright = jnp.zeros(im.shape, jnp.uint32)
        dark = jnp.zeros(im.shape, jnp.uint32)
        for i, (dx, dy) in enumerate(_FAST_OFFSETS):
            n = _shift2d(im, int(dx), int(dy))
            bit = jnp.uint32(1 << i)
            bright = bright | jnp.where(n > hi, bit, jnp.uint32(0))
            dark = dark | jnp.where(n < lo, bit, jnp.uint32(0))

        def rotl16(b, s):
            return ((b << s) | (b >> (16 - s))) & jnp.uint32(0xFFFF)

        def has_arc(b):
            r = b & rotl16(b, 1)          # runs >= 2
            r = r & rotl16(r, 2)          # >= 4
            r4 = r
            r = r & rotl16(r, 4)          # >= 8
            if arc == 12:
                r = r & rotl16(r4, 8)     # 8 + 4
            elif arc == 9:
                r = r & rotl16(b, 8)      # 8 + 1
            return r != 0

        corner = has_arc(bright) | has_arc(dark)
        Hh, Ww = im.shape
        ys = lax.broadcasted_iota(jnp.int32, (Hh, Ww), 0)
        xs = lax.broadcasted_iota(jnp.int32, (Hh, Ww), 1)
        border = (xs >= 3) & (xs < Ww - 3) & (ys >= 3) & (ys < Hh - 3)
        return corner & border

    # --- variant D: MXU one-hot patch gather ----------------------------
    dy8, dx8 = np.mgrid[0:8, 0:8]

    def extract_patches_mxu(im, xy):
        Hh, Ww = im.shape
        x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - 3, 0, Ww - 8)
        y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - 3, 0, Hh - 8)
        rows = y0[:, None] + jnp.asarray(dy8[:, 0])[None, :]      # [K,8]
        cols = x0[:, None] + jnp.asarray(dx8[0])[None, :]         # [K,8]
        oh_y = (rows[..., None] ==
                jnp.arange(Hh)[None, None, :]).astype(jnp.bfloat16)
        oh_x = (cols[..., None] ==
                jnp.arange(Ww)[None, None, :]).astype(jnp.bfloat16)
        # [K,8,H] @ [H,W] -> [K,8,W]; then [K,8,W] @ [K,W,8] -> [K,8,8]
        r = jnp.einsum("kah,hw->kaw", oh_y, im.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        p = jnp.einsum("kaw,kbw->kab", r.astype(jnp.bfloat16), oh_x,
                       preferred_element_type=jnp.float32)
        return p.reshape(xy.shape[0], 64)

    def extract_patches_rows(im, xy):
        Hh, Ww = im.shape
        x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - 3, 0, Ww - 8)
        y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - 3, 0, Hh - 8)
        rows = (y0[:, None] + jnp.asarray(dy8[:, 0])[None, :]).reshape(-1)
        r = jnp.take(im, rows, axis=0)                    # [K*8, W]
        cols = (x0[:, None] + jnp.asarray(dx8[0])[None, :])  # [K,8]
        cols = jnp.broadcast_to(cols[:, None, :], (xy.shape[0], 8, 8))
        r = r.reshape(xy.shape[0], 8, Ww)
        return jnp.take_along_axis(r, cols, axis=2).reshape(xy.shape[0], 64)

    # --- correctness ----------------------------------------------------
    rng = np.random.default_rng(0)
    xy = jnp.asarray(
        rng.uniform([8, 8], [W - 9, H - 9], (K, 2)).astype(np.float32))
    ref_c = np.asarray(fast_corner_mask(img, th))
    new_c = np.asarray(fast_corner_bits(img, th))
    print("FAST bit-pack equal:", bool((ref_c == new_c).all()),
          "corners:", int(ref_c.sum()))
    ref_p = np.asarray(extract_patches(img, xy))
    for name, fn in [("mxu", extract_patches_mxu),
                     ("rows", extract_patches_rows)]:
        got = np.asarray(fn(img, xy))
        print(f"patches {name} max|diff|:", float(np.abs(got - ref_p).max()))

    # --- timing ----------------------------------------------------------
    def timed(name, fn):
        def body(carry, _):
            out = fn(img + carry * 1e-9)
            return carry + out, None

        run = jax.jit(lambda: lax.scan(body, jnp.float32(0.0), None,
                                       length=N_ITER)[0])
        run()
        r = run(); r.block_until_ready()
        t0 = time.perf_counter()
        r = run(); r.block_until_ready()
        dt = (time.perf_counter() - t0) / N_ITER * 1e3
        print(f"{name:<44}{dt:9.3f} ms")

    timed("A fast_corner_mask (current)",
          lambda im: fast_corner_mask(im, th).sum().astype(jnp.float32))
    timed("B fast_corner_bits (packed)",
          lambda im: fast_corner_bits(im, th).sum().astype(jnp.float32))
    timed("C extract_patches (current)",
          lambda im: extract_patches(im, xy).sum())
    timed("D extract_patches_mxu",
          lambda im: extract_patches_mxu(im, xy).sum())
    timed("E extract_patches_rows",
          lambda im: extract_patches_rows(im, xy).sum())
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")


if __name__ == "__main__":
    main()
