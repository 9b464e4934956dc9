"""Subpixel refinement of tracked observations (TPU-build improvement).

Neither the reference's FASTER path nor its windowed SAD tracker is subpixel:
tracked coordinates inherit integer detection quantization, which puts a
~0.3px noise floor under the pose solve.  This module aligns each tracked
current-frame observation against the stored previous-frame 8x8 patch
(template) with a few Gauss-Newton LK iterations — a translation-only,
fixed-iteration inverse-compositional solve, vectorized over all tracked
features.  The measured inter-frame flow precision improves to ~0.05-0.1 px,
which propagates directly into the GN pose and the BA window.

Runs inside the jitted step; needs only the current octave image and the
previous patches already carried in EngineState (no extra state).

TPU formulation: the current-image window is ONE contiguous
lax.dynamic_slice per iteration on an edge-padded image, with the subpixel
bilinear done by static in-patch slicing — the same patch-based rewrite as
rso/frontend/optical_flow.py (the per-sample gather formulation this
replaces belongs to the kernel-fault class documented in
docs/FLOW_SCAN_FAULT.md).  Edge padding + clipping the window CENTER
reproduces the old clamp-to-border sampling for every in-bounds sample.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# The 8x8 SAD window convention: integer offsets x-3..x+4 (computeSAD8 range).
_PAD = 5          # covers offset reach -3..+5 (bilinear high tap) at any clip
_S = 9            # slice size: offsets -3..+5 inclusive


def refine_positions(
    img: jnp.ndarray,          # [H,W] current octave image
    templates: jnp.ndarray,    # [K,64] previous-frame 8x8 patches
    xy: jnp.ndarray,           # [K,2] current positions to refine
    valid: jnp.ndarray,        # [K]
    iters: int = 3,
    max_shift: float = 2.0,
) -> jnp.ndarray:
    """Return refined [K,2] positions (invalid slots pass through)."""
    H, W = img.shape
    img_p = jnp.pad(img, _PAD, mode="edge")

    def one(t, p):
        T = t.reshape(8, 8)
        # template gradients from the template itself (inverse compositional):
        gx = jnp.zeros((8, 8)).at[:, 1:7].set((T[:, 2:] - T[:, :-2]) * 0.5)
        gy = jnp.zeros((8, 8)).at[1:7, :].set((T[2:, :] - T[:-2, :]) * 0.5)
        Gxx = jnp.sum(gx * gx)
        Gxy = jnp.sum(gx * gy)
        Gyy = jnp.sum(gy * gy)
        det = Gxx * Gyy - Gxy * Gxy
        ok = det > 1e-6
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)

        def window(d):
            qx = jnp.clip(p[0] + d[0], 0.0, W - 1.001)
            qy = jnp.clip(p[1] + d[1], 0.0, H - 1.001)
            bx = jnp.floor(qx).astype(jnp.int32)
            by = jnp.floor(qy).astype(jnp.int32)
            fx = qx - bx
            fy = qy - by
            cp = lax.dynamic_slice(
                img_p, (by - 3 + _PAD, bx - 3 + _PAD), (_S, _S))
            return ((1 - fy) * (1 - fx) * cp[:8, :8]
                    + (1 - fy) * fx * cp[:8, 1:9]
                    + fy * (1 - fx) * cp[1:9, :8]
                    + fy * fx * cp[1:9, 1:9])

        def ssd(d):
            return jnp.sum((window(d) - T) ** 2)

        def body(_, d):
            e = window(d) - T
            bx_ = jnp.sum(gx * e)
            by_ = jnp.sum(gy * e)
            ddx = -(Gyy * bx_ - Gxy * by_) * inv
            ddy = -(-Gxy * bx_ + Gxx * by_) * inv
            d = d + jnp.stack([ddx, ddy])
            return jnp.clip(d, -max_shift, max_shift)

        d = lax.fori_loop(0, iters, body, jnp.zeros(2))
        # accept only if alignment measurably improved (weak-gradient patches
        # otherwise inject noise)
        improved = ssd(d) < 0.9 * ssd(jnp.zeros(2))
        return jnp.where(ok & improved, d, jnp.zeros(2))

    delta = jax.vmap(one)(templates, xy)
    return jnp.where(valid[:, None], xy + delta, xy)
