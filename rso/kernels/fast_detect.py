"""Fused Pallas detection kernel: FAST corner test + Shi-Tomasi response.

The hot half of stage 2.  The XLA formulation (rso.frontend.detect)
materializes rolled copies of the image plus box-sum passes through HBM;
this kernel reads each image row-band into VMEM ONCE and computes everything
in-register:

  * 16 circle neighbors as static offset slices of the haloed band (free)
  * bright/dark segment test bit-packed into two uint32 planes (the XLA
    path's packing, VMEM-frugal) + run-length doubling (O(log arc) ANDs)
  * central-difference gradients + (2*win+1)^2 box sums of the structure
    tensor as shifted-slice accumulations (no cumsum, no reduce_window)
  * min-eigenvalue response, corner-masked, -inf elsewhere

Output is identical (up to f32 summation order in the box sums) to
`where(fast_corner_mask(img, t, arc), shi_tomasi_response(img, win), -inf)`.

Grid: full-width row bands of TILE_H output rows with a HALO row ring.
Band DMAs are double-buffered: band i+1's HBM->VMEM copy overlaps band i's
compute (v1 of this kernel serialized start();wait() per step, stalling the
VPU on every DMA).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rso.frontend.detect import _FAST_OFFSETS

# 32 output rows per band: the unrolled FAST neighbor pack + structure-tensor
# box sums keep ~20 row-band planes live, and 64-row bands put the Mosaic
# scoped-VMEM stack at 18.1 MB vs its 16 MB limit (measured on v5e); 32-row
# bands halve that with the DMA still double-buffered behind compute.
TILE_H = 32
HALO = 8     # rows of context per band; also the left-edge column zero-pad


def _kernel(img_hbm, th_ref, out_ref, tiles, sems, *,
            arc: int, win: int, n_bands: int, w_out: int):
    i = pl.program_id(0)

    def dma(slot, band):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(band * TILE_H, TILE_H + 2 * HALO), :],
            tiles.at[slot], sems.at[slot])

    slot = lax.rem(i, 2)
    nxt = lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n_bands)
    def _():
        dma(nxt, i + 1).start()

    dma(slot, i).wait()
    tile = tiles[slot]                  # [TILE_H + 2*HALO, W_pad]
    TH, TW = TILE_H, w_out
    t = th_ref[0].astype(tile.dtype)

    def core(dy, dx, h=0):
        """Slice shifted by (dy,dx) relative to the core region, grown by h."""
        return tile[HALO + dy - h: HALO + dy + TH + h,
                    HALO + dx - h: HALO + dx + TW + h]

    c = core(0, 0)

    # ---- FAST segment test (bit-packed: two u32 planes stay live) ----------
    hi = c + t
    lo = c - t
    bright = jnp.zeros(c.shape, jnp.uint32)
    dark = jnp.zeros(c.shape, jnp.uint32)
    for k, (dx, dy) in enumerate(_FAST_OFFSETS):
        n = core(int(dy), int(dx))
        bit = jnp.uint32(1 << k)
        bright = bright | jnp.where(n > hi, bit, jnp.uint32(0))
        dark = dark | jnp.where(n < lo, bit, jnp.uint32(0))

    def rotl16(b, s):
        s = s % 16
        if s == 0:
            return b & jnp.uint32(0xFFFF)
        return ((b << s) | (b >> (16 - s))) & jnp.uint32(0xFFFF)

    def has_arc(b):
        # run-length doubling on the circular 16-bit word (same scheme as
        # frontend.detect.fast_corner_mask)
        runs = {1: b}
        k = 1
        while 2 * k <= arc:
            runs[2 * k] = runs[k] & rotl16(runs[k], k)
            k *= 2
        need = arc
        acc = None
        offset = 0
        for p in sorted(runs, reverse=True):
            while need >= p:
                term = rotl16(runs[p], offset)
                acc = term if acc is None else (acc & term)
                offset += p
                need -= p
        return acc != 0

    corner = has_arc(bright) | has_arc(dark)

    # ---- Shi-Tomasi response ----------------------------------------------
    g = win
    gx = (core(0, 1, g) - core(0, -1, g)) * 0.5
    gy = (core(1, 0, g) - core(-1, 0, g)) * 0.5
    gxx = gx * gx
    gyy = gy * gy
    gxy = gx * gy

    n = float((2 * win + 1) ** 2)

    def box(a):
        acc = None
        for dy in range(2 * win + 1):
            sl = a[dy: dy + TH, :]
            acc = sl if acc is None else acc + sl
        acc2 = None
        for dx in range(2 * win + 1):
            sl = acc[:, dx: dx + TW]
            acc2 = sl if acc2 is None else acc2 + sl
        return acc2 / n

    Gxx = box(gxx)
    Gyy = box(gyy)
    Gxy = box(gxy)
    tr_half = 0.5 * (Gxx + Gyy)
    det_term = jnp.sqrt(jnp.maximum(0.25 * (Gxx - Gyy) ** 2 + Gxy * Gxy, 0.0))
    resp = tr_half - det_term

    out_ref[:] = jnp.where(corner, resp, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("arc", "win", "interpret"))
def corner_response_pallas(img: jnp.ndarray, threshold: jnp.ndarray,
                           arc: int = 12, win: int = 4,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused corner-masked Shi-Tomasi response map [H,W] (f32, -inf = no corner).

    Border semantics match the jnp reference: the outer 3px cannot be corners
    (and the engine's border mask removes a wider margin anyway).
    """
    Hm, Wm = img.shape
    img = img.astype(jnp.float32)
    Hp = int(np.ceil(Hm / TILE_H)) * TILE_H
    n_bands = Hp // TILE_H
    # lane width: output W rounded up to 128 so every col slice keeps a
    # 128-multiple size.  The stored band must ALSO be a 128 multiple —
    # Mosaic requires the manual band DMA's lane dimension aligned to the
    # (8,128) tiling (measured on v5e: w_out + 2*HALO = 1296 fails to
    # compile) — so the x-halo ring lives inside one extra 128-lane block:
    # HALO zeros on the left, the remainder as right zero-pad.
    w_out = int(np.ceil(Wm / 128)) * 128
    w_pad = w_out + 128
    padded = jnp.pad(img, ((HALO, Hp - Hm + HALO),
                           (HALO, w_pad - Wm - HALO)))

    out = pl.pallas_call(
        functools.partial(_kernel, arc=arc, win=win, n_bands=n_bands,
                          w_out=w_out),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # stays in HBM, manual DMA
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_H, w_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, w_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, TILE_H + 2 * HALO, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(padded, jnp.asarray([threshold], jnp.float32))
    out = out[:Hm, :Wm]
    # zero-pad halo means border pixels saw synthetic neighbors: mask the
    # 3px ring like the reference formulation does
    ys = jax.lax.broadcasted_iota(jnp.int32, (Hm, Wm), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (Hm, Wm), 1)
    border = (xs >= 3) & (xs < Wm - 3) & (ys >= 3) & (ys < Hm - 3)
    return jnp.where(border, out, -jnp.inf)


def corner_response_jnp(img: jnp.ndarray, threshold, arc: int = 12,
                        win: int = 4) -> jnp.ndarray:
    """The XLA-composed reference for equivalence tests."""
    from rso.frontend.detect import fast_corner_mask, shi_tomasi_response

    corner = fast_corner_mask(img.astype(jnp.float32),
                              jnp.asarray(threshold), arc=arc)
    resp = shi_tomasi_response(img.astype(jnp.float32), win)
    return jnp.where(corner, resp, -jnp.inf)
