"""Fused Pallas detection kernel: FAST corner test + Shi-Tomasi response.

The hot half of stage 2.  The XLA formulation (rso.frontend.detect)
materializes 16 rolled copies of the image plus integral-image passes through
HBM; this kernel reads each image tile into VMEM ONCE and computes everything
in-register:

  * 16 circle neighbors as static offset slices of the haloed tile (free)
  * bright/dark segment test with run-length doubling (O(log arc) ANDs)
  * central-difference gradients + (2*win+1)^2 box sums of the structure
    tensor as shifted-slice accumulations (no cumsum, no reduce_window)
  * min-eigenvalue response, corner-masked, -inf elsewhere

Output is identical (up to f32 summation order in the box sums) to
`where(fast_corner_mask(img, t, arc), shi_tomasi_response(img, win), -inf)`.

Grid: tiles of (TILE_H, TILE_W) with a HALO ring; each grid step DMAs its
haloed block from the padded input.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rso.frontend.detect import _FAST_OFFSETS

TILE_H = 64
TILE_W = 512
# halos sized for Mosaic alignment: lane (minor) dim slices must be multiples
# of 128, sublane multiples of 8.  The compute halo need is only 8px; the
# wider W halo buys alignment at 1.25x DMA traffic.
HALO_H = 8
HALO_W = 64


def _kernel(img_hbm, th_ref, out_ref, tile_ref, sem, *, arc: int, win: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # DMA the haloed tile from HBM (overlapping reads; BlockSpec blocks are
    # disjoint so halos need a manual copy)
    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * TILE_H, TILE_H + 2 * HALO_H),
                   pl.ds(j * TILE_W, TILE_W + 2 * HALO_W)],
        tile_ref, sem)
    cp.start()
    cp.wait()
    tile = tile_ref[:]                     # [TILE_H+2Hh, TILE_W+2Hw]
    TH, TW = TILE_H, TILE_W
    t = th_ref[0].astype(tile.dtype)

    def core(dy, dx, h=0):
        """Slice shifted by (dy,dx) relative to the core region, grown by h."""
        return tile[HALO_H + dy - h : HALO_H + dy + TH + h,
                    HALO_W + dx - h : HALO_W + dx + TW + h]

    c = core(0, 0)

    # ---- FAST segment test -------------------------------------------------
    bright = []
    dark = []
    hi = c + t
    lo = c - t
    for dx, dy in _FAST_OFFSETS:
        n = core(int(dy), int(dx))
        bright.append(n > hi)
        dark.append(n < lo)

    def has_arc(bits):
        # run-length doubling over the circular 16-list (python-level indexing)
        runs = {1: bits}
        k = 1
        while 2 * k <= arc:
            prev = runs[k]
            runs[2 * k] = [prev[i] & prev[(i + k) % 16] for i in range(16)]
            k *= 2
        need = arc
        acc = None
        offset = 0
        for p in sorted(runs, reverse=True):
            while need >= p:
                term = runs[p]
                if acc is None:
                    acc = [term[(i + offset) % 16] for i in range(16)]
                else:
                    acc = [acc[i] & term[(i + offset) % 16] for i in range(16)]
                offset += p
                need -= p
        out = acc[0]
        for i in range(1, 16):
            out = out | acc[i]
        return out

    corner = has_arc(bright) | has_arc(dark)

    # ---- Shi-Tomasi response ----------------------------------------------
    # gradients on the core grown by `win` so box sums stay in-tile
    g = win
    gx = (core(0, 1, g) - core(0, -1, g)) * 0.5
    gy = (core(1, 0, g) - core(-1, 0, g)) * 0.5
    gxx = gx * gx
    gyy = gy * gy
    gxy = gx * gy

    n = float((2 * win + 1) ** 2)

    def box(a):
        # separable (2win+1)^2 box sum over the grown array -> core size
        acc = None
        for dy in range(2 * win + 1):
            sl = a[dy : dy + TH, :]
            acc = sl if acc is None else acc + sl
        acc2 = None
        for dx in range(2 * win + 1):
            sl = acc[:, dx : dx + TW]
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
    # pad to tile multiples plus the halo ring
    Hp = int(np.ceil(Hm / TILE_H)) * TILE_H
    Wp = int(np.ceil(Wm / TILE_W)) * TILE_W
    padded = jnp.pad(img, ((HALO_H, Hp - Hm + HALO_H),
                           (HALO_W, Wp - Wm + HALO_W)))

    grid = (Hp // TILE_H, Wp // TILE_W)
    out = pl.pallas_call(
        functools.partial(_kernel, arc=arc, win=win),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # stays in HBM, manual DMA
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_H, TILE_W), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2 * HALO_H, TILE_W + 2 * HALO_W),
                       jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
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
