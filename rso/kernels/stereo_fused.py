"""Fused stage-3 core: masked all-pairs exact SAD + best/second-best, one kernel.

The stereo-match stage (rso.frontend.stereo_match, reference
stage3_match_left_right.cpp:62-484) is a [K,K] cost matrix with epipolar /
disparity / validity masks followed by per-row best + second-best reduction.
The unfused XLA formulation round-trips a dozen [K,K] planes (and, on the
MXU-shortlist path, a [K,8,64] gather) through HBM; at K=512 every plane is
~1 MB, so the stage is overhead-bound far below the roofline.

This kernel keeps everything in VMEM: the right patch set loads once
([P,K] f32 = 128 KB at K=512, P=64), the exact abs-diff SAD accumulates
over the P unrolled lane slices, the geometric masks are computed in-register
from the coordinate vectors, and only three [K] vectors leave the chip
(best distance, best index, second-best distance).  Exact-SAD semantics: no
squared-L2 shortlist, no recall loss (strictly stronger than
kernels.distance.sad_topk_refine).

The left/row dimension is tiled over the pallas grid (TILE=128 rows per
program): Mosaic stack-allocates the unrolled accumulation's live [rows,K]
temporaries in scoped VMEM, and full-K rows blow its 16 MB scoped limit
(measured 22.6 MB at K=512 on v5e); 128-row tiles keep the whole working
set ~4x under it, and the grid's block pipelining overlaps the next tile's
loads with compute.

Acceptance logic downstream (ratio test, z-gate, 1-to-1 arbitration) stays in
XLA — it is [K]-sized and cheap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9


def _row_tile(k: int) -> int:
    """Largest divisor of k that is <= 128 (the grid row-tile size).

    Full-k tiles are NOT a safe fallback: the unrolled [rows,K] accumulation
    puts 22-44 MB on the Mosaic scoped-VMEM stack at K=512 vs its 16 MB
    limit (docs/artifacts/r3_tpu_suite.txt), so any large K must be split
    even when it is not a 128 multiple."""
    for t in range(min(128, k), 0, -1):
        if k % t == 0:
            return t
    raise AssertionError("unreachable: t=1 always divides k")


def _padded_rows(k: int) -> int:
    """Row count after padding so the grid tile stays wide.

    _row_tile degenerates toward 1-row tiles when k has no divisor near 128
    (e.g. a prime k from an odd user k_max reaching the kernels verbatim via
    octave_k_slots), which would mean a k-program grid of untested Mosaic
    tile shapes.  Pad such k up to the next 128 multiple; the wrappers carry
    ok=False in the padded rows and slice them off the outputs."""
    return k if _row_tile(k) >= 8 else -(-k // 128) * 128


def _kernel(pa_ref, pbt_ref, xl_ref, xr_ref, yl_ref, yr_ref,
            okl_ref, okr_ref, bd_ref, br_ref, sd_ref, *,
            max_y_diff: float, max_disp: float, max_distance: float):
    pa = pa_ref[:]                     # [T, P] this tile's left patches
    pbt = pbt_ref[:]                   # [P, K] all right patches
    T, P = pa.shape
    K = pbt.shape[1]

    acc = jnp.zeros((T, K), jnp.float32)
    for d in range(P):                 # unrolled VPU abs-diff adds, all VMEM
        acc = acc + jnp.abs(pa[:, d][:, None] - pbt[d, :][None, :])

    xl = xl_ref[:]                     # [T, 1]
    yl = yl_ref[:]
    xr = xr_ref[:]                     # [1, K]
    yr = yr_ref[:]
    okl = okl_ref[:] > 0.5
    okr = okr_ref[:] > 0.5

    dy = jnp.abs(jnp.round(yl) - jnp.round(yr))
    disp = xl - xr
    ok = (okl & okr
          & (dy <= max_y_diff)
          & (disp >= 1.0) & (disp <= max_disp)
          & (acc <= max_distance))
    D = jnp.where(ok, acc, _BIG)

    best_d = jnp.min(D, axis=1)                       # [T]
    best_r = jnp.argmin(D, axis=1).astype(jnp.int32)  # [T]
    lanes = lax.broadcasted_iota(jnp.int32, (T, K), 1)
    second = jnp.min(jnp.where(lanes == best_r[:, None], _BIG, D), axis=1)

    bd_ref[:] = best_d[:, None]
    br_ref[:] = best_r[:, None]
    sd_ref[:] = second[:, None]


def _track_kernel(pl_ref, clt_ref, pr_ref, crt_ref,
                  yp_ref, yc_ref, xlp_ref, xlc_ref, xrp_ref, xrc_ref,
                  okp_ref, okc_ref, bd_ref, bc_ref, *,
                  win_row: float, win_col: float, sad_max: float):
    pa_l = pl_ref[:]                   # [T, P] prev-left patches (this tile)
    cbt_l = clt_ref[:]                 # [P, K] cur-left patches, transposed
    pa_r = pr_ref[:]                   # [T, P] prev-right (match-aligned)
    cbt_r = crt_ref[:]                 # [P, K] cur-right (match-aligned)
    T, P = pa_l.shape
    K = cbt_l.shape[1]

    acc_l = jnp.zeros((T, K), jnp.float32)
    acc_r = jnp.zeros((T, K), jnp.float32)
    for d in range(P):
        acc_l = acc_l + jnp.abs(pa_l[:, d][:, None] - cbt_l[d, :][None, :])
        acc_r = acc_r + jnp.abs(pa_r[:, d][:, None] - cbt_r[d, :][None, :])

    dy = jnp.abs(yp_ref[:] - yc_ref[:])
    dxl = jnp.abs(xlp_ref[:] - xlc_ref[:])
    dxr = jnp.abs(xrp_ref[:] - xrc_ref[:])
    ok = ((okp_ref[:] > 0.5) & (okc_ref[:] > 0.5)
          & (dy <= win_row) & (dxl <= win_col) & (dxr <= win_col)
          & (acc_l <= sad_max) & (acc_r <= sad_max))
    D = jnp.where(ok, acc_l + acc_r, _BIG)

    bd_ref[:] = jnp.min(D, axis=1)[:, None]
    bc_ref[:] = jnp.argmin(D, axis=1).astype(jnp.int32)[:, None]


@functools.partial(jax.jit, static_argnames=(
    "win_row", "win_col", "sad_max", "interpret"))
def track_sad_fused(
    p_left_patch: jnp.ndarray,   # [K,P] prev-frame left patches
    c_left_patch: jnp.ndarray,   # [K,P] cur-frame left patches
    p_right_patch: jnp.ndarray,  # [K,P] prev right patches (match-aligned)
    c_right_patch: jnp.ndarray,  # [K,P] cur right patches (match-aligned)
    p_left_xy: jnp.ndarray,      # [K,2]
    c_left_xy: jnp.ndarray,      # [K,2]
    p_right_x: jnp.ndarray,      # [K]
    c_right_x: jnp.ndarray,      # [K]
    ok_p: jnp.ndarray,           # [K] bool prev match validity
    ok_c: jnp.ndarray,           # [K] bool cur match validity
    win_row: float,
    win_col: float,
    sad_max: float,
    interpret: bool = False,
):
    """Fused ifmSAD tracking core (reference stage4:525-636): both-eye exact
    SAD + window masks + per-row best, one VMEM kernel (row-tiled grid).

    Returns (best_c [K] int32, best_d [K] f32); best_d is _BIG where no
    admissible candidate exists.
    """
    K, P = p_left_patch.shape
    Kp = _padded_rows(K)
    if Kp != K:
        pad = Kp - K
        p_left_patch = jnp.pad(p_left_patch, ((0, pad), (0, 0)))
        p_right_patch = jnp.pad(p_right_patch, ((0, pad), (0, 0)))
        p_left_xy = jnp.pad(p_left_xy, ((0, pad), (0, 0)))
        p_right_x = jnp.pad(p_right_x, (0, pad))
        ok_p = jnp.pad(ok_p, (0, pad))  # padded rows: invalid
    T = _row_tile(Kp)
    f32 = jnp.float32

    def row(spec_p):   # [Kp,*] row-sharded operand
        return pl.BlockSpec((T, spec_p), lambda i: (i, 0))

    def full(r, c):    # operand every tile reads whole
        return pl.BlockSpec((r, c), lambda i: (0, 0))

    bd, bc = pl.pallas_call(
        functools.partial(_track_kernel, win_row=float(win_row),
                          win_col=float(win_col), sad_max=float(sad_max)),
        grid=(Kp // T,),
        in_specs=[
            row(P), full(P, K), row(P), full(P, K),
            row(1), full(1, K), row(1), full(1, K), row(1), full(1, K),
            row(1), full(1, K),
        ],
        out_specs=(row(1), row(1)),
        out_shape=(
            jax.ShapeDtypeStruct((Kp, 1), f32),
            jax.ShapeDtypeStruct((Kp, 1), jnp.int32),
        ),
        interpret=interpret,
    )(
        p_left_patch.astype(f32),
        c_left_patch.astype(f32).T,
        p_right_patch.astype(f32),
        c_right_patch.astype(f32).T,
        p_left_xy[:, 1:2].astype(f32),
        c_left_xy[:, 1].astype(f32)[None, :],
        p_left_xy[:, 0:1].astype(f32),
        c_left_xy[:, 0].astype(f32)[None, :],
        p_right_x.astype(f32)[:, None],
        c_right_x.astype(f32)[None, :],
        ok_p.astype(f32)[:, None],
        ok_c.astype(f32)[None, :],
    )
    return bc[:K, 0], bd[:K, 0]


@functools.partial(jax.jit, static_argnames=(
    "max_y_diff", "max_disp", "max_distance", "interpret"))
def stereo_sad_fused(
    patches_l: jnp.ndarray,   # [K,P] f32 left 8x8 patches
    patches_r: jnp.ndarray,   # [K,P] f32 right patches
    xy_l: jnp.ndarray,        # [K,2] f32
    xy_r: jnp.ndarray,        # [K,2] f32
    ok_l: jnp.ndarray,        # [K] bool: valid & response-filtered, left
    ok_r: jnp.ndarray,        # [K] bool: right
    max_y_diff: float,
    max_disp: float,
    max_distance: float,
    interpret: bool = False,
):
    """Returns (best_r [K] int32, best_d [K] f32, second_d [K] f32).

    best_d/second_d are _BIG (1e9) where no admissible pair exists, matching
    the jnp dense path's sentinel.
    """
    K, P = patches_l.shape
    Kp = _padded_rows(K)
    if Kp != K:
        pad = Kp - K
        patches_l = jnp.pad(patches_l, ((0, pad), (0, 0)))
        xy_l = jnp.pad(xy_l, ((0, pad), (0, 0)))
        ok_l = jnp.pad(ok_l, (0, pad))  # padded rows: invalid
    T = _row_tile(Kp)
    f32 = jnp.float32

    def row(spec_p):
        return pl.BlockSpec((T, spec_p), lambda i: (i, 0))

    def full(r, c):
        return pl.BlockSpec((r, c), lambda i: (0, 0))

    out = pl.pallas_call(
        functools.partial(_kernel, max_y_diff=float(max_y_diff),
                          max_disp=float(max_disp),
                          max_distance=float(max_distance)),
        grid=(Kp // T,),
        in_specs=[
            row(P), full(P, K),
            row(1), full(1, K), row(1), full(1, K),
            row(1), full(1, K),
        ],
        out_specs=(row(1), row(1), row(1)),
        out_shape=(
            jax.ShapeDtypeStruct((Kp, 1), f32),
            jax.ShapeDtypeStruct((Kp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Kp, 1), f32),
        ),
        interpret=interpret,
    )(
        patches_l.astype(f32),
        patches_r.astype(f32).T,
        xy_l[:, 0:1].astype(f32),
        xy_r[:, 0].astype(f32)[None, :],
        xy_l[:, 1:2].astype(f32),
        xy_r[:, 1].astype(f32)[None, :],
        ok_l.astype(f32)[:, None],
        ok_r.astype(f32)[None, :],
    )
    bd, br, sd = out
    return br[:K, 0], bd[:K, 0], sd[:K, 0]
