"""Pallas TPU kernels for the two hot pairwise-distance matrices.

The reference's per-pair scalar kernels — compute_SAD8 (stereo_vo
compute_SAD8.cpp:71-97, ~310ns/call scalar, dead SSE4 path at :30-66) and the
Wegner popcount Hamming loop (stage3_match_left_right.cpp:320-332) — become
batched all-pairs distance-matrix kernels: one grid pass computes every
candidate pair for a whole octave, keeping both operand tiles resident in VMEM
and streaming the [K,K] output.

Each kernel ships with a pure-jnp reference (`*_jnp`) used for CPU tests and
as the XLA-fusion fallback; `*_auto` picks Pallas on TPU, jnp elsewhere —
mirroring the reference's scalar-vs-SSE4 dispatch (compute_SAD8.cpp:108-122)
with the fast path actually alive this time.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# jnp references (identical math, XLA-fused)
# ---------------------------------------------------------------------------

def sad_matrix_jnp(patches_a: jnp.ndarray, patches_b: jnp.ndarray) -> jnp.ndarray:
    """[Ka,P] x [Kb,P] f32 -> [Ka,Kb] sum of absolute differences."""
    return jnp.sum(jnp.abs(patches_a[:, None, :] - patches_b[None, :, :]),
                   axis=-1)


def sad_matrix_mxu(patches_a: jnp.ndarray, patches_b: jnp.ndarray) -> jnp.ndarray:
    """SAD-equivalent patch distance computed on the MXU.

    The exact all-pairs SAD is an elementwise [Ka,Kb,P] abs-diff reduction the
    systolic array cannot express; the squared-L2 distance CAN (one matmul:
    ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b) and ranks candidates nearly
    identically.  The result is mapped back to the SAD scale via the Gaussian
    moment relation E[SAD] = P*sigma*sqrt(2/pi), E[SSD] = P*sigma^2 ->
    SAD ~= sqrt(SSD * P * 2/pi), so every downstream threshold
    (sad_max_distance, sad_max_ratio) keeps its calibration.  ~64x fewer
    VPU ops than the abs-diff form at KITTI sizes; equivalence-vs-ranking
    validated in tests/test_kernels.py.
    """
    P = patches_a.shape[1]
    return jnp.sqrt(ssd_matrix(patches_a, patches_b) * (P * 2.0 / jnp.pi))


def ssd_matrix(patches_a: jnp.ndarray, patches_b: jnp.ndarray,
               precision=None) -> jnp.ndarray:
    """All-pairs squared-L2 patch distance via one MXU matmul.

    `precision=lax.Precision.DEFAULT` runs the cross-term at bf16 (one MXU
    pass instead of six) — safe whenever the result only RANKS a shortlist
    that exact SAD re-scores (both frontend call sites), not when the value
    itself is thresholded.
    """
    if precision is None:
        precision = lax.Precision.HIGHEST
    ab = lax.dot_general(patches_a, patches_b, (((1,), (1,)), ((), ())),
                         precision=precision)
    na = jnp.sum(patches_a * patches_a, axis=-1)
    nb = jnp.sum(patches_b * patches_b, axis=-1)
    return jnp.maximum(na[:, None] + nb[None, :] - 2.0 * ab, 0.0)


def sad_topk_refine(patches_a: jnp.ndarray, patches_b: jnp.ndarray,
                    pair_ok: jnp.ndarray, k: int = 8):
    """Coarse-to-fine all-pairs SAD: MXU squared-L2 shortlist + exact SAD.

    The [Ka,Kb] candidate field is ranked by the matmul-based squared-L2
    distance (sad_matrix_mxu rationale) — the O(Ka*Kb*P) work the MXU eats —
    and only the top-k shortlist per left feature is re-scored with the EXACT
    abs-diff SAD (O(Ka*k*P) on the VPU).  Downstream acceptance (thresholds,
    ratio test) therefore keeps exact-SAD semantics; only candidates the
    coarse metric ranks below the top-k are lost (pure-SSD ranking measurably
    degrades matching at KITTI motion scales — 0.75 vs 0.22 ATE on the bench
    scene — while the refined form is ATE-neutral).

    Returns (idx [Ka,k] int32 right indices, sad [Ka,k] f32 exact SADs,
    ok [Ka,k] bool shortlist validity).  pair_ok gates eligibility.
    """
    ssd = jnp.where(pair_ok,
                    ssd_matrix(patches_a, patches_b,
                               precision=lax.Precision.DEFAULT), jnp.inf)
    # approx_max_k at recall_target=1.0 is exact top-k via the TPU
    # PartialReduce custom call — skips the full-row sort lax.top_k emits
    neg, idx = lax.approx_max_k(-ssd, k, recall_target=1.0)  # [Ka,k]
    ok = jnp.isfinite(neg)
    cand = patches_b[idx]                            # [Ka,k,P] gather
    sad = jnp.sum(jnp.abs(patches_a[:, None, :] - cand), axis=-1)
    return idx.astype(jnp.int32), sad, ok


def hamming_matrix_jnp(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """[Ka,W] x [Kb,W] u32 -> [Ka,Kb] f32 Hamming distance."""
    x = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    return jnp.sum(lax.population_count(x), axis=-1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

_TILE_A = 128  # rows of A per grid step (f32 sublane-friendly)


def _sad_kernel(a_ref, b_ref, out_ref):
    # a: [TILE_A, P] f32, b: [Kb, P] f32, out: [TILE_A, Kb]
    a = a_ref[:]
    b = b_ref[:]
    P = a.shape[1]
    acc = jnp.zeros((a.shape[0], b.shape[0]), jnp.float32)
    for d in range(P):  # unrolled VPU adds, operands stay in VMEM
        acc = acc + jnp.abs(a[:, d][:, None] - b[:, d][None, :])
    out_ref[:] = acc


def sad_matrix_pallas(patches_a: jnp.ndarray, patches_b: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    Ka, P = patches_a.shape
    Kb = patches_b.shape[0]
    tile = min(_TILE_A, Ka)
    grid = (pl.cdiv(Ka, tile),)
    return pl.pallas_call(
        _sad_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kb, P), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, Kb), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ka, Kb), jnp.float32),
        interpret=interpret,
    )(patches_a.astype(jnp.float32), patches_b.astype(jnp.float32))


def _hamming_kernel(a_ref, b_ref, out_ref):
    # a: [TILE_A, W] u32, b: [Kb, W] u32, out: [TILE_A, Kb] f32
    a = a_ref[:]
    b = b_ref[:]
    W = a.shape[1]
    acc = jnp.zeros((a.shape[0], b.shape[0]), jnp.int32)
    for w in range(W):
        x = jnp.bitwise_xor(a[:, w][:, None], b[:, w][None, :])
        acc = acc + lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc.astype(jnp.float32)


def hamming_matrix_pallas(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    Ka, W = desc_a.shape
    Kb = desc_b.shape[0]
    tile = min(_TILE_A, Ka)
    grid = (pl.cdiv(Ka, tile),)
    return pl.pallas_call(
        _hamming_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kb, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, Kb), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ka, Kb), jnp.float32),
        interpret=interpret,
    )(desc_a, desc_b)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def sad_matrix_auto(patches_a, patches_b, use_pallas: bool = True,
                    interpret: bool = False, use_mxu: bool = False):
    if use_mxu:
        return sad_matrix_mxu(patches_a, patches_b)
    if use_pallas and (interpret or _on_tpu()):
        return sad_matrix_pallas(patches_a, patches_b, interpret=interpret)
    return sad_matrix_jnp(patches_a, patches_b)


def hamming_matrix_auto(desc_a, desc_b, use_pallas: bool = True,
                        interpret: bool = False):
    if use_pallas and (interpret or _on_tpu()):
        return hamming_matrix_pallas(desc_a, desc_b, interpret=interpret)
    return hamming_matrix_jnp(desc_a, desc_b)
