"""Windowed SAD cost volume: the reference's tracking_SAD as a batched kernel.

tracking_SAD (stereo_vo tracking_SAD.cpp:73-125) exhaustively searches an 8x8
template over a +-wx,+-wy window and returns the best pixel + min SAD; it is
declared+tested but never wired into the reference pipeline (superseded by the
match-set search).  Here it is a first-class batched op — each of K templates
searched over its own window in one fused computation — used by the EuRoC
track-recovery configuration.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class WindowedSearchResult(NamedTuple):
    best_xy: jnp.ndarray   # [K,2] f32 best match center
    best_sad: jnp.ndarray  # [K] f32 min SAD
    valid: jnp.ndarray     # [K] bool


def windowed_sad_search(
    img: jnp.ndarray,          # [H,W] f32 search image
    templates: jnp.ndarray,    # [K,64] f32 8x8 template patches
    centers: jnp.ndarray,      # [K,2] f32 search centers (x,y)
    win_x: int,
    win_y: int,
    valid: jnp.ndarray | None = None,
) -> WindowedSearchResult:
    """Exhaustive min-SAD search of each template over its window.

    Formulated as K x (2wy+1) x (2wx+1) candidate patch SADs via dynamic-slice
    window extraction — all candidates evaluated in parallel on the VPU.
    """
    H, W = img.shape
    K = templates.shape[0]
    if valid is None:
        valid = jnp.ones((K,), bool)

    # window of candidate top-left corners per template
    SX = 2 * win_x + 8
    SY = 2 * win_y + 8
    x0 = jnp.clip(jnp.round(centers[:, 0]).astype(jnp.int32) - 3 - win_x,
                  0, W - SX)
    y0 = jnp.clip(jnp.round(centers[:, 1]).astype(jnp.int32) - 3 - win_y,
                  0, H - SY)

    def one(template, xs, ys):
        region = lax.dynamic_slice(img, (ys, xs), (SY, SX))  # [SY,SX]
        # all 8x8 windows of the region: [2wy+1, 2wx+1, 8, 8]
        patches = jnp.stack([
            jnp.stack([region[dy:dy + 2 * win_y + 1, dx:dx + 2 * win_x + 1]
                       for dx in range(8)], axis=-1)
            for dy in range(8)], axis=-2)
        t = template.reshape(8, 8)
        sad = jnp.sum(jnp.abs(patches - t[None, None]), axis=(-2, -1))
        flat = sad.reshape(-1)
        idx = jnp.argmin(flat)
        dy = idx // (2 * win_x + 1)
        dx = idx % (2 * win_x + 1)
        bx = (xs + dx + 3).astype(jnp.float32)
        by = (ys + dy + 3).astype(jnp.float32)
        return jnp.stack([bx, by]), flat[idx]

    best_xy, best_sad = jax.vmap(one)(templates, x0, y0)
    best_sad = jnp.where(valid, best_sad, jnp.float32(jnp.finfo(jnp.float32).max))
    return WindowedSearchResult(best_xy=best_xy, best_sad=best_sad, valid=valid)
