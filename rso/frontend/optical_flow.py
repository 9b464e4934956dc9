"""Pyramidal Lucas-Kanade optical flow, fully vectorized over keypoints.

TPU-native equivalent of the reference's ifmOpticalFlow tracking branch
(stereo_vo stage4_match_consecutive.cpp:333-431, which calls
cv::calcOpticalFlowPyrLK on the left and right streams).  Classic
coarse-to-fine iterative LK: per level, per keypoint, a 2x2 normal-equation
solve over a fixed window, fixed iteration count (XLA-friendly — no
data-dependent early exit; the convergence test feeds the status flag
instead).

Used by the engine's OPTICAL_FLOW inter-frame mode as a *flow-guided
association*: LK predicts where each previous match lands in the current
frame, and the association picks the nearest current match inside a small
gate around the prediction.  (The reference instead overwrites the current
feature set with the raw tracked points, :402-412, so its feature pool decays
until re-detection; guiding the association keeps the detector in the loop —
same recovery contract, better persistence.)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class FlowResult(NamedTuple):
    pos: jnp.ndarray      # [K,2] tracked positions in the current image
    status: jnp.ndarray   # [K] bool: converged && in-bounds
    err: jnp.ndarray      # [K] mean abs residual at the solution


def _bilinear(img, x, y):
    H, W = img.shape
    xf = jnp.clip(x, 0.0, W - 1.001)
    yf = jnp.clip(y, 0.0, H - 1.001)
    x0 = xf.astype(jnp.int32)
    y0 = yf.astype(jnp.int32)
    fx = xf - x0
    fy = yf - y0
    Ia = img[y0, x0]
    Ib = img[y0, x0 + 1]
    Ic = img[y0 + 1, x0]
    Id = img[y0 + 1, x0 + 1]
    return (Ia * (1 - fx) + Ib * fx) * (1 - fy) + (Ic * (1 - fx) + Id * fx) * fy


def _lk_level(prev_img, cur_img, pts_prev, guess, win: int, iters: int):
    """One pyramid level of iterative LK for all keypoints at once.

    pts_prev: [K,2] keypoint coords at this level; guess: [K,2] initial flow.
    Returns (flow [K,2], residual [K]).
    """
    r = win
    dy, dx = jnp.mgrid[-r: r + 1, -r: r + 1]
    dx = dx.reshape(-1).astype(jnp.float32)
    dy = dy.reshape(-1).astype(jnp.float32)

    def one(pt, g0):
        px = pt[0] + dx
        py = pt[1] + dy
        T = _bilinear(prev_img, px, py)
        # template gradients (standard LK uses prev-image gradients)
        Ix = (_bilinear(prev_img, px + 1, py) - _bilinear(prev_img, px - 1, py)) * 0.5
        Iy = (_bilinear(prev_img, px, py + 1) - _bilinear(prev_img, px, py - 1)) * 0.5
        Gxx = jnp.sum(Ix * Ix)
        Gxy = jnp.sum(Ix * Iy)
        Gyy = jnp.sum(Iy * Iy)
        det = Gxx * Gyy - Gxy * Gxy
        ok = det > 1e-6
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)

        def body(_, g):
            I = _bilinear(cur_img, px + g[0], py + g[1])
            e = I - T
            bx = jnp.sum(Ix * e)
            by = jnp.sum(Iy * e)
            dgx = -(Gyy * bx - Gxy * by) * inv_det
            dgy = -(-Gxy * bx + Gxx * by) * inv_det
            return g + jnp.stack([dgx, dgy])

        g = lax.fori_loop(0, iters, body, g0)
        I = _bilinear(cur_img, px + g[0], py + g[1])
        err = jnp.mean(jnp.abs(I - T))
        return g, err, ok

    flow, err, ok = jax.vmap(one)(pts_prev, guess)
    return flow, err, ok


def lk_track(
    prev_pyr: list,
    cur_pyr: list,
    pts: jnp.ndarray,        # [K,2] keypoint coords at octave 0 (full res)
    valid: jnp.ndarray,      # [K] bool
    win: int = 10,
    iters: int = 10,
    max_err: float = 20.0,
) -> FlowResult:
    """Track pts from prev to cur through the image pyramid (coarse->fine)."""
    L = len(prev_pyr)
    flow = jnp.zeros_like(pts)
    ok_all = jnp.ones(pts.shape[0], bool)
    err = jnp.zeros(pts.shape[0], jnp.float32)
    for lvl in range(L - 1, -1, -1):
        scale = 1.0 / (2 ** lvl)
        pts_l = pts * scale
        flow, err, ok = _lk_level(prev_pyr[lvl], cur_pyr[lvl], pts_l, flow,
                                  win, iters)
        ok_all &= ok
        if lvl > 0:
            flow = flow * 2.0
    new_pos = pts + flow
    H, W = cur_pyr[0].shape
    inb = ((new_pos[:, 0] >= 1) & (new_pos[:, 0] < W - 1)
           & (new_pos[:, 1] >= 1) & (new_pos[:, 1] < H - 1))
    status = valid & ok_all & inb & (err <= max_err)
    return FlowResult(pos=new_pos, status=status, err=err)


def flow_guided_association(
    predicted: jnp.ndarray,   # [K,2] LK-predicted positions of prev matches
    pred_ok: jnp.ndarray,     # [K] bool
    cur_xy: jnp.ndarray,      # [K,2] current left-feature coords
    cur_ok: jnp.ndarray,      # [K] bool current matches validity
    gate: float = 4.0,
):
    """prev-slot -> cur-slot association by nearest current match inside a
    gate around the LK prediction.  Returns (cur_idx [K], valid [K])."""
    d2 = jnp.sum((predicted[:, None, :] - cur_xy[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(pred_ok[:, None] & cur_ok[None, :], d2, jnp.inf)
    best = jnp.argmin(d2, axis=1).astype(jnp.int32)
    bd = jnp.take_along_axis(d2, best[:, None], 1)[:, 0]
    ok = jnp.isfinite(bd) & (bd <= gate * gate)
    return jnp.where(ok, best, -1), ok
