"""SE(3) pose utilities over the (w1,w2,w3,t1,t2,t3) rotation-vector coords.

The reference represents the optimized increment as a 6-vector and converts via
MRPT's CPose3DRotVec, inverting it at the end of stage 5
(stereo_vo stage5_optimization.cpp:715-718).  Same parametrization here; a pose
is a length-6 jnp array [w, t] meaning  x_new = R(w) @ x + t.
"""
from __future__ import annotations

import jax.numpy as jnp

from rso.geometry.rotations import rodrigues, rotvec_from_matrix


def pose_matrix(pose6: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous matrix of a [w,t] 6-vector."""
    R = rodrigues(pose6[:3])
    T = jnp.eye(4, dtype=pose6.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(pose6[3:])
    return T


def pose_from_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """[w,t] 6-vector from a 4x4 (or 3x4) homogeneous matrix."""
    w = rotvec_from_matrix(T[:3, :3])
    return jnp.concatenate([w, T[:3, 3]])


def pose_inverse(pose6: jnp.ndarray) -> jnp.ndarray:
    """Inverse pose: (w,t)^-1 = (-w, -R(w)^T t)."""
    R = rodrigues(pose6[:3])
    return jnp.concatenate([-pose6[:3], -(R.T @ pose6[3:])])


def pose_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a ∘ b : apply b first, then a (i.e. matrix product T_a @ T_b)."""
    Ra = rodrigues(a[:3])
    Rb = rodrigues(b[:3])
    R = Ra @ Rb
    t = Ra @ b[3:] + a[3:]
    return jnp.concatenate([rotvec_from_matrix(R), t])


def pose_apply(pose6: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Transform [...,3] points by the pose."""
    R = rodrigues(pose6[:3])
    return pts @ R.T + pose6[3:]
