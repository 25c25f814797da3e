"""Quaternion / rotation / normalization helpers (pure JAX).

Mirrors the math contracts of the reference's quaternion utilities
(/root/reference/easyvolcap/utils/gaussian2d_utils.py:145-222 — wxyz quats,
surfel tangent frames) with a functional JAX API.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v: jnp.ndarray, eps: float = 1e-8, axis: int = -1) -> jnp.ndarray:
    """L2 normalization along `axis`, NaN-free in value AND gradient at v=0
    (jnp.linalg.norm has a 0/0 backward at the origin; the smooth
    sqrt(|v|^2 + eps^2) form does not)."""
    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=axis, keepdims=True) + eps * eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    The quaternion is normalized internally (the raw `_rotation` parameter is
    unnormalized, as in the reference's rotation_activation=F.normalize).
    """
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def surfel_frame(q: jnp.ndarray):
    """(..., 4) wxyz quaternion -> tangent/normal frame of a 2D surfel.

    Returns (t_u, t_v, n): the first two rotation columns span the surfel
    plane; the third is its geometric normal (t_u x t_v).
    """
    R = quat_to_rotmat(q)
    return R[..., :, 0], R[..., :, 1], R[..., :, 2]


def affine_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a (..., 4, 4) rigid/affine transform [[R, t], [0, 1]]."""
    R = m[..., :3, :3]
    t = m[..., :3, 3:]
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -Rinv @ t
    top = jnp.concatenate([Rinv, tinv], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=m.dtype), m.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect direction d about (normalized) normal n: d' = d - 2 (d.n) n.

    Matches the reflected-ray construction of the reference
    (/root/reference/easyvolcap/models/samplers/envgs_sampler.py:420-424).
    """
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n
