"""Optimizable camera residuals: per-view SE(3) extrinsic + intrinsic deltas.

Functional redesign of the reference's OptimizableCamera
(/root/reference/easyvolcap/models/cameras/optimizable_camera.py:153-230):
a per-view se(3) tangent residual applied to R/T via the exponential map,
plus a clipped focal/principal-point residual — held in a small parameter
pytree keyed by view index and applied inside the (jitted) train step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.utils.camera import Camera


class CameraResiduals(NamedTuple):
    se3: jnp.ndarray  # (V, 6) [rotation tangent | translation]
    intr: jnp.ndarray  # (V, 4) [dfx, dfy, dcx, dcy]


def init_camera_residuals(n_views: int) -> CameraResiduals:
    return CameraResiduals(
        se3=jnp.zeros((n_views, 6), jnp.float32),
        intr=jnp.zeros((n_views, 4), jnp.float32),
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """(3,) tangent -> (3, 3) rotation (Rodrigues).

    Gradient-safe at w=0: uses the A=sin(t)/t, B=(1-cos(t))/t^2 form with
    Taylor fallbacks selected by a double-where (a bare where still leaks
    NaN cotangents from the untaken sqrt branch)."""
    t2 = jnp.sum(w * w)
    small = t2 < 1e-12
    t2_safe = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(t2_safe)
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2_safe)
    K = _skew(w)
    return jnp.eye(3) + A * K + B * (K @ K)


def _skew(w):
    return jnp.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ])


def apply_residual(cam: Camera, res: CameraResiduals, view_idx,
                   intr_clip: float = 0.05) -> Camera:
    """Apply the view's residual: R' = exp(w) R, T' = exp(w) T + t,
    K' = K * (1 + clip(d)) on focal, + clip(d)*f on principal point."""
    se3 = res.se3[view_idx]
    dR = so3_exp(se3[:3])
    R = dR @ cam.R
    T = dR @ cam.T + se3[3:]
    d = jnp.clip(res.intr[view_idx], -intr_clip, intr_clip)
    K = cam.K
    K = K.at[0, 0].mul(1.0 + d[0])
    K = K.at[1, 1].mul(1.0 + d[1])
    K = K.at[0, 2].add(d[2] * cam.K[0, 0])
    K = K.at[1, 2].add(d[3] * cam.K[1, 1])
    return cam._replace(K=K, R=R, T=T)
