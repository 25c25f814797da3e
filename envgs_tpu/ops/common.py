"""Shared splat math: screen-space transform, AABB, per-pixel evaluation.

The 2D-Gaussian-surfel screen parameterization follows the 2DGS formulation
used by the reference rasterizer (channel/semantics contract reconstructed at
/root/reference/easyvolcap/utils/gaussian2d_utils.py:1050-1061,1117-1144):

- splat-local (u, v) maps to world as  p = c + s_u t_u u + s_v t_v v,
- the 3x3 matrix `tmat` maps (u, v, 1) -> (x_pix*w, y_pix*w, w=z_view),
- a pixel (x, y) intersects the splat plane at q ∝ cross(T0 - x T2, T1 - y T2),
- the Gaussian response uses min(rho_3d, rho_2d) with a sigma^2=0.5 px
  screen-space low-pass (object-space anti-aliasing).

Blending constants (alpha clamp 0.99, 1/255 response floor, 1e-4 transmittance
cutoff, 0.2/100 depth-distortion mapping planes) match the standard 2DGS CUDA
pipeline the reference builds on.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from envgs_tpu.utils.camera import Camera
from envgs_tpu.utils.transforms import quat_to_rotmat

# Blending constants (2DGS conventions)
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_CUTOFF = 1e-4
NEAR_PLANE = 0.2  # center-depth culling + distortion mapping near
FAR_PLANE = 100.0  # distortion mapping far
FILTER_INV_SQUARE = 2.0  # 1 / sigma^2 of the screen-space low-pass
CUTOFF = 3.0  # 3-sigma extent


class PreparedSplats(NamedTuple):
    """Per-splat screen-space data, fixed shapes over the padded pool."""

    tmat: jnp.ndarray  # (P, 3, 3) rows: x_pix*w | y_pix*w | w over (u,v,1)
    center_pix: jnp.ndarray  # (P, 2) projected center (pixel coords)
    depth: jnp.ndarray  # (P,) view-space z of the center
    radius: jnp.ndarray  # (P,) conservative screen radius (float, 0 if culled)
    normal: jnp.ndarray  # (P, 3) view-space normal, flipped toward camera
    color: jnp.ndarray  # (P, C) per-splat blended channels (rgb [+spec+rough])
    opacity: jnp.ndarray  # (P,)
    valid: jnp.ndarray  # (P,) bool


def prepare_splats(
    means3d: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    cam: Camera,
    scale_modifier: float = 1.0,
    active: jnp.ndarray | None = None,
) -> PreparedSplats:
    """Project surfels to screen space (vectorized XLA; no Pallas needed).

    Args:
      means3d: (P, 3) world centers.
      quats: (P, 4) wxyz (unnormalized ok).
      scales: (P, 2) post-activation scales.
      opacities: (P,) post-activation opacities.
      colors: (P, C) per-splat channels.
      active: (P,) bool pool mask (padded-pool support); None = all active.
    """
    P = means3d.shape[0]
    R = quat_to_rotmat(quats)  # (P, 3, 3)
    t_u, t_v, n_w = R[..., :, 0], R[..., :, 1], R[..., :, 2]
    su = scales[:, 0] * scale_modifier
    sv = scales[:, 1] * scale_modifier

    M = cam.pix_from_world  # (3, 4): world homog -> (xw, yw, w)
    A = M[:, :3]  # (3, 3)
    b = M[:, 3]  # (3,)
    # tmat columns over (u, v, 1): [A @ (su t_u), A @ (sv t_v), A @ c + b]
    col_u = (t_u * su[:, None]) @ A.T  # (P, 3)
    col_v = (t_v * sv[:, None]) @ A.T
    col_1 = means3d @ A.T + b
    tmat = jnp.stack([col_u, col_v, col_1], axis=-1)  # (P, 3, 3)

    # Projected center + view depth
    w_c = col_1[:, 2]
    center_pix = col_1[:, :2] / jnp.where(w_c == 0, 1.0, w_c)[:, None]

    # Conservative 3-sigma screen AABB via the projective conic bound
    a_row = tmat[:, 0, :]  # x coefficients over (u, v, 1)
    b_row = tmat[:, 1, :]
    w_row = tmat[:, 2, :]
    tvec = jnp.asarray([CUTOFF * CUTOFF, CUTOFF * CUTOFF, -1.0], jnp.float32)
    d = jnp.sum(tvec * w_row * w_row, axis=-1)
    d_safe = jnp.where(jnp.abs(d) < 1e-12, 1.0, d)
    f = tvec[None, :] / d_safe[:, None]
    cx = jnp.sum(f * a_row * w_row, axis=-1)
    cy = jnp.sum(f * b_row * w_row, axis=-1)
    ext_x = jnp.sqrt(jnp.clip(cx * cx - jnp.sum(f * a_row * a_row, -1), 1e-4, None))
    ext_y = jnp.sqrt(jnp.clip(cy * cy - jnp.sum(f * b_row * b_row, -1), 1e-4, None))
    lowpass_r = CUTOFF * jnp.sqrt(1.0 / FILTER_INV_SQUARE)
    radius = jnp.ceil(jnp.maximum(jnp.maximum(ext_x, ext_y), lowpass_r))

    # Validity: active, in front of the near plane, ellipse-bounded (d < 0)
    valid = (w_c > NEAR_PLANE) & (d < 0)
    if active is not None:
        valid = valid & active
    # Cull splats whose AABB misses the image entirely
    in_img = (
        (cx + ext_x >= 0)
        & (cx - ext_x <= cam.W - 1)
        & (cy + ext_y >= 0)
        & (cy - ext_y <= cam.H - 1)
    )
    valid = valid & in_img
    radius = jnp.where(valid, radius, 0.0)

    # View-space normal flipped toward the camera
    p_view = means3d @ cam.R.T + cam.T[None, :]
    n_view = n_w @ cam.R.T
    flip = jnp.where(jnp.sum(p_view * n_view, -1, keepdims=True) > 0, -1.0, 1.0)
    n_view = n_view * flip

    return PreparedSplats(
        tmat=tmat,
        center_pix=jnp.stack([cx, cy], axis=-1),
        depth=w_c,
        radius=radius,
        normal=n_view,
        color=colors,
        opacity=opacities,
        valid=valid,
    )


def splat_response(tmat, center_pix, px, py):
    """Gaussian response of one splat at pixel(s) (px, py).

    Returns (G, z): the low-pass-filtered Gaussian value and the intersection
    view depth. Shapes broadcast: tmat (..., 3, 3), px/py (...,).
    """
    T0 = tmat[..., 0, :]
    T1 = tmat[..., 1, :]
    T2 = tmat[..., 2, :]
    k = T0 - px[..., None] * T2  # plane x - x0 = 0 in (u,v,1)
    l = T1 - py[..., None] * T2
    q = jnp.cross(k, l)
    qz = jnp.where(jnp.abs(q[..., 2]) < 1e-12, 1e-12, q[..., 2])
    u = q[..., 0] / qz
    v = q[..., 1] / qz
    rho3d = u * u + v * v
    dx = center_pix[..., 0] - px
    dy = center_pix[..., 1] - py
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    rho = jnp.minimum(rho3d, rho2d)
    z = u * T2[..., 0] + v * T2[..., 1] + T2[..., 2]
    # where the low-pass dominates, use the center depth (2DGS semantics);
    # w(0, 0) = T2[..., 2] is exactly the center's view depth
    z = jnp.where(rho2d < rho3d, T2[..., 2], z)
    G = jnp.exp(-0.5 * rho)
    return G, z


def map_depth(z):
    """Depth -> [0, 1] disparity-style mapping for the distortion loss."""
    return (FAR_PLANE * (z - NEAR_PLANE)) / ((FAR_PLANE - NEAR_PLANE) * jnp.clip(z, 1e-6, None))
