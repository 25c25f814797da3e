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
import numpy as np

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
# iso-level for per-row pair culling: at rho > 2 ln(255) the response is
# below the 1/255 alpha floor for ANY opacity <= 1, so culling at this level
# (vs the 3-sigma rho=9 AABB) cannot drop a contributing pixel. Small pad
# absorbs f32 boundary noise.
ROWCULL_LEVEL = 11.15  # 2*ln(255) = 11.083 plus margin
ROWCULL_PAD = 1.0  # extra pixels on each row-interval end (f32 safety)
# low-pass circle radius at the cull level: FILTER_INV_SQUARE * r^2 <= LEVEL
ROWCULL_LOWPASS_R = float(np.sqrt(ROWCULL_LEVEL / FILTER_INV_SQUARE))


def rowcull_params(ccx, ccy, An, Bn, Cn, r0n):
    """Normalize the footprint quadratic {An dx^2 + 2 Bn dx dy + Cn dy^2
    <= r0n} around center (ccx, ccy) into per-row interval params
    [ccx, ccy, sa, p1, p2, dy_t].

    x-interval at row offset dy: ccx - sa*dy -+ sqrt(p1*dy^2 + p2);
    valid rows satisfy p1*dy^2 + p2 >= 0 (p1 < 0 for an ellipse); the
    interval's right edge is maximized at dy = dy_t (concavity).
    """
    An_safe = jnp.where(jnp.abs(An) < 1e-12, 1e-12, An)
    sa = Bn / An_safe
    p1 = (Bn * Bn - An * Cn) / (An_safe * An_safe)
    p2 = r0n / An_safe
    p1_safe = jnp.where(jnp.abs(p1) < 1e-12, -1e-12, p1)
    denom = p1_safe * (p1_safe - sa * sa)
    dy_t2 = sa * sa * p2 / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    dy_t = -jnp.sign(sa) * jnp.sqrt(jnp.clip(dy_t2, 0.0, None))
    return jnp.stack([ccx, ccy, sa, p1, p2, dy_t], axis=-1)


def snug_row_interval(center_pix, rowcull, yb0, yb1, lowpass_r=0.0):
    """Conservative x-interval of the footprint over the pixel-row band
    [yb0, yb1] (integer pixel-center coords), as (x_lo, x_hi) floats.

    Union of the level-set ellipse (rowcull params, centered on the level
    set's own center) and, when lowpass_r > 0, the screen-space low-pass
    circle of that radius centered on the projected splat center.
    Broadcasts over any leading shape shared by center_pix[..., 2] /
    rowcull[..., 6] / yb0 / yb1.
    """
    cx = rowcull[..., 0]
    cy = rowcull[..., 1]
    sa = rowcull[..., 2]
    p1 = rowcull[..., 3]
    p2 = rowcull[..., 4]
    dy_t = rowcull[..., 5]
    dy0 = yb0 - cy
    dy1 = yb1 - cy
    ey2 = -p2 / jnp.where(jnp.abs(p1) < 1e-12, -1e-12, p1)
    ey = jnp.sqrt(jnp.clip(ey2, 0.0, None))
    d0 = jnp.clip(dy0, -ey, ey)
    d1 = jnp.clip(dy1, -ey, ey)

    def right(dy):
        return -sa * dy + jnp.sqrt(jnp.clip(p1 * dy * dy + p2, 0.0, None))

    r = jnp.maximum(right(d0), right(d1))
    r = jnp.where((dy_t >= dy0) & (dy_t <= dy1), right(dy_t), r)
    # left edge mirrors: left(dy) = -right_{-sa}(dy); critical at -dy_t
    l = jnp.minimum(-right(-d0), -right(-d1))
    l = jnp.where((-dy_t >= dy0) & (-dy_t <= dy1), -right(dy_t), l)
    hits_e = (dy1 >= -ey) & (dy0 <= ey) & (p2 > 0)
    big = jnp.asarray(1e9, jnp.float32)
    x_lo = jnp.where(hits_e, cx + l, big)
    x_hi = jnp.where(hits_e, cx + r, -big)
    # unreliable conic normalization (degenerate / hyperbolic level set):
    # fall back to the full row — culling must stay conservative
    unreliable = (p2 <= 0) | (p1 >= 0)
    x_lo = jnp.where(unreliable, -big, x_lo)
    x_hi = jnp.where(unreliable, big, x_hi)

    if lowpass_r:
        # low-pass circle around the PROJECTED center (rho2d's center)
        ox = center_pix[..., 0]
        oy = center_pix[..., 1]
        cdy0 = yb0 - oy
        cdy1 = yb1 - oy
        dmin = jnp.maximum(cdy0, jnp.minimum(cdy1, 0.0))  # nearest dy to 0
        hc2 = lowpass_r * lowpass_r - dmin * dmin
        hits_c = hc2 >= 0.0
        hc = jnp.sqrt(jnp.clip(hc2, 0.0, None))
        x_lo = jnp.minimum(x_lo, jnp.where(hits_c, ox - hc, big))
        x_hi = jnp.maximum(x_hi, jnp.where(hits_c, ox + hc, -big))
    return x_lo - ROWCULL_PAD, x_hi + ROWCULL_PAD


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
    ext: jnp.ndarray  # (P, 2) snug per-axis half-extents (exact 3-sigma
    #   ellipse AABB; radius == max(ext) — binning uses the rect, not the
    #   square, which cuts tile pairs ~2x for anisotropic surfels)
    rowcull: jnp.ndarray  # (P, 6) [ccx, ccy, sa, p1, p2, dy_t] per-tile-row
    #   footprint interval params at the ALPHA-FLOOR iso-level
    #   (rho = 2 ln 255): the x-interval of {rho <= lvl} at row offset dy is
    #   ccx + [-sa*dy - sqrt(p1*dy^2 + p2), -sa*dy + sqrt(p1*dy^2 + p2)],
    #   maximized over a band at the critical offset dy_t. Culling pairs to
    #   this interval drops ONLY pixels below the 1/255 alpha floor (which
    #   contribute exactly zero in the blend) — bit-identical outputs.


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

    # Conservative 3-sigma screen AABB via the projective conic bound.
    # M = rows . diag(9, 9, -1) . rows^T is the DUAL conic of the 3-sigma
    # footprint boundary; its adjugate gives the point conic used for the
    # per-tile-row snug intervals below.
    a_row = tmat[:, 0, :]  # x coefficients over (u, v, 1)
    b_row = tmat[:, 1, :]
    w_row = tmat[:, 2, :]
    tvec = jnp.asarray([CUTOFF * CUTOFF, CUTOFF * CUTOFF, -1.0], jnp.float32)
    m00 = jnp.sum(tvec * a_row * a_row, axis=-1)
    m01 = jnp.sum(tvec * a_row * b_row, axis=-1)
    m02 = jnp.sum(tvec * a_row * w_row, axis=-1)
    m11 = jnp.sum(tvec * b_row * b_row, axis=-1)
    m12 = jnp.sum(tvec * b_row * w_row, axis=-1)
    d = jnp.sum(tvec * w_row * w_row, axis=-1)  # m22
    d_safe = jnp.where(jnp.abs(d) < 1e-12, 1.0, d)
    cx = m02 / d_safe
    cy = m12 / d_safe
    ext_x = jnp.sqrt(jnp.clip(cx * cx - m00 / d_safe, 1e-4, None))
    ext_y = jnp.sqrt(jnp.clip(cy * cy - m11 / d_safe, 1e-4, None))
    # Per-row cull conic at the ALPHA-FLOOR level. rho3d's level sets are
    # projective conics whose coefficients are NONLINEAR in the level, so
    # build the dual conic M_lvl = rows . diag(lvl, lvl, -1) . rows^T at
    # ROWCULL_LEVEL and take its adjugate as the point conic:
    # footprint = {An dx^2 + 2 Bn dx dy + Cn dy^2 <= r0n} around the
    # level-set's own center (which differs from (cx, cy) of the 3-sigma
    # conic only through the level; rowcull_params re-centers on it).
    # Recenter pixel coordinates on the 3-sigma center before forming the
    # dual: raw tmat entries are O(W*w) and the adjugate's cancelling
    # products overflow f32's 24-bit mantissa; after x' = x - cx the rows
    # are O(ext*w) and the adjugate is well-conditioned.
    lvl = jnp.asarray(ROWCULL_LEVEL, jnp.float32)
    ar = a_row - cx[:, None] * w_row
    br = b_row - cy[:, None] * w_row
    n00 = lvl * jnp.sum(ar[:, :2] * ar[:, :2], -1) - ar[:, 2] ** 2
    n01 = lvl * jnp.sum(ar[:, :2] * br[:, :2], -1) - ar[:, 2] * br[:, 2]
    n02 = lvl * jnp.sum(ar[:, :2] * w_row[:, :2], -1) - ar[:, 2] * w_row[:, 2]
    n11 = lvl * jnp.sum(br[:, :2] * br[:, :2], -1) - br[:, 2] ** 2
    n12 = lvl * jnp.sum(br[:, :2] * w_row[:, :2], -1) - br[:, 2] * w_row[:, 2]
    n22 = lvl * jnp.sum(w_row[:, :2] * w_row[:, :2], -1) - w_row[:, 2] ** 2
    n22_safe = jnp.where(jnp.abs(n22) < 1e-12, 1.0, n22)
    q00 = n11 * n22 - n12 * n12  # adjugate (point conic) entries
    q01 = n02 * n12 - n01 * n22
    q11 = n00 * n22 - n02 * n02
    detN = (n00 * (n11 * n22 - n12 * n12)
            - n01 * (n01 * n22 - n02 * n12)
            + n02 * (n01 * n12 - n02 * n11))
    E0 = detN / n22_safe  # point-conic value at the level-set center
    # orient so the quadratic part is positive (semi)definite: interior =
    # {s*Q <= -s*E0}; r0n <= 0 or an indefinite Q mark the params unreliable
    # (snug_row_interval then falls back to the full row — conservative)
    s = jnp.where(q00 >= 0, 1.0, -1.0)
    An, Bn, Cn, r0n = s * q00, s * q01, s * q11, -s * E0
    # level-set center = 3-sigma center + small recentered offset
    ccx = cx + n02 / n22_safe
    ccy = cy + n12 / n22_safe
    rowcull = rowcull_params(ccx, ccy, An, Bn, Cn, r0n)
    lowpass_r = CUTOFF * jnp.sqrt(1.0 / FILTER_INV_SQUARE)
    bx = jnp.ceil(jnp.maximum(ext_x, lowpass_r))
    by = jnp.ceil(jnp.maximum(ext_y, lowpass_r))
    radius = jnp.maximum(bx, by)

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
    ext = jnp.stack([bx, by], axis=-1) * valid[:, None]

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
        ext=ext,
        rowcull=rowcull,
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
