"""Reference 3D-Gaussian-splatting (EWA) rasterizer in pure JAX.

Semantics ground truth for the 3DGS model family (`GaussianTSampler` in the
reference, /root/reference/easyvolcap/models/samplers/gaussiant_sampler.py:
173-280, backed by the `diff_gauss` CUDA rasterizer): full 3D covariance
Gaussians (3 scales + quaternion), EWA splatting to a screen-space conic,
front-to-back alpha blending with

  rgb    = sum_i w_i c_i + T_final * bg
  depth  = sum_i w_i z_i               (expected depth, premult. by alpha)
  alpha  = sum_i w_i
  wet    = per-splat sum over pixels of w_i
  radii  = conservative screen radii (0 = culled)

with w_i = alpha_i * T_i, alpha_i = min(0.99, o_i * exp(power_i)), the same
clamp/floor/cutoff constants as the 2DGS pipeline (`ops/common.py`).

Projection follows the standard 3DGS EWA pipeline (the contract of
`diff_gauss.rasterize_gaussians`, reconstructed from its call site):
Sigma_3D = R S S^T R^T; Sigma_2D = J W Sigma_3D W^T J^T + 0.3 I with J the
perspective Jacobian at the (frustum-clamped) view-space center.

Autodiff works end-to-end; this file is the grad/forward oracle for the
Pallas gauss3d kernel mode (`ops/raster_pallas.py` mode="gauss3d").
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.ops.common import (
    ALPHA_MAX,
    ALPHA_MIN,
    NEAR_PLANE,
    ROWCULL_LEVEL,
    T_CUTOFF,
    rowcull_params,
)
from envgs_tpu.utils.camera import Camera
from envgs_tpu.utils.transforms import quat_to_rotmat

# 3DGS screen-space low-pass: += 0.3 px^2 on the 2D covariance diagonal
LOWPASS_2D = 0.3
CUTOFF = 3.0  # 3-sigma extent


class Prepared3DSplats(NamedTuple):
    """Per-splat screen-space data for the 3DGS pipeline (padded pool)."""

    conic: jnp.ndarray  # (P, 3) inverse 2D covariance (a, b, c)
    center_pix: jnp.ndarray  # (P, 2) projected center (pixel coords)
    depth: jnp.ndarray  # (P,) view-space z of the center
    radius: jnp.ndarray  # (P,) conservative screen radius (0 if culled)
    color: jnp.ndarray  # (P, C) per-splat channels
    opacity: jnp.ndarray  # (P,)
    valid: jnp.ndarray  # (P,) bool
    ext: jnp.ndarray  # (P, 2) snug per-axis half-extents (3-sigma ellipse
    #   AABB: 3*sqrt(cov_xx), 3*sqrt(cov_yy)); binning uses the rect
    rowcull: jnp.ndarray  # (P, 6) per-tile-row interval params at the
    #   alpha-floor iso-level (ops/common.rowcull_params on the conic)


def prepare_splats3d(
    means3d: jnp.ndarray,
    quats: jnp.ndarray,
    scales3: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    cam: Camera,
    scale_modifier: float = 1.0,
    active: jnp.ndarray | None = None,
    filter3d: jnp.ndarray | None = None,
    lowpass2d: float = LOWPASS_2D,
    compensate2d: bool = False,
) -> Prepared3DSplats:
    """EWA-project 3D Gaussians to screen conics (vectorized XLA).

    Args:
      means3d: (P, 3) world centers.
      quats: (P, 4) wxyz (unnormalized ok).
      scales3: (P, 3) post-activation scales.
      opacities: (P,) post-activation opacities.
      colors: (P, C) per-splat channels.
      active: (P,) bool pool mask; None = all active.
      filter3d: (P,) mip-splatting 3D smoothing-filter std (world units,
        from `compute_filter3d`); convolves the 3D covariance and scales
        opacity by sqrt(det(Sigma)/det(Sigma + f^2 I)) so the splat's
        integrated mass is preserved (the diff_mip_rasterization pipeline).
      lowpass2d: screen-space dilation (0.3 classic 3DGS; mip-splatting
        uses 0.1 with compensate2d=True).
      compensate2d: scale opacity by sqrt(det2/det2_dilated) — the 2D mip
        filter's opacity compensation.
    """
    R = quat_to_rotmat(quats)  # (P, 3, 3)
    S = scales3 * scale_modifier  # (P, 3)
    M = R * S[:, None, :]  # columns scaled: M = R diag(S)
    cov3 = M @ M.transpose(0, 2, 1)  # (P, 3, 3) = R S S^T R^T

    if filter3d is not None:
        f2 = filter3d[:, None] ** 2  # (P, 1)
        det_raw = (S[:, 0] * S[:, 1] * S[:, 2]) ** 2  # det(R S^2 R^T)
        det_flt = ((S ** 2 + f2).prod(axis=-1))
        opacities = opacities * jnp.sqrt(
            jnp.clip(det_raw / jnp.maximum(det_flt, 1e-30), 0.0, 1.0)
        )
        cov3 = cov3 + f2[..., None] * jnp.eye(3)[None]

    # view-space center; frustum-clamped for the Jacobian (3DGS convention)
    t = means3d @ cam.R.T + cam.T[None, :]  # (P, 3)
    tz = jnp.maximum(t[:, 2], 1e-6)
    fx, fy = cam.K[0, 0], cam.K[1, 1]
    lim_x = 1.3 * (0.5 * cam.W / fx)
    lim_y = 1.3 * (0.5 * cam.H / fy)
    txc = jnp.clip(t[:, 0] / tz, -lim_x, lim_x) * tz
    tyc = jnp.clip(t[:, 1] / tz, -lim_y, lim_y) * tz

    # J (2x3 perspective Jacobian) @ W (world->view rotation)
    z = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([fx / tz, z, -fx * txc / (tz * tz)], -1),
            jnp.stack([z, fy / tz, -fy * tyc / (tz * tz)], -1),
        ],
        -2,
    )  # (P, 2, 3)
    JW = J @ cam.R[None]  # (P, 2, 3)
    cov2 = JW @ cov3 @ JW.transpose(0, 2, 1)  # (P, 2, 2)
    a = cov2[:, 0, 0] + lowpass2d
    b = cov2[:, 0, 1]
    c = cov2[:, 1, 1] + lowpass2d

    det = a * c - b * b
    if compensate2d:
        det_raw2 = jnp.clip(
            cov2[:, 0, 0] * cov2[:, 1, 1] - cov2[:, 0, 1] ** 2, 0.0, None
        )
        opacities = opacities * jnp.sqrt(
            jnp.clip(det_raw2 / jnp.maximum(det, 1e-30), 0.0, 1.0)
        )
    det_safe = jnp.where(det <= 0, 1.0, det)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], -1)

    # conservative radius from the largest eigenvalue
    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.clip(mid * mid - det, 0.1, None))
    radius = jnp.ceil(CUTOFF * jnp.sqrt(lam))
    # snug per-axis extents: the 3-sigma ellipse's exact AABB
    bx = jnp.ceil(CUTOFF * jnp.sqrt(jnp.clip(a, 0.0, None)))
    by = jnp.ceil(CUTOFF * jnp.sqrt(jnp.clip(c, 0.0, None)))

    # projected center
    Mp = cam.pix_from_world  # (3, 4)
    ph = means3d @ Mp[:, :3].T + Mp[:, 3]
    w_c = ph[:, 2]
    center_pix = ph[:, :2] / jnp.where(w_c == 0, 1.0, w_c)[:, None]

    valid = (t[:, 2] > NEAR_PLANE) & (det > 0)
    if active is not None:
        valid = valid & active
    in_img = (
        (center_pix[:, 0] + radius >= 0)
        & (center_pix[:, 0] - radius <= cam.W - 1)
        & (center_pix[:, 1] + radius >= 0)
        & (center_pix[:, 1] - radius <= cam.H - 1)
    )
    valid = valid & in_img
    radius = jnp.where(valid, radius, 0.0)
    ext = jnp.stack([bx, by], axis=-1) * valid[:, None]
    # footprint quadratic IS the conic: {conic_a dx^2 + 2 conic_b dx dy +
    # conic_c dy^2 <= ROWCULL_LEVEL}
    rowcull = rowcull_params(
        center_pix[:, 0], center_pix[:, 1],
        conic[:, 0], conic[:, 1], conic[:, 2],
        jnp.full_like(conic[:, 0], ROWCULL_LEVEL),
    )

    return Prepared3DSplats(
        conic=conic,
        center_pix=center_pix,
        depth=t[:, 2],
        radius=radius,
        color=colors,
        opacity=opacities,
        valid=valid,
        ext=ext,
        rowcull=rowcull,
    )


def compute_filter3d(means3d: jnp.ndarray, cams: list,
                     guard: float = 1.3) -> jnp.ndarray:
    """Per-splat mip-splatting 3D smoothing-filter std (world units).

    The maximal sampling rate over the training cameras: for each camera,
    one pixel subtends depth/focal world units at the splat; the filter std
    is sqrt(0.2) * min_k(depth_k / f_k) over cameras that see the point
    (in front of the near plane and within a `guard`-dilated frustum).
    Points seen by no camera get the largest visible interval.
    """
    P = means3d.shape[0]
    best = jnp.full((P,), jnp.inf)
    for cam in cams:
        t = means3d @ cam.R.T + cam.T[None, :]
        z = t[:, 2]
        f = 0.5 * (cam.K[0, 0] + cam.K[1, 1])
        # pixel coords incl. the principal point; inside the guard-dilated
        # frustum means |pix - center| < guard * half-extent
        x = t[:, 0] / jnp.maximum(z, 1e-6) * cam.K[0, 0] + cam.K[0, 2]
        y = t[:, 1] / jnp.maximum(z, 1e-6) * cam.K[1, 1] + cam.K[1, 2]
        inside = (
            (z > NEAR_PLANE)
            & (jnp.abs(x - cam.W / 2) < guard * cam.W / 2)
            & (jnp.abs(y - cam.H / 2) < guard * cam.H / 2)
        )
        interval = jnp.where(inside, z / f, jnp.inf)
        best = jnp.minimum(best, interval)
    fallback = jnp.max(jnp.where(jnp.isinf(best), 0.0, best))
    best = jnp.where(jnp.isinf(best), jnp.maximum(fallback, 1e-4), best)
    return best * jnp.sqrt(0.2)


class Raster3DOutput(NamedTuple):
    rgb: jnp.ndarray  # (H, W, C) includes bg blend
    depth: jnp.ndarray  # (H, W) expected depth, premultiplied by alpha
    alpha: jnp.ndarray  # (H, W)
    wet: jnp.ndarray  # (P,) per-splat accumulated blend weight
    radii: jnp.ndarray  # (P,)
    trans: jnp.ndarray  # (H, W) final transmittance


def rasterize3d_reference(
    prep: Prepared3DSplats, cam: Camera, bg_color: jnp.ndarray
) -> Raster3DOutput:
    """Rasterize prepared 3D splats. O(P * H * W) — small scenes only."""
    P = prep.depth.shape[0]
    H, W = cam.H, cam.W
    C = prep.color.shape[-1]

    order = jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf))
    conic = prep.conic[order]
    center = prep.center_pix[order]
    depth = prep.depth[order]
    color = prep.color[order]
    opac = prep.opacity[order]
    valid = prep.valid[order]
    extv = prep.ext[order]

    jj, ii = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32)
    )

    def body(carry, xs):
        acc, T, wet_s = carry
        cn, ce, z, col, o, ok, ex = xs
        dx = jj - ce[0]
        dy = ii - ce[1]
        power = -0.5 * (cn[0] * dx * dx + cn[2] * dy * dy) - cn[1] * dx * dy
        G = jnp.exp(jnp.minimum(power, 0.0))
        a_px = jnp.minimum(ALPHA_MAX, o * G)
        # AABB-tile membership mirrors the tile kernel: only pixels whose
        # 16px tile overlaps the splat's AABB can blend it
        tile = 16.0
        tpx = jnp.floor(jj / tile)
        tpy = jnp.floor(ii / tile)
        x0 = jnp.floor((ce[0] - ex[0]) / tile)
        x1 = jnp.floor((ce[0] + ex[0]) / tile)
        y0 = jnp.floor((ce[1] - ex[1]) / tile)
        y1 = jnp.floor((ce[1] + ex[1]) / tile)
        in_tile = (tpx >= x0) & (tpx <= x1) & (tpy >= y0) & (tpy <= y1)
        use = ok & (a_px >= ALPHA_MIN) & (T > T_CUTOFF) & in_tile & (power <= 0)
        a_px = jnp.where(use, a_px, 0.0)
        w = a_px * T
        acc = dict(
            rgb=acc["rgb"] + w[..., None] * col,
            dpt=acc["dpt"] + w * z,
            alpha=acc["alpha"] + w,
        )
        return (acc, T * (1.0 - a_px), wet_s), jnp.sum(w)

    acc0 = dict(
        rgb=jnp.zeros((H, W, C)), dpt=jnp.zeros((H, W)),
        alpha=jnp.zeros((H, W)),
    )
    (acc, T, _), wet_sorted = jax.lax.scan(
        body, (acc0, jnp.ones((H, W)), 0.0),
        (conic, center, depth, color, opac, valid, extv),
    )
    wet = jnp.zeros((P,)).at[order].set(wet_sorted)
    rgb = acc["rgb"] + T[..., None] * jnp.broadcast_to(bg_color, (C,))
    return Raster3DOutput(
        rgb=rgb, depth=acc["dpt"], alpha=acc["alpha"], wet=wet,
        radii=prep.radius, trans=T,
    )
