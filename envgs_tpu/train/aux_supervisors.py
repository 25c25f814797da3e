"""Auxiliary supervisor family: the reference's non-EnvGS loss modules as
pure jit-friendly functions.

Reference semantics (easyvolcap/models/supervisors/):
- DepthSupervisor          depth_supervisor.py:64-76   (smoothl1/l1/l2 +
  MonoSDF scale-shift-invariant MSE/MAE, AdaBins scale-invariant log)
- FlowSupervisor           flow_supervisor.py:25-34
- ProposalSupervisor       proposal_supervisor.py:31-91 (mipnerf360
  lossfun_outer envelope + distortion over proposal levels)
- TemporalSupervisor       temporal_supervisor.py:31-60 (k-planes TV +
  time-plane smoothness + t-residual reg)
- GeometrySupervisor       geometry_supervisor.py:47-105 (eikonal,
  curvature from finite-diff sdf taps, annealed normal-smoothness)
- DisplacementSupervisor   displacement_supervisor.py:31-73 (resd l2 +
  Geman-McClure elastic energy over warp jacobian singular values)
- MaskSupervisor / OpacitySupervisor  mask_supervisor.py / opacity_
  supervisor.py (mIoU + BCE mask losses, occupancy entropy)
- MotionConsistencySupervisor  motion_consistency_supervisor.py:35-51
  (K-neighbor scene-flow agreement inside a ball radius)

Everything takes dense arrays + {0,1} float masks (never boolean fancy
indexing — shapes stay static under jit) and reduces with mask-weighted
means, matching the reference's masked-pixel means.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Depth losses (DepthSupervisor)
# ---------------------------------------------------------------------------


def smoothl1(x, y, mask=None):
    """F.smooth_l1_loss (beta=1): 0.5 d^2 for |d|<1 else |d|-0.5."""
    d = x - y
    ad = jnp.abs(d)
    v = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
    if mask is None:
        return jnp.mean(v)
    return jnp.sum(v * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def compute_scale_and_shift(pred, tgt, mask):
    """Closed-form least-squares (s, t) aligning pred -> tgt on mask.

    MonoSDF system solve (loss_utils.py:558-580); per-image maps (H, W)."""
    a00 = jnp.sum(mask * pred * pred)
    a01 = jnp.sum(mask * pred)
    a11 = jnp.sum(mask)
    b0 = jnp.sum(mask * pred * tgt)
    b1 = jnp.sum(mask * tgt)
    det = a00 * a11 - a01 * a01
    ok = jnp.abs(det) > 1e-12
    det = jnp.where(ok, det, 1.0)
    s = jnp.where(ok, (a11 * b0 - a01 * b1) / det, 0.0)
    t = jnp.where(ok, (-a01 * b0 + a00 * b1) / det, 0.0)
    return s, t


def _gradient_loss(diff, mask):
    """Multi-scale-free single-scale masked gradient matching term."""
    d = diff * mask
    gx = jnp.abs(d[:, 1:] - d[:, :-1]) * (mask[:, 1:] * mask[:, :-1])
    gy = jnp.abs(d[1:, :] - d[:-1, :]) * (mask[1:, :] * mask[:-1, :])
    return jnp.sum(gx) + jnp.sum(gy)


def scale_shift_invariant_loss(pred, tgt, mask, alpha: float = 0.5,
                               scales: int = 4, kind: str = "mse"):
    """MiDaS/MonoSDF scale-and-shift-invariant depth loss on (H, W) maps.

    loss_utils.py:666-711: align pred by closed-form (s, t), masked MSE (or
    MAE) + alpha * multi-scale gradient regularizer."""
    s, t = compute_scale_and_shift(pred, tgt, mask)
    p = s * pred + t
    M = jnp.sum(mask)
    res = p - tgt
    if kind == "mse":
        data = jnp.sum(mask * res * res) / jnp.maximum(2.0 * M, 1.0)
    else:
        data = jnp.sum(mask * jnp.abs(res)) / jnp.maximum(2.0 * M, 1.0)
    reg = 0.0
    for sc in range(scales):
        step = 2 ** sc
        reg += _gradient_loss(res[::step, ::step], mask[::step, ::step])
    return data + alpha * reg / jnp.maximum(M, 1.0)


def scale_invariant_log_loss(pred, tgt, mask, alpha: float = 10.0,
                             beta: float = 0.15, eps: float = 1e-8):
    """AdaBins SILog (loss_utils.py:779-805): alpha*sqrt(var(g)+beta*mean(g)^2),
    g = log(pred) - log(tgt) over masked pixels."""
    n = jnp.maximum(jnp.sum(mask), 1.0)
    g = (jnp.log(jnp.maximum(pred, 0.0) + eps)
         - jnp.log(jnp.maximum(tgt, 0.0) + eps)) * mask
    mean_g = jnp.sum(g) / n
    var_g = jnp.sum(mask * (g - mean_g) ** 2) / n
    return alpha * jnp.sqrt(jnp.maximum(var_g + beta * mean_g ** 2, 1e-12))


def depth_loss(dpt_map, dpt_gt, mask=None, kind: str = "smoothl1", **kw):
    """DepthSupervisor.compute_depth_loss dispatch. mask defaults to
    dpt_gt != 0 (depth_supervisor.py:71)."""
    if mask is None:
        mask = (dpt_gt != 0).astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    if kind == "smoothl1":
        return smoothl1(dpt_map, dpt_gt, mask)
    if kind == "l1":
        return jnp.sum(jnp.abs(dpt_map - dpt_gt) * mask) / jnp.maximum(
            jnp.sum(mask), 1.0)
    if kind == "l2":
        return jnp.sum((dpt_map - dpt_gt) ** 2 * mask) / jnp.maximum(
            jnp.sum(mask), 1.0)
    if kind in ("ssimse", "ssimae"):
        return scale_shift_invariant_loss(
            dpt_map, dpt_gt, mask, kind="mse" if kind == "ssimse" else "mae",
            **kw)
    if kind == "silog":
        return scale_invariant_log_loss(dpt_map, dpt_gt, mask, **kw)
    raise ValueError(f"unknown depth loss kind {kind!r}")


# ---------------------------------------------------------------------------
# Flow (FlowSupervisor)
# ---------------------------------------------------------------------------


def flow_loss(flo_map, flow_gt, flow_weight=None):
    """flow_supervisor.py:26-33: weighted L1 over the flow map."""
    d = jnp.abs(flo_map - flow_gt)
    if flow_weight is None:
        return jnp.mean(d)
    return jnp.sum(d * flow_weight) / (jnp.sum(flow_weight) + 1e-8)


# ---------------------------------------------------------------------------
# Proposal (ProposalSupervisor) — mipnerf360
# ---------------------------------------------------------------------------


def lossfun_distortion(t, w):
    """mipnerf360 distortion: iint w_i w_j |t_i - t_j| + intra-interval term
    (loss_utils.py:144-156). t: (..., S+1) bin edges, w: (..., S)."""
    ut = 0.5 * (t[..., 1:] + t[..., :-1])
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    intra = jnp.sum(w * w * (t[..., 1:] - t[..., :-1]), axis=-1) / 3.0
    return inter + intra


def _searchsorted_pair(t1, t0):
    """For each edge in t0, indices (lo, hi) into t1 straddling it."""
    hi = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))(
        t1.reshape(-1, t1.shape[-1]), t0.reshape(-1, t0.shape[-1])
    ).reshape(t0.shape)
    hi = jnp.clip(hi, 0, t1.shape[-1] - 1)
    lo = jnp.clip(hi - 1, 0, t1.shape[-1] - 1)
    return lo, hi


def inner_outer(t0, t1, y1):
    """Outer measure of histogram (t1, y1) on intervals of t0
    (loss_utils.py:57-68)."""
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)
    idx_lo, idx_hi = _searchsorted_pair(t1, t0)
    cy1_lo = jnp.take_along_axis(cy1, idx_lo, axis=-1)
    cy1_hi = jnp.take_along_axis(cy1, idx_hi, axis=-1)
    y0_outer = cy1_hi[..., 1:] - cy1_lo[..., :-1]
    y0_inner = jnp.where(
        idx_hi[..., :-1] <= idx_lo[..., 1:],
        cy1_lo[..., 1:] - cy1_hi[..., :-1], 0.0)
    return y0_inner, y0_outer


def lossfun_outer(t, w, t_env, w_env, eps: float = 1.1920929e-07):
    """Proposal envelope loss (loss_utils.py:72-81): penalize nerf weight
    exceeding the proposal's outer measure."""
    _, w_outer = inner_outer(t, t_env, w_env)
    return jnp.clip(w - w_outer, 0.0, None) ** 2 / (w + eps)


def proposal_loss(s_vals, weights, s_vals_prop, weights_prop,
                  dist_loss_weight: float = 0.0,
                  prop_loss_weight: float = 1.0):
    """ProposalSupervisor.compute_loss histogram branch
    (proposal_supervisor.py:40-50, 77-91). Proposal args are lists (one per
    level); nerf histogram is stop-gradiented as in the reference."""
    stats = {}
    total = 0.0
    if dist_loss_weight > 0:
        dist = jnp.mean(lossfun_distortion(s_vals, weights))
        for tp, wp in zip(s_vals_prop, weights_prop):
            dist += jnp.mean(lossfun_distortion(tp, wp))
        stats["dist_loss"] = dist
        total += dist_loss_weight * dist
    if prop_loss_weight > 0 and len(s_vals_prop):
        t = jax.lax.stop_gradient(s_vals)
        w = jax.lax.stop_gradient(weights)
        prop = 0.0
        for tp, wp in zip(s_vals_prop, weights_prop):
            prop += jnp.mean(lossfun_outer(t, w, tp, wp))
        stats["prop_loss"] = prop
        total += prop_loss_weight * prop
    return total, stats


# ---------------------------------------------------------------------------
# Temporal (TemporalSupervisor) — k-planes regularizers
# ---------------------------------------------------------------------------


def plane_tv(plane):
    """compute_plane_tv (loss_utils.py:470-476): mean squared first
    differences along the two trailing (h, w) axes of (..., h, w)."""
    h, w = plane.shape[-2], plane.shape[-1]
    lead = 1
    for s in plane.shape[:-2]:
        lead *= int(s)
    htv = jnp.sum(jnp.square(plane[..., 1:, :] - plane[..., :-1, :]))
    wtv = jnp.sum(jnp.square(plane[..., :, 1:] - plane[..., :, :-1]))
    return 2.0 * (htv / (lead * (h - 1) * w) + wtv / (lead * h * (w - 1)))


def planes_tv(planes):
    return sum(plane_tv(p) for p in planes)


def plane_smoothness(plane):
    """compute_plane_smoothness (loss_utils.py:485-491): mean squared second
    difference along the trailing (time) axis."""
    d1 = plane[..., 1:] - plane[..., :-1]
    d2 = d1[..., 1:] - d1[..., :-1]
    return jnp.mean(jnp.square(d2))


def time_planes_smooth(planes):
    return sum(plane_smoothness(p) for p in planes)


def t_resd_loss(t_resd):
    """l2_reg of the time residual (temporal_supervisor.py:55-58)."""
    return jnp.mean(jnp.square(t_resd))


# ---------------------------------------------------------------------------
# Geometry (GeometrySupervisor) — SDF regularizers
# ---------------------------------------------------------------------------


def eikonal(grads, th: float = 1.0):
    """loss_utils.py:274: ((|g| - th)^2).mean()."""
    return jnp.mean((jnp.linalg.norm(grads, axis=-1) - th) ** 2)


def curvature_loss(sdf, sampled_sdf, delta: float):
    """Finite-difference Laplacian magnitude (geometry_supervisor.py:79-86).

    sampled_sdf: (..., 3, 2) the +-delta taps along each axis."""
    curv = (jnp.sum(sampled_sdf, axis=-1) - 2.0 * sdf[..., None]) / delta ** 2
    return jnp.mean(jnp.abs(curv))


def norm_smooth_loss(grad_pts, grad_nbr, it, max_weight: float,
                     ann_iter: int = 1, weight_mask=None):
    """reg_raw_crit (loss_utils.py:247-262): unit-normal difference between
    surface points and jittered neighbors, weight annealed linearly to
    max_weight over ann_iter. weight_mask zeroes non-surface samples."""
    nv = grad_pts / (jnp.linalg.norm(grad_pts, axis=-1, keepdims=True) + 1e-8)
    nn = grad_nbr / (jnp.linalg.norm(grad_nbr, axis=-1, keepdims=True) + 1e-8)
    d = jnp.linalg.norm(nv - nn, axis=-1)
    if weight_mask is not None:
        loss = jnp.sum(d * weight_mask) / jnp.maximum(
            jnp.sum(weight_mask), 1.0)
    else:
        loss = jnp.mean(d)
    w = jnp.minimum(it, ann_iter) * max_weight / ann_iter
    return loss, w


# ---------------------------------------------------------------------------
# Displacement (DisplacementSupervisor)
# ---------------------------------------------------------------------------


def elastic_crit(jac):
    """Geman-McClure elastic energy over log singular values of the warp
    jacobian (loss_utils.py:368-395). jac: (..., 3, 3) -> (...,)."""
    s = jnp.linalg.svd(jac, compute_uv=False)
    log_s = jnp.log(jnp.clip(s, 1e-6, None))
    sq = jnp.sum(log_s ** 2, axis=-1)
    # Geman-McClure robust remap (scale 0.03 as in nerfies)
    scale = 0.03
    return 2.0 * (sq / scale ** 2) / (sq / scale ** 2 + 4.0) * scale ** 2


def displacement_loss(resd=None, jacobian=None, weights=None,
                      resd_loss_weight: float = 0.0,
                      elas_loss_weight: float = 0.0,
                      reduce_by_weight: bool = True):
    """displacement_supervisor.py:31-73 single-level branch."""
    stats = {}
    total = 0.0
    if jacobian is not None and elas_loss_weight > 0:
        e = elastic_crit(jacobian)
        if reduce_by_weight and weights is not None:
            e = e * weights.reshape(e.shape)
        e = jnp.mean(jnp.sum(e.reshape(e.shape[0], -1), axis=-1))
        stats["elas_loss"] = e
        total += elas_loss_weight * e
    if resd is not None and resd_loss_weight > 0:
        r = jnp.mean(jnp.square(resd))
        stats["resd_loss"] = r
        total += resd_loss_weight * r
    return total, stats


# ---------------------------------------------------------------------------
# Mask / opacity (MaskSupervisor, OpacitySupervisor)
# ---------------------------------------------------------------------------


def miou_loss(x, y):
    """1 - mean IoU over soft masks (loss_utils.py:349-358); x, y (B, N, 1)
    or (N,)-like."""
    xf = x.reshape(1, -1) if x.ndim <= 1 else x.reshape(x.shape[0], -1)
    yf = y.reshape(1, -1) if y.ndim <= 1 else y.reshape(y.shape[0], -1)
    inter = jnp.sum(xf * yf, axis=-1)
    union = jnp.sum(xf + yf, axis=-1) - inter
    return 1.0 - jnp.mean(inter / (jax.lax.stop_gradient(union) + 1e-8))


def bce_loss(pred, tgt, eps: float = 1e-7):
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(tgt * jnp.log(p) + (1.0 - tgt) * jnp.log(1.0 - p))


def occupancy_entropy(occ, eps: float = 1e-8):
    """opacity_supervisor.py:23-27: -mean(occ * log(occ))."""
    return -jnp.mean(occ * jnp.log(jnp.clip(occ, eps, None)))


# ---------------------------------------------------------------------------
# Motion consistency (MotionConsistencySupervisor)
# ---------------------------------------------------------------------------


def motion_consistency_loss(xyz, ms3, mask, K: int = 8, radius: float = 0.1):
    """Scene-flow agreement with the K nearest in-ball neighbors
    (motion_consistency_supervisor.py:35-51). Dense-masked variant: the
    neighbor query runs over all rows, with masked rows pushed to infinity
    so they are never selected; the loss averages only masked rows."""
    maskf = mask.reshape(-1).astype(jnp.float32)
    big = 1e9
    p = jnp.where(maskf[:, None] > 0, xyz, big)
    d2 = jnp.sum((p[:, None, :] - p[None, :, :]) ** 2, axis=-1)
    d2 = d2 + jnp.eye(p.shape[0]) * big  # exclude self
    neg, idx = jax.lax.top_k(-d2, K)
    valid = ((-neg) <= radius * radius).astype(jnp.float32)
    has_nbr = (jnp.sum(valid, axis=-1) > 0).astype(jnp.float32)
    nbr = jnp.sum(ms3[idx] * valid[..., None], axis=1) / (
        jnp.sum(valid, axis=-1, keepdims=True) + 1e-6)
    per = jnp.mean(jnp.abs(ms3 - nbr), axis=-1) * has_nbr * maskf
    return jnp.sum(per) / jnp.maximum(jnp.sum(maskf), 1.0)


# ---------------------------------------------------------------------------
# Config-driven aggregate (SequentialSupervisor analog for the aux set)
# ---------------------------------------------------------------------------


class AuxLossConfig(NamedTuple):
    """Weights for the aux supervisor set; 0 = branch disabled (the same
    guard the reference uses on its *_loss_weight attributes)."""
    dpt_loss_weight: float = 0.0
    dpt_loss_kind: str = "smoothl1"
    flow_loss_weight: float = 0.0
    dist_loss_weight: float = 0.0
    prop_loss_weight: float = 0.0
    tv_loss_weight: float = 0.0
    time_smooth_weight: float = 0.0
    t_resd_loss_weight: float = 0.0
    eikonal_loss_weight: float = 0.0
    curvature_loss_weight: float = 0.0
    resd_loss_weight: float = 0.0
    elas_loss_weight: float = 0.0
    msk_loss_weight: float = 0.0
    ent_loss_weight: float = 0.0


def compute_aux_losses(cfg: AuxLossConfig, output: dict, batch: dict,
                       it=0):
    """Fold every enabled aux supervisor over (output, batch) dicts — the
    functional analog of SequentialSupervisor chaining
    (sequential_supervisor.py:30-53). Branches activate exactly like the
    reference: weight > 0 AND the needed keys present."""
    loss = 0.0
    stats = {}

    def have(*ks, d=None):
        src = output if d is None else d
        return all(k in src and src[k] is not None for k in ks)

    if cfg.dpt_loss_weight > 0 and have("dpt_map") and have("dpt", d=batch):
        v = depth_loss(output["dpt_map"], batch["dpt"], kind=cfg.dpt_loss_kind)
        stats["dpt_loss"] = v
        loss = loss + cfg.dpt_loss_weight * v
    if cfg.flow_loss_weight > 0 and have("flo_map") and have("flow", d=batch):
        v = flow_loss(output["flo_map"], batch["flow"],
                      batch.get("flow_weight"))
        stats["flow_loss"] = v
        loss = loss + cfg.flow_loss_weight * v
    if (cfg.prop_loss_weight > 0 or cfg.dist_loss_weight > 0) and have(
            "s_vals", "weights", "s_vals_prop", "weights_prop"):
        v, st = proposal_loss(
            output["s_vals"], output["weights"], output["s_vals_prop"],
            output["weights_prop"], dist_loss_weight=cfg.dist_loss_weight,
            prop_loss_weight=cfg.prop_loss_weight)
        stats.update(st)
        loss = loss + v
    if cfg.tv_loss_weight > 0 and have("spatial_planes"):
        v = planes_tv(output["spatial_planes"])
        stats["tv_loss"] = v
        loss = loss + cfg.tv_loss_weight * v
    if cfg.time_smooth_weight > 0 and have("temporal_planes"):
        v = time_planes_smooth(output["temporal_planes"])
        stats["time_smooth_loss"] = v
        loss = loss + cfg.time_smooth_weight * v
    if cfg.t_resd_loss_weight > 0 and have("t_resd"):
        v = t_resd_loss(output["t_resd"])
        stats["t_resd_loss"] = v
        loss = loss + cfg.t_resd_loss_weight * v
    if cfg.eikonal_loss_weight > 0 and have("gradients"):
        v = eikonal(output["gradients"])
        stats["eikonal_loss"] = v
        loss = loss + cfg.eikonal_loss_weight * v
    if cfg.curvature_loss_weight > 0 and have("sdf", "sampled_sdf",
                                              "finite_diff_delta"):
        v = curvature_loss(output["sdf"], output["sampled_sdf"],
                           output["finite_diff_delta"])
        stats["curvature_loss"] = v
        loss = loss + cfg.curvature_loss_weight * v
    if (cfg.resd_loss_weight > 0 or cfg.elas_loss_weight > 0) and (
            have("resd") or have("jacobian")):
        v, st = displacement_loss(
            resd=output.get("resd"), jacobian=output.get("jacobian"),
            weights=output.get("weights"),
            resd_loss_weight=cfg.resd_loss_weight,
            elas_loss_weight=cfg.elas_loss_weight)
        stats.update(st)
        loss = loss + v
    if cfg.msk_loss_weight > 0 and have("acc_map") and have("msk", d=batch):
        v = miou_loss(output["acc_map"], batch["msk"])
        stats["msk_loss"] = v
        loss = loss + cfg.msk_loss_weight * v
    if cfg.ent_loss_weight > 0 and have("occ"):
        v = occupancy_entropy(output["occ"])
        stats["ent_loss"] = v
        loss = loss + cfg.ent_loss_weight * v
    return loss, stats
