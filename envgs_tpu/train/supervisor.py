"""Training losses (supervisors).

Replicates the reference's loss stack:
- VolumetricVideoSupervisor image losses (volumetric_video_supervisor.py:41-146):
  L1 / L2 / Charbonnier / Huber / SSIM / MS-SSIM with bg-masked GT;
- EnvGSSupervisor (envgs_supervisor.py:139-235): env-opacity sparsity,
  monocular-normal loss (view space, L1+cosine, inverse-depth scaled),
  normal-consistency (rendered vs depth-derived), mask MSE, distortion mean;
- optional perceptual loss from iter `perc_loss_start_iter` if a JAX LPIPS
  is available (see ops/lpips_jax).

Everything is a pure function of (output, batch, iteration) so it jits into
the train step; iteration gates are jnp.where, not Python branches.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.models.envgs import EnvGSOutput
from envgs_tpu.ops.losses import cos_sim, l1, psnr, ssim
from envgs_tpu.utils.transforms import normalize


class LossConfig(NamedTuple):
    """envgs.yaml supervisor_cfg defaults."""

    img_loss_weight: float = 0.8
    img_loss_type: str = "L1"
    ssim_loss_weight: float = 0.2
    # normal consistency (rendered vs depth-derived)
    gs_norm_loss_weight: float = 0.04
    gs_norm_loss_start_iter: int = 0
    use_dpt_scale_gs_norm_loss: bool = True
    use_acc_scale_gs_norm_loss: bool = False
    # monocular normal prior
    norm_loss_weight: float = 0.01
    norm_loss_start_iter: int = 0
    use_dpt_scale_norm_loss: bool = True
    use_acc_scale_norm_loss: bool = False
    # distortion
    gs_dist_loss_weight: float = 0.0
    gs_dist_loss_start_iter: int = 3000
    # env opacity sparsity
    env_opacity_loss_weight: float = 0.0
    env_opacity_loss_type: str = "sparse"
    env_opacity_loss_start_iter: int = 0
    # mask loss
    msk_loss_weight: float = 0.0
    msk_loss_start_iter: int = 7000
    # perceptual
    perc_loss_weight: float = 0.01
    perc_loss_start_iter: int = 21000


def normalize_depth_map(d: jnp.ndarray, p: float = 0.01) -> jnp.ndarray:
    """Inverse-normalized depth in [0,1] (depth_utils.normalize_depth:65-71)."""
    near = jnp.quantile(d, p)
    far = jnp.quantile(d, 1.0 - p)
    nd = 1.0 - (d - near) / jnp.where(far - near == 0, 1.0, far - near)
    return jnp.clip(nd, 0.0, 1.0)


def compute_losses(
    out: EnvGSOutput,
    gt_rgb: jnp.ndarray,  # (H, W, 3)
    gt_msk: jnp.ndarray,  # (H, W, 1)
    gt_norm: jnp.ndarray | None,  # (H, W, 3) in [0,1] encoding, or None
    R: jnp.ndarray,  # (3, 3) world->view rotation
    it: jnp.ndarray,
    cfg: LossConfig,
    bg_brightness: float = 0.0,
    lpips_fn=None,
    aux_cfg=None,  # AuxLossConfig | None — chained aux supervisor family
    gt_dpt: jnp.ndarray | None = None,  # (H, W, 1) metric depth prior
):
    """-> (total_loss, stats dict).

    `aux_cfg` chains the aux supervisor family (train/aux_supervisors.py)
    into the same total — the functional analog of the reference's
    SequentialSupervisor list (configs/models/envgs.yaml:70-73 +
    models/supervisors/sequential_supervisor.py): any enabled aux term
    (weight > 0 with its inputs present) adds to the loss and the stats."""
    stats = {}
    itf = jnp.asarray(it, jnp.float32)
    loss = jnp.asarray(0.0, jnp.float32)

    # --- image loss (bg-composed GT; supervisor:41-52) ---
    gt = gt_rgb + bg_brightness * (1.0 - gt_msk)
    rgb = out.rgb_map
    stats["psnr"] = psnr(rgb, gt)
    if cfg.img_loss_weight > 0:
        if cfg.img_loss_type == "L1":
            img_loss = l1(rgb, gt)
        elif cfg.img_loss_type == "L2":
            img_loss = jnp.mean((rgb - gt) ** 2)
        elif cfg.img_loss_type == "CHARB":
            img_loss = jnp.mean(jnp.sqrt((rgb - gt) ** 2 + 1e-6))
        elif cfg.img_loss_type == "HUBER":
            d = jnp.abs(rgb - gt)
            img_loss = jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))
        else:
            raise ValueError(cfg.img_loss_type)
        stats["img_loss"] = img_loss
        loss = loss + cfg.img_loss_weight * img_loss

    if cfg.ssim_loss_weight > 0:
        ssim_loss = 1.0 - ssim(rgb, gt)
        stats["ssim_loss"] = ssim_loss
        loss = loss + cfg.ssim_loss_weight * ssim_loss

    # --- normal consistency: rendered vs depth-derived (envgs_supervisor:188-213)
    if cfg.gs_norm_loss_weight > 0:
        gl = 1.0 - jnp.sum(out.norm_map * out.surf_norm_map, axis=-1)
        if cfg.use_acc_scale_gs_norm_loss:
            # scale by rendered accumulation (envgs_supervisor.py:230-233
            # use_acc_scale_gs_norm_loss; envgs_synth.yaml recipe)
            gl = gl * jax.lax.stop_gradient(out.acc_map[..., 0])
        if cfg.use_dpt_scale_gs_norm_loss:
            scale = normalize_depth_map(
                jax.lax.stop_gradient(out.dpt_map[..., 0])
            )
            gl = gl * scale
        gl = jnp.mean(gl)
        gate = (itf >= cfg.gs_norm_loss_start_iter).astype(jnp.float32)
        stats["gs_norm_loss"] = gl
        loss = loss + cfg.gs_norm_loss_weight * gate * gl

    # --- monocular normal prior (envgs_supervisor:151-186) ---
    if cfg.norm_loss_weight > 0 and gt_norm is not None:
        nm = normalize(out.norm_map) @ R.T  # world -> view
        nm = normalize(nm)
        ng = normalize(gt_norm * 2.0 - 1.0)
        nl = jnp.sum(jnp.abs(nm - ng), axis=-1) + (1.0 - cos_sim(nm, ng))
        if cfg.use_acc_scale_norm_loss:
            # scale by rendered accumulation (envgs_supervisor.py:165-167)
            nl = nl * jax.lax.stop_gradient(out.acc_map[..., 0])
        if cfg.use_dpt_scale_norm_loss:
            scale = normalize_depth_map(
                jax.lax.stop_gradient(out.dpt_map[..., 0])
            )
            nl = nl * scale
        nl = jnp.mean(nl)
        gate = (itf >= cfg.norm_loss_start_iter).astype(jnp.float32)
        stats["norm_loss"] = nl
        loss = loss + cfg.norm_loss_weight * gate * nl

    # --- distortion (envgs_supervisor:224-233) ---
    if cfg.gs_dist_loss_weight > 0:
        dl = jnp.mean(out.dist_map)
        gate = (itf >= cfg.gs_dist_loss_start_iter).astype(jnp.float32)
        stats["gs_dist_loss"] = dl
        loss = loss + cfg.gs_dist_loss_weight * gate * dl

    # --- env opacity sparsity (envgs_supervisor:140-149) ---
    if cfg.env_opacity_loss_weight > 0:
        v = jnp.clip(out.env_opacity, 1e-3, 1 - 1e-3)
        if cfg.env_opacity_loss_type == "sparse":
            el = jnp.mean(jnp.log(v) + jnp.log(1 - v))
        else:
            el = jnp.mean(jnp.abs(1 - v))
        gate = (itf >= cfg.env_opacity_loss_start_iter).astype(jnp.float32)
        stats["env_opacity_loss"] = el
        loss = loss + cfg.env_opacity_loss_weight * gate * el

    # --- mask loss (envgs_supervisor:215-222) ---
    if cfg.msk_loss_weight > 0:
        ml = jnp.mean((out.acc_map - gt_msk) ** 2)
        gate = (itf >= cfg.msk_loss_start_iter).astype(jnp.float32)
        stats["msk_loss"] = ml
        loss = loss + cfg.msk_loss_weight * gate * ml

    # --- perceptual (differentiable JAX LPIPS when available) ---
    if cfg.perc_loss_weight > 0 and lpips_fn is not None:
        pl_ = lpips_fn(rgb, gt)
        gate = (itf > cfg.perc_loss_start_iter).astype(jnp.float32)
        stats["perc_loss"] = pl_
        loss = loss + cfg.perc_loss_weight * gate * pl_

    # --- chained aux supervisors (SequentialSupervisor analog) ---
    if aux_cfg is not None and any(
            isinstance(v, (int, float)) and v > 0 for v in aux_cfg):
        from envgs_tpu.train.aux_supervisors import compute_aux_losses

        out_d = {
            "dpt_map": out.dpt_map[..., 0],
            "acc_map": out.acc_map,
            "occ": out.acc_map,
        }
        batch_d = {"msk": gt_msk}
        if gt_dpt is not None:
            batch_d["dpt"] = gt_dpt[..., 0]
        aux_loss, aux_stats = compute_aux_losses(aux_cfg, out_d, batch_d, it)
        for k, v in aux_stats.items():
            stats["aux_" + k] = v
        loss = loss + aux_loss

    stats["loss"] = loss
    return loss, stats
