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
from envgs_tpu.ops.losses import cos_sim, l1, psnr, ssim, ssim_masked
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


def _quantile_bisect(d: jnp.ndarray, ps, axis_name: str | None = None,
                     iters: int = 30):
    """Quantiles by CDF bisection; with `axis_name`, counts psum over the
    mesh axis so every band computes the IMAGE-global quantile.

    Used instead of jnp.quantile so the single-chip and band-parallel paths
    are bit-identical (both run the same iterates; the band path only adds
    psum'd counts). Converges to float resolution in 30 halvings; the
    difference vs the reference's interpolated torch.quantile is below the
    inter-order-statistic gap at image scale (it scales a loss weight)."""
    lo = jnp.min(d)
    hi = jnp.max(d)
    n = jnp.asarray(d.size, jnp.float32)
    if axis_name is not None:
        lo = jax.lax.pmin(lo, axis_name)
        hi = jax.lax.pmax(hi, axis_name)
        n = jax.lax.psum(n, axis_name)
    ps = jnp.asarray(ps, jnp.float32)
    los = jnp.broadcast_to(lo, ps.shape)
    his = jnp.broadcast_to(hi, ps.shape)

    def body(_, lohi):
        los, his = lohi
        mid = 0.5 * (los + his)
        cnt = jnp.sum(
            (d[..., None] <= mid.reshape((1,) * d.ndim + ps.shape)),
            axis=tuple(range(d.ndim))).astype(jnp.float32)
        if axis_name is not None:
            cnt = jax.lax.psum(cnt, axis_name)
        go_hi = cnt / n < ps
        return jnp.where(go_hi, mid, los), jnp.where(go_hi, his, mid)

    los, his = jax.lax.fori_loop(0, iters, body, (los, his))
    return 0.5 * (los + his)


def normalize_depth_map(d: jnp.ndarray, p: float = 0.01,
                        axis_name: str | None = None) -> jnp.ndarray:
    """Inverse-normalized depth in [0,1] (depth_utils.normalize_depth:65-71).

    With `axis_name`, `d` is one image band of a band-sharded map and the
    normalization quantiles are computed image-globally (band-exact)."""
    q = _quantile_bisect(d, jnp.asarray([p, 1.0 - p]), axis_name)
    near, far = q[0], q[1]
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
    band: tuple | None = None,  # (axis_name, n_bands, H_global) band-exact
):
    """-> (total_loss, stats dict).

    With `band`, the inputs are one horizontal image band running under
    shard_map over `axis_name` and the windowed/global terms are made
    BAND-EXACT: SSIM exchanges win//2-row halos with the neighbor bands
    (ppermute; each global window computed by exactly one band, share
    scaled so the caller's pmean equals the full-image value) and the
    depth-normalization quantiles psum their CDF counts. pmean of every
    returned loss/stat over the axis then matches single-chip bit-for-bit
    (psnr stat excepted: it stays a band-mean of band PSNRs).

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
        if band is None:
            ssim_loss = 1.0 - ssim(rgb, gt)
        else:
            axis_name, n_bands, H_g = band
            k = 11 // 2
            h = rgb.shape[0]
            z = jnp.concatenate([rgb, gt], axis=-1)
            fwd = [(i, i + 1) for i in range(n_bands - 1)]
            bwd = [(i + 1, i) for i in range(n_bands - 1)]
            top_halo = jax.lax.ppermute(z[-k:], axis_name, fwd)
            bot_halo = jax.lax.ppermute(z[:k], axis_name, bwd)
            z_ext = jnp.concatenate([top_halo, z, bot_halo], axis=0)
            grow = jax.lax.axis_index(axis_name) * h + jnp.arange(h)
            mask = ((grow >= k) & (grow <= H_g - 1 - k)).astype(rgb.dtype)
            n_g = (H_g - 2 * k) * (rgb.shape[1] - 2 * k) * rgb.shape[2]
            share = ssim_masked(z_ext[..., :3], z_ext[..., 3:],
                                mask[:, None, None], n_g)
            # caller pmeans losses over the axis: scale so pmean == psum
            ssim_loss = 1.0 - share * n_bands
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
                jax.lax.stop_gradient(out.dpt_map[..., 0]),
                axis_name=band[0] if band is not None else None,
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
                jax.lax.stop_gradient(out.dpt_map[..., 0]),
                axis_name=band[0] if band is not None else None,
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
