"""GaussianT model family: plain 3DGS training/rendering (full 3D covariance).

TPU-native counterpart of the reference's `GaussianTSampler`
(/root/reference/easyvolcap/models/samplers/gaussiant_sampler.py) backed by
the `diff_gauss` CUDA rasterizer — here the Pallas gauss3d kernel mode
(`ops/raster3d.py`). The parameter store is the shared padded `GaussianPool`
with 3 scale axes; adaptive density control, SH degree ramping, and opacity
resets reuse the pool machinery (`models/gaussians.py`), mirroring the
3DGS-era GaussianModel (easyvolcap/utils/gaussian_utils.py).

Functional API: `render_gaussiant` renders one view; `make_gaussiant_train_step`
returns a jitted L1+SSIM train step with the sparse-Adam (grad==0 skip)
update and in-step densification-stat accumulation; `gaussiant_maintenance`
applies the host-dispatched schedule (SH ramp / densify / opacity reset).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.models.gaussians import (
    DensifyConfig,
    GaussianPool,
    accumulate_stats,
    create_pool,
    densify_and_prune,
    oneup_sh_degree,
    reset_opacity,
    sh_degree_mask,
)
from envgs_tpu.ops.losses import ssim
from envgs_tpu.ops.raster3d import Raster3DOutput, render_gaussians3d
from envgs_tpu.train.optimizer import (
    AdamState,
    LRConfig,
    init_adam,
    lr_tree_for,
    sparse_adam_update,
)
from envgs_tpu.utils.camera import Camera
from envgs_tpu.utils.sh import eval_sh_color
from envgs_tpu.utils.transforms import normalize


class GaussianTConfig(NamedTuple):
    """Static hyperparameters (GaussianTSampler defaults)."""

    sh_degree: int = 3
    bg_brightness: float = 0.0
    raster_backend: str = "pallas"
    pair_cap: int = 2 ** 21
    scale_modifier: float = 1.0
    # training schedule (3DGS conventions)
    ssim_weight: float = 0.2
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    oneup_sh_every: int = 1_000


def init_gaussiant_pool(xyz, colors, cap: int, cfg: GaussianTConfig,
                        init_opacity: float = 0.1) -> GaussianPool:
    """3-scale-axis pool from an SfM point cloud (create_from_pcd)."""
    return create_pool(xyz, colors, cap, sh_degree=cfg.sh_degree,
                       init_opacity=init_opacity, scale_axes=3)


def _pool_colors(pool: GaussianPool, viewdir_origin: jnp.ndarray) -> jnp.ndarray:
    """Per-splat SH colors toward the camera (convert_SHs_python)."""
    feats = pool.get_features  # (P, K, 3)
    mask = sh_degree_mask(pool.stats.sh_degree, pool.max_sh_degree)
    feats = feats * mask[None, :, None]
    dirs = normalize(pool.params.xyz - viewdir_origin[None, :])
    sh = jnp.swapaxes(feats, 1, 2)  # (P, 3, K)
    return eval_sh_color(pool.max_sh_degree, sh, dirs)


def render_gaussiant(
    pool: GaussianPool,
    cam: Camera,
    cfg: GaussianTConfig,
    means2d_zero: jnp.ndarray | None = None,
) -> Raster3DOutput:
    """Render one view of a 3DGS pool (diff_gauss output contract)."""
    colors = _pool_colors(pool, cam.center)
    return render_gaussians3d(
        pool.params.xyz,
        pool.params.rotation,
        pool.get_scaling,
        pool.get_opacity[:, 0],
        colors,
        cam,
        bg_color=cfg.bg_brightness,
        backend=cfg.raster_backend,
        pair_cap=cfg.pair_cap,
        scale_modifier=cfg.scale_modifier,
        active=pool.stats.active,
        means2d_zero=means2d_zero,
    )


class GaussianTState(NamedTuple):
    pool: GaussianPool
    opt: AdamState


def init_gaussiant_state(pool: GaussianPool) -> GaussianTState:
    return GaussianTState(pool, init_adam(pool.params))


def make_gaussiant_train_step(cfg: GaussianTConfig, cam_template: Camera,
                              lr: LRConfig | None = None):
    """Jitted 3DGS train step for a fixed camera resolution (H/W/znear/zfar
    static from the template, per-view K/R/T traced): (1-w)*L1 +
    w*(1-SSIM), sparse Adam, in-step densification stats (screen grads via
    the means2d_zero cotangent)."""
    lr = lr or LRConfig()
    H, W = cam_template.H, cam_template.W
    znear, zfar = cam_template.znear, cam_template.zfar

    @jax.jit
    def step(state: GaussianTState, K: jnp.ndarray, R: jnp.ndarray,
             T: jnp.ndarray, target: jnp.ndarray):
        cam = Camera(H, W, K, R, T, znear, zfar)
        pool = state.pool
        m2z = jnp.zeros((pool.cap, 2), jnp.float32)

        def loss_fn(params, m2z):
            p = pool._replace(params=params)
            out = render_gaussiant(p, cam, cfg, means2d_zero=m2z)
            l1 = jnp.mean(jnp.abs(out.rgb - target))
            s = ssim(out.rgb, target)
            loss = (1.0 - cfg.ssim_weight) * l1 + cfg.ssim_weight * (1.0 - s)
            return loss, out

        (loss, out), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(pool.params, m2z)
        g_params, g_m2z = grads

        lr_tree = lr_tree_for(state.opt.step, lr)
        new_params, new_opt = sparse_adam_update(
            pool.params, g_params, state.opt, lr_tree
        )
        stats = accumulate_stats(
            pool.stats, g_m2z, out.radii > 0,
            weight=out.wet, radii=out.radii,
        )
        new_pool = pool._replace(params=new_params, stats=stats)
        psnr = -10.0 * jnp.log10(jnp.mean((out.rgb - target) ** 2) + 1e-10)
        return (
            GaussianTState(new_pool, new_opt),
            dict(loss=loss, psnr=psnr, n_pts=new_pool.n_active),
        )

    return step


def gaussiant_maintenance(state: GaussianTState, iteration: int,
                          cfg: GaussianTConfig, dcfg: DensifyConfig,
                          key: jax.Array) -> GaussianTState:
    """Host-dispatched schedule: SH ramp, densify/prune, opacity reset
    (GaussianTSampler.update_gaussians semantics)."""
    pool, opt = state.pool, state.opt
    if iteration > 0 and iteration % cfg.oneup_sh_every == 0:
        pool = oneup_sh_degree(pool)
    if (cfg.densify_from_iter <= iteration < cfg.densify_until_iter
            and iteration % cfg.densification_interval == 0):
        pool, mu_nu = densify_and_prune(pool, (opt.mu, opt.nu), dcfg, key)
        opt = AdamState(mu_nu[0], mu_nu[1], opt.step)
    if iteration > 0 and iteration % cfg.opacity_reset_interval == 0:
        pool, mu_nu = reset_opacity(pool, (opt.mu, opt.nu))
        opt = AdamState(mu_nu[0], mu_nu[1], opt.step)
    return GaussianTState(pool, opt)
