"""Spacetime Gaussians (STGS / FDGS — the dynamic-3DGS family).

TPU-native redesign of the reference STGS model
(/root/reference/easyvolcap/utils/stgs_utils.py:63-661 and the fdgs render
helper at easyvolcap/utils/gaussian_utils.py:110-150): a fixed-capacity
padded 3D-Gaussian pool extended with per-splat temporal parameters —
temporal center `t`, log temporal scale `scaling_t`, and a linear `motion`
velocity. A query at time tt renders the splat at

    xyz(tt) = xyz + motion * (tt - t)                 (linear motion model)
    opacity(tt) = sigmoid(opacity) * exp(-0.5 ((tt - t) / s_t)^2)

(the temporal radial-basis marginal, stgs_utils.py:209-210) through the
shared gauss3d EWA tile kernel — one jitted render/train step over static
shapes instead of the reference's per-module CUDA rasterizer dispatch.

Maintenance (clone/split/prune/budget) reuses the masked-pool machinery:
the temporal columns ride GaussianParams as optional fields, so children
copy them structurally (reference: stgs_utils.py:387-523) and the sparse
Adam update covers them through the same pytree. `reset_t` clamps temporal
centers back into the sequence window (stgs_utils.py:313-317).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.gaussians import (
    DensifyConfig,
    GaussianPool,
    create_pool,
    densify_and_prune,
    sh_degree_mask,
    sigmoid,
)
from envgs_tpu.ops.raster3d import Raster3DOutput, render_gaussians3d
from envgs_tpu.train.optimizer import (
    AdamState,
    LRConfig,
    init_adam,
    lr_tree_for,
    sparse_adam_update,
)
from envgs_tpu.utils.camera import Camera
from envgs_tpu.utils.sh import eval_sh_4d, eval_sh_color


class STGSConfig(NamedTuple):
    sh_degree: int = 3
    # temporal SH degree: 0 = static 3D SH; k > 0 adds k cosine temporal
    # harmonics per spatial block (eval_shfs_4d, sh_utils.py:731-1097) for
    # time-varying appearance
    sh_degree_t: int = 0
    init_opacity: float = 0.1
    init_scale_t: float = 0.1414  # stgs_utils.py:72 default
    duration: float = 1.0  # sequence time span (t normalized to [0, 1])
    bg_brightness: float = 0.0
    raster_backend: str = "pallas"
    pair_cap: int = 2 ** 21
    scale_modifier: float = 1.0
    # losses
    lambda_dssim: float = 0.2


def init_stgs_pool(xyz: np.ndarray, times: np.ndarray,
                   colors: np.ndarray | None, cap: int,
                   cfg: STGSConfig) -> GaussianPool:
    """create_from_pcd semantics (stgs_utils.py:228-275): 3D scales from
    NN distances, zero motion, constant temporal scale."""
    return create_pool(
        xyz, colors, cap=cap, sh_degree=cfg.sh_degree,
        init_opacity=cfg.init_opacity, scale_axes=3,
        times=times, init_scale_t=cfg.init_scale_t,
        sh_degree_t=cfg.sh_degree_t,
    )


def splats_at_time(pool: GaussianPool, tt: jnp.ndarray):
    """-> (xyz_t (P,3), opacity_t (P,)) at query time tt (scalar)."""
    p = pool.params
    dt = tt - p.t[:, 0]  # (P,)
    xyz_t = p.xyz + p.motion * dt[:, None]
    marginal = jnp.exp(-0.5 * (dt / jnp.exp(p.scaling_t[:, 0])) ** 2)
    opacity_t = sigmoid(p.opacity[:, 0]) * marginal
    return xyz_t, opacity_t


def render_stgs(pool: GaussianPool, cam: Camera, tt: jnp.ndarray,
                cfg: STGSConfig,
                means2d_zero: jnp.ndarray | None = None) -> Raster3DOutput:
    """Render one view at time tt (render_fdgs output contract)."""
    xyz_t, opacity_t = splats_at_time(pool, tt)
    dirs = xyz_t - cam.center[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-8)
    smask = sh_degree_mask(pool.stats.sh_degree, pool.max_sh_degree)
    if cfg.sh_degree_t > 0:
        # 4D SH: per-splat time offset from the temporal center, period =
        # the sequence duration (eval_shfs_4d contract)
        feats = pool.get_features * jnp.tile(
            smask, cfg.sh_degree_t + 1)[None, :, None]
        dt = tt - pool.params.t[:, 0]
        colors = jnp.clip(
            eval_sh_4d(pool.max_sh_degree, cfg.sh_degree_t,
                       jnp.swapaxes(feats, 1, 2), dirs, dt,
                       l=cfg.duration) + 0.5, 0.0, None)
    else:
        feats = pool.get_features * smask[None, :, None]
        colors = eval_sh_color(pool.max_sh_degree,
                               jnp.swapaxes(feats, 1, 2), dirs)
    return render_gaussians3d(
        xyz_t, pool.params.rotation, pool.get_scaling, opacity_t, colors,
        cam, bg_color=cfg.bg_brightness, backend=cfg.raster_backend,
        pair_cap=cfg.pair_cap, scale_modifier=cfg.scale_modifier,
        active=pool.stats.active, means2d_zero=means2d_zero,
    )


def reset_t(pool: GaussianPool, adam: AdamState, tmin: float = 0.0,
            tmax: float = 1.0):
    """Clamp temporal centers into the sequence window and zero their Adam
    moments (stgs_utils.py:313-317 + replace_tensor_to_optimizer)."""
    new_t = jnp.clip(pool.params.t, tmin, tmax)
    pool = pool._replace(params=pool.params._replace(t=new_t))
    mu = adam.mu._replace(t=jnp.zeros_like(adam.mu.t))
    nu = adam.nu._replace(t=jnp.zeros_like(adam.nu.t))
    return pool, adam._replace(mu=mu, nu=nu)


class STGSState(NamedTuple):
    pool: GaussianPool
    opt: AdamState


def init_stgs_state(pool: GaussianPool) -> STGSState:
    return STGSState(pool, init_adam(pool.params))


def stgs_lr_config(spatial_scale: float = 1.0,
                   duration: float = 1.0) -> LRConfig:
    """Reference LR schedulers scale xyz/motion by the scene's spatial
    extent and t by half the duration (stgs_utils.py:120-145)."""
    return LRConfig(
        spatial_scale=spatial_scale,
        t=0.0001 * 0.5 * duration,
        scaling_t=0.002,
        motion=0.00016 * spatial_scale,
        use_opacity_pulse=False,
    )


def make_stgs_train_step(cfg: STGSConfig, cam_template: Camera,
                         lr_cfg: LRConfig, donate: bool = True):
    """Jitted (state, K, R, T, tt, gt, it) -> (state, stats) step."""
    from envgs_tpu.models.gaussians import accumulate_stats
    from envgs_tpu.ops.losses import ssim

    H, W = cam_template.H, cam_template.W
    znear, zfar = cam_template.znear, cam_template.zfar

    def step(state: STGSState, K, R, T, tt, gt, it):
        pool = state.pool
        m2z = jnp.zeros((pool.cap, 2))

        def loss_fn(params, m2z):
            cam = Camera(H, W, K, R, T, znear, zfar)
            p = pool._replace(params=params)
            out = render_stgs(p, cam, tt, cfg, means2d_zero=m2z)
            l1 = jnp.mean(jnp.abs(out.rgb - gt))
            loss = (1.0 - cfg.lambda_dssim) * l1 + cfg.lambda_dssim * (
                1.0 - ssim(out.rgb, gt))
            return loss, out

        (loss, out), (g_params, g_m2z) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(pool.params, m2z)
        new_params, opt = sparse_adam_update(
            pool.params, g_params, state.opt, lr_tree_for(it, lr_cfg))
        stats = accumulate_stats(pool.stats, g_m2z, out.radii > 0,
                                 weight=out.wet, radii=out.radii)
        new_state = STGSState(
            pool._replace(params=new_params, stats=stats), opt)
        return new_state, {"loss": loss, "n_active": pool.n_active}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def stgs_maintenance(state: STGSState, cfg: DensifyConfig,
                     key: jax.Array) -> STGSState:
    pool, adam = densify_and_prune(state.pool, state.opt, cfg, key)
    return STGSState(pool, adam)


# ---------------------------------------------------------------------------
# 4D gaussian ply IO (convert_fdgs_pcd.py layout: trbf_center/trbf_scale +
# motion_* columns alongside the standard 3DGS fields)
# ---------------------------------------------------------------------------

def save_stgs_ply(pool: GaussianPool, path: str):
    from envgs_tpu.utils.ply import write_ply

    idx = np.nonzero(np.asarray(pool.stats.active))[0]
    p = pool.params
    arrays = {}
    xyz = np.asarray(p.xyz)[idx]
    for i, k in enumerate("xyz"):
        arrays[k] = xyz[:, i]
    arrays["trbf_center"] = np.asarray(p.t)[idx][:, 0]
    arrays["trbf_scale"] = np.asarray(p.scaling_t)[idx][:, 0]
    for i, k in enumerate(("nx", "ny", "nz")):
        arrays[k] = np.zeros(len(idx), np.float32)
    mot = np.asarray(p.motion)[idx]
    for i in range(3):
        arrays[f"motion_{i}"] = mot[:, i]
    f_dc = np.asarray(p.features_dc)[idx]  # (P, 1, 3)
    for i in range(3):
        arrays[f"f_dc_{i}"] = f_dc[:, 0, i]
    arrays["opacity"] = np.asarray(p.opacity)[idx][:, 0]
    scal = np.asarray(p.scaling)[idx]
    for i in range(scal.shape[1]):
        arrays[f"scale_{i}"] = scal[:, i]
    rot = np.asarray(p.rotation)[idx]
    for i in range(4):
        arrays[f"rot_{i}"] = rot[:, i]
    write_ply(path, arrays)


def load_stgs_ply(path: str, cap: int, cfg: STGSConfig) -> GaussianPool:
    from envgs_tpu.utils.ply import read_ply

    d = read_ply(path)
    P = len(d["x"])
    xyz = np.stack([d["x"], d["y"], d["z"]], -1).astype(np.float32)
    pool = init_stgs_pool(xyz, d["trbf_center"].astype(np.float32), None,
                          cap, cfg)

    def pad(a):
        a = np.asarray(a, np.float32)
        return np.pad(a, [(0, cap - P)] + [(0, 0)] * (a.ndim - 1))

    f_dc = np.stack([d[f"f_dc_{i}"] for i in range(3)], -1)[:, None, :]
    params = pool.params._replace(
        xyz=jnp.asarray(pad(xyz)),
        features_dc=jnp.asarray(pad(f_dc)),
        opacity=jnp.asarray(pad(d["opacity"][:, None])),
        scaling=jnp.asarray(pad(np.stack(
            [d[f"scale_{i}"] for i in range(3)], -1))),
        rotation=jnp.asarray(pad(np.stack(
            [d[f"rot_{i}"] for i in range(4)], -1))),
        t=jnp.asarray(pad(d["trbf_center"][:, None])),
        scaling_t=jnp.asarray(pad(d["trbf_scale"][:, None])),
        motion=jnp.asarray(pad(np.stack(
            [d[f"motion_{i}"] for i in range(3)], -1))),
    )
    return pool._replace(params=params)
