"""NeuS model family: SDF field + unbiased surface volume rendering.

TPU-native counterpart of the reference's SDF stack
(/root/reference/easyvolcap/models/networks/neus_network.py +
configs/models/{neus-facto,neus-smt}.yaml + the eikonal/curvature
supervisors under models/supervisors/geometry_supervisor.py):

- SDF field: PE-embedded MLP -> (sdf, geometry feature); normals by
  autodiff (`jax.grad` through the field — exact, no finite differences).
- NeuS rendering (Wang et al. 2021): opaque-density alpha from the CDF of
  the logistic distribution over section SDFs,
    alpha_i = clip((sig(s*f_i) - sig(s*f_{i+1})) / sig(s*f_i), 0, 1),
  with a single learnable sharpness `inv_s` (variance network).
- Color head conditioned on (position feature, view direction, normal).
- Losses: photometric L2 + eikonal |grad|-1 regularizer.

Functional + jittable over ray batches (the n_rays=512 regime).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.models.embedders import pe_dim, positional_encoding
from envgs_tpu.models.regressors import MLP
from envgs_tpu.models.nerf import uniform_z_vals


class NeusConfig(NamedTuple):
    xyz_freqs: int = 6
    dir_freqs: int = 4
    width: int = 128
    depth: int = 4
    feat_dim: int = 64
    color_width: int = 64
    n_samples: int = 48
    init_inv_s: float = 3.0  # exp param: inv_s = exp(10 * s_param)
    eikonal_weight: float = 0.1
    bg_brightness: float = 0.0

    @property
    def sdf_net(self) -> MLP:
        return MLP(pe_dim(3, self.xyz_freqs), self.width, self.depth,
                   1 + self.feat_dim, skips=(2,))

    @property
    def rgb_net(self) -> MLP:
        return MLP(self.feat_dim + pe_dim(3, self.dir_freqs) + 3,
                   self.color_width, 2, 3, skips=(), out_actvn="sigmoid")

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return dict(
            sdf=self.sdf_net.init(k1),
            rgb=self.rgb_net.init(k2),
            s_param=jnp.asarray(self.init_inv_s / 10.0, jnp.float32),
        )


def sdf_fn(cfg: NeusConfig, params, x):
    """x (..., 3) -> (sdf (...,), feat (..., F))."""
    out = cfg.sdf_net(params["sdf"], positional_encoding(x, cfg.xyz_freqs))
    return out[..., 0], out[..., 1:]


def sdf_grad(cfg: NeusConfig, params, x):
    """Autodiff normals: (..., 3) -> (..., 3) = d sdf / d x."""
    g = jax.grad(lambda p: jnp.sum(sdf_fn(cfg, params, p)[0]))
    return g(x)


def neus_alpha(sdf_vals, inv_s):
    """Section-CDF alpha (NeuS eq. 13): sdf_vals (..., S) -> (..., S-1)."""
    prev = jax.nn.sigmoid(sdf_vals[..., :-1] * inv_s)
    nxt = jax.nn.sigmoid(sdf_vals[..., 1:] * inv_s)
    return jnp.clip((prev - nxt) / jnp.clip(prev, 1e-6, None), 0.0, 1.0)


def render_rays_neus(cfg: NeusConfig, params, ray_o, ray_d, near, far,
                     key=None):
    """ray_o/ray_d (P, 3) (d normalized) -> dict(rgb_map, dpt_map, acc_map,
    normal_map, eikonal, sdf_vals)."""
    z_vals = uniform_z_vals(near, far, cfg.n_samples, key)  # (P, S)
    pts = ray_o[:, None, :] + z_vals[..., None] * ray_d[:, None, :]
    sdf_vals, feat = sdf_fn(cfg, params, pts)  # (P, S), (P, S, F)
    grad = sdf_grad(cfg, params, pts)  # (P, S, 3)
    normal = grad / jnp.clip(
        jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-6, None)

    inv_s = jnp.exp(10.0 * params["s_param"])
    alpha = neus_alpha(sdf_vals, inv_s)  # (P, S-1)
    trans = jnp.cumprod(1.0 - alpha + 1e-7, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1)
    weights = alpha * trans  # (P, S-1)

    dirs = positional_encoding(ray_d, cfg.dir_freqs)[:, None, :]
    dirs = jnp.broadcast_to(dirs, (*feat.shape[:2], dirs.shape[-1]))
    rgb = cfg.rgb_net(
        params["rgb"], jnp.concatenate([feat, dirs, normal], -1)
    )  # (P, S, 3)

    z_mid = 0.5 * (z_vals[..., :-1] + z_vals[..., 1:])
    acc = jnp.sum(weights, -1)
    rgb_map = jnp.sum(weights[..., None] * rgb[:, :-1], -2)
    rgb_map = rgb_map + (1.0 - acc[..., None]) * cfg.bg_brightness
    dpt = jnp.sum(weights * z_mid, -1) / jnp.clip(acc, 1e-6, None)
    n_map = jnp.sum(weights[..., None] * normal[:, :-1], -2)
    eik = jnp.mean(
        (jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2)
    return dict(rgb_map=rgb_map, dpt_map=dpt, acc_map=acc,
                normal_map=n_map, eikonal=eik, sdf_vals=sdf_vals,
                inv_s=inv_s)


def make_neus_train_step(cfg: NeusConfig, lr: float = 5e-4):
    """Jitted ray-batch step: rgb L2 + eikonal_weight * eikonal."""
    import optax

    opt = optax.adam(lr)

    def init(key):
        params = cfg.init(key)
        return params, opt.init(params)

    @jax.jit
    def step(params, opt_state, ray_o, ray_d, near, far, target, key):
        def loss_fn(p):
            out = render_rays_neus(cfg, p, ray_o, ray_d, near, far, key)
            rgb_l = jnp.mean((out["rgb_map"] - target) ** 2)
            return rgb_l + cfg.eikonal_weight * out["eikonal"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        psnr = -10.0 * jnp.log10(
            jnp.mean((out["rgb_map"] - target) ** 2) + 1e-10)
        return params, opt_state, dict(loss=loss, psnr=psnr,
                                       eikonal=out["eikonal"])

    return init, step
