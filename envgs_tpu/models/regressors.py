"""Output regressors for the NeRF model family (pure JAX).

TPU-native counterparts of /root/reference/easyvolcap/models/networks/
regressors/:

- `MLP` — MlpRegressor: width/depth MLP with optional skip connections,
  configurable output activation. Flattened (rays*samples, D) batches keep
  the matmuls large for the MXU.
- `split_regressor_apply` — SplitRegressor: geometry head -> (density,
  feature), appearance head consumes [feature, dir_embed] -> rgb.
- `spherical_harmonics_apply` — SphericalHarmonics: predicted SH
  coefficients evaluated at view directions (spherical_harmonics.py).
- `contract` — ContractRegressor (mipnerf-360 scene contraction).
- `se3_apply` — SE3Regressor semantics live in models/camera_opt.py
  (exp-map residuals); re-exported here for registry parity.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from envgs_tpu.models.camera_opt import so3_exp  # noqa: F401 (SE3 parity)
from envgs_tpu.utils.sh import eval_sh_color


class MLP(NamedTuple):
    """Static MLP config; params via init(), forward via apply()."""

    in_dim: int
    width: int = 256
    depth: int = 8
    out_dim: int = 4
    skips: tuple = (4,)
    out_actvn: str = "none"  # none | sigmoid | relu | softplus

    def init(self, key) -> list:
        params = []
        d = self.in_dim
        for i in range(self.depth):
            key, k = jax.random.split(key)
            din = d + (self.in_dim if i in self.skips else 0)
            w = jax.random.normal(k, (din, self.width)) * jnp.sqrt(2.0 / din)
            params.append((w, jnp.zeros((self.width,))))
            d = self.width
        key, k = jax.random.split(key)
        w = jax.random.normal(k, (d, self.out_dim)) * jnp.sqrt(1.0 / d)
        params.append((w, jnp.zeros((self.out_dim,))))
        return params

    def __call__(self, params: list, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        for i in range(self.depth):
            if i in self.skips and i > 0:
                h = jnp.concatenate([h, x], axis=-1)
            w, b = params[i]
            h = jax.nn.relu(h @ w + b)
        w, b = params[self.depth]
        out = h @ w + b
        if self.out_actvn == "sigmoid":
            out = jax.nn.sigmoid(out)
        elif self.out_actvn == "relu":
            out = jax.nn.relu(out)
        elif self.out_actvn == "softplus":
            out = jax.nn.softplus(out)
        elif self.out_actvn == "tanh":
            out = jnp.tanh(out)
        return out


class SplitRegressor(NamedTuple):
    """Geometry MLP -> (density, feature); color MLP([feat, dir]) -> rgb.

    SplitRegressor semantics (split_regressor.py): the first output channel
    of the geometry head is density (softplus), the rest is a feature that
    conditions the view-dependent color head.
    """

    xyz_dim: int
    dir_dim: int
    width: int = 256
    depth: int = 8
    feat_dim: int = 256
    color_width: int = 128
    color_depth: int = 2

    @property
    def geo(self) -> MLP:
        return MLP(self.xyz_dim, self.width, self.depth, 1 + self.feat_dim)

    @property
    def rgb(self) -> MLP:
        return MLP(self.feat_dim + self.dir_dim, self.color_width,
                   self.color_depth, 3, skips=(), out_actvn="sigmoid")

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return dict(geo=self.geo.init(k1), rgb=self.rgb.init(k2))

    def density(self, params, xyz_feat):
        out = self.geo(params["geo"], xyz_feat)
        return jax.nn.softplus(out[..., 0] - 1.0), out[..., 1:]

    def __call__(self, params, xyz_feat, dir_feat):
        sigma, feat = self.density(params, xyz_feat)
        rgb = self.rgb(params["rgb"], jnp.concatenate([feat, dir_feat], -1))
        return rgb, sigma


def spherical_harmonics_apply(sh_coeffs: jnp.ndarray, dirs: jnp.ndarray,
                              deg: int) -> jnp.ndarray:
    """(..., 3, (deg+1)^2) coeffs + (..., 3) dirs -> (..., 3) rgb in [0, 1]
    (spherical_harmonics.py: sigmoid-squashed SH evaluation)."""
    return jax.nn.sigmoid(eval_sh_color(deg, sh_coeffs, dirs))


def contract(x: jnp.ndarray, radius: float = 1.0) -> jnp.ndarray:
    """mipnerf-360 contraction (contract_regressor.py): points beyond
    `radius` map to the [radius, 2*radius) shell."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True) / radius
    return jnp.where(n <= 1.0, x, (2.0 - 1.0 / n) * x / n)
