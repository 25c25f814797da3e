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


def empty_regressor(feat: jnp.ndarray) -> jnp.ndarray:
    """Zero-width output (empty_regressor.py)."""
    return jnp.zeros((*feat.shape[:-1], 0), feat.dtype)


def noop_regressor(feat: jnp.ndarray) -> jnp.ndarray:
    """Identity passthrough (noop_regressor.py)."""
    return feat


def zero_regressor(feat: jnp.ndarray, out_dim: int = 3) -> jnp.ndarray:
    """Constant zeros (zero_regressor.py)."""
    return jnp.zeros((*feat.shape[:-1], out_dim), feat.dtype)


class DisplacementRegressor(NamedTuple):
    """Scaled-MLP displacement head (displacement_regressor.py:12-43):
    dxyz = scale * MLP(feat); zero_canonical zeroes the offset where
    t == 0 (the canonical frame of a deformation field)."""

    in_dim: int
    out_dim: int = 3
    width: int = 256
    depth: int = 8
    scale: float = 0.15
    zero_canonical: bool = False

    @property
    def mlp(self) -> MLP:
        return MLP(self.in_dim, self.width, self.depth, self.out_dim,
                   skips=(), out_actvn="tanh")

    def init(self, key):
        return self.mlp.init(key)

    def __call__(self, params, feat: jnp.ndarray,
                 t: jnp.ndarray | None = None) -> jnp.ndarray:
        dxyz = self.mlp(params, feat) * self.scale
        if self.zero_canonical and t is not None:
            tb = jnp.broadcast_to(
                jnp.asarray(t, feat.dtype), dxyz.shape[:-1])[..., None]
            dxyz = jnp.where(tb == 0.0, 0.0, dxyz)
        return dxyz


class ResidualRegressor(NamedTuple):
    """cat([feat, relu-MLP(feat)]) (residual_regressor.py:13-26); the MLP's
    out_dim defaults to in_dim to mirror the reference's same-shape
    assertion."""

    in_dim: int
    width: int = 256
    depth: int = 2
    out_dim: int | None = None

    @property
    def mlp(self) -> MLP:
        return MLP(self.in_dim, self.width, self.depth,
                   self.out_dim or self.in_dim, skips=(), out_actvn="relu")

    def init(self, key):
        return self.mlp.init(key)

    def __call__(self, params, feat: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([feat, self.mlp(params, feat)], axis=-1)


def se3_exp_rt(screw: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential map of a (..., 6) screw = (v translation-log; w
    rotation-log) -> (..., 6) rt = (axis-angle r, translation t) — the
    screw2rt contract of the reference (blend_utils.py:277-280 via
    pytorch3d se3_exp_map). t = V(w) v with V the left-Jacobian of SO(3);
    the rotation log IS its axis-angle. Taylor-safe at w = 0."""
    v, w = screw[..., :3], screw[..., 3:]
    t2 = jnp.sum(w * w, axis=-1, keepdims=True)
    small = t2 < 1e-12
    t2s = jnp.where(small, 1.0, t2)
    th = jnp.sqrt(t2s)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / t2s)
    Cc = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                   (th - jnp.sin(th)) / (t2s * th))
    wxv = jnp.cross(w, v)
    wxwxv = jnp.cross(w, wxv)
    t = v + B * wxv + Cc * wxwxv
    return jnp.concatenate([w, t], axis=-1)


class SE3Regressor(NamedTuple):
    """MLP -> screw -> exp-map rt (se3_regressor.py:12-46): xavier body,
    near-zero head so the field starts at identity; output is the
    (axis-angle, translation) 6-vector per point."""

    in_dim: int
    width: int = 256
    depth: int = 8

    @property
    def mlp(self) -> MLP:
        return MLP(self.in_dim, self.width, self.depth, 6, skips=())

    def init(self, key):
        params = self.mlp.init(key)
        w, b = params[-1]
        params[-1] = (w * 1e-4, b)  # near-identity start (U(0, 1e-4) head)
        return params

    def __call__(self, params, feat: jnp.ndarray) -> jnp.ndarray:
        return se3_exp_rt(self.mlp(params, feat))


class ImageBasedRegressor(NamedTuple):
    """Learned softmax blend of per-source colors
    (image_based_regressor.py:38-70): an MLP scores cat([geo_feat,
    src_feat]) per source, softmax over the source axis weights the source
    rgbs. src_feat (S, ..., C) carries rgb in its trailing 3 channels
    (the `use_dir=False` layout)."""

    geo_dim: int
    src_dim: int
    width: int = 64
    depth: int = 1

    @property
    def mlp(self) -> MLP:
        return MLP(self.geo_dim + self.src_dim, self.width, self.depth, 1,
                   skips=())

    def init(self, key):
        return self.mlp.init(key)

    def __call__(self, params, geo_feat: jnp.ndarray,
                 src_feat: jnp.ndarray) -> jnp.ndarray:
        S = src_feat.shape[0]
        g = jnp.broadcast_to(geo_feat[None],
                             (S, *geo_feat.shape))  # (S, ..., G)
        logits = self.mlp(params, jnp.concatenate([g, src_feat], -1))
        bw = jax.nn.softmax(logits, axis=0)  # (S, ..., 1)
        rgb = jnp.sum(src_feat[..., -3:] * bw, axis=0)
        return jax.nn.sigmoid(rgb)


class ImageBasedSphericalHarmonics(NamedTuple):
    """IBR base color + SH specular residual
    (image_based_spherical_harmonics.py:53-96): softmax-blended source rgb
    plus tanh(eval_sh(sh_mlp(xyz_feat), dir)) * resd_limit, clipped."""

    xyz_dim: int
    src_dim: int
    sh_deg: int = 2
    resd_limit: float = 0.25
    width: int = 64
    depth: int = 1

    @property
    def blend(self) -> ImageBasedRegressor:
        return ImageBasedRegressor(self.xyz_dim, self.src_dim, self.width,
                                   self.depth)

    @property
    def sh_mlp(self) -> MLP:
        from envgs_tpu.utils.sh import num_sh_coeffs

        return MLP(self.xyz_dim, self.width, self.depth,
                   3 * num_sh_coeffs(self.sh_deg), skips=())

    def init(self, key):
        kb, ks = jax.random.split(key)
        return dict(blend=self.blend.init(kb), sh=self.sh_mlp.init(ks))

    def __call__(self, params, xyz_feat: jnp.ndarray, src_feat: jnp.ndarray,
                 dirs: jnp.ndarray) -> jnp.ndarray:
        from envgs_tpu.utils.sh import eval_sh, num_sh_coeffs

        S = src_feat.shape[0]
        g = jnp.broadcast_to(xyz_feat[None], (S, *xyz_feat.shape))
        logits = self.blend.mlp(
            params["blend"], jnp.concatenate([g, src_feat], -1))
        bw = jax.nn.softmax(logits, axis=0)
        rgb = jnp.sum(src_feat[..., -3:] * bw, axis=0)  # raw blend (no sigmoid
        # here: reference blends source COLORS directly, out_actvn identity)
        sh = self.sh_mlp(params["sh"], xyz_feat)
        sh = sh.reshape(*sh.shape[:-1], 3, num_sh_coeffs(self.sh_deg))
        resd = jnp.tanh(eval_sh(self.sh_deg, sh, dirs)) * self.resd_limit
        return jnp.clip(rgb + resd, 0.0, 1.0)
