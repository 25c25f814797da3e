"""Coordinate embedders for the NeRF model family (pure JAX).

TPU-native counterparts of the reference's embedder zoo
(/root/reference/easyvolcap/models/networks/embedders/):

- `positional_encoding` — PositionalEncodingEmbedder (NeRF Fourier features),
  with the AnnealPositionalEncodingEmbedder's coarse-to-fine window.
- `HashEmbedder` — multiresolution hash grid (iNGP; hash_embedder.py /
  tcnn_hash_embedder.py): per-level feature tables, trilinear interpolation
  of 8 hashed corners. Gathers are batched per level so XLA emits a few
  large gathers instead of per-point loops.
- `LatentCodeEmbedder` — per-frame learned latent (latent_code_embedder.py).
- `ComposedXyztEmbedder` — xyz embedder + t embedder concatenation
  (composed_xyzt_embedder.py).
- `empty_embedder` / `noop_embedder` semantics come free (lambda x: x or
  zero-width outputs).

Everything is functional: `init_*` returns a param pytree, `*_apply` is
jittable and differentiable.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def positional_encoding(x: jnp.ndarray, n_freqs: int = 10,
                        include_input: bool = True,
                        alpha: float | jnp.ndarray | None = None) -> jnp.ndarray:
    """NeRF Fourier features: [x, sin(2^k x), cos(2^k x)], k < n_freqs.

    `alpha` in [0, n_freqs] applies the coarse-to-fine annealing window
    (anneal_position_encoding_embedder.py): frequency k is weighted by
    (1 - cos(pi clamp(alpha - k, 0, 1))) / 2.
    """
    if n_freqs == 0:
        return x
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=jnp.float32)
    xb = x[..., None, :] * freqs[:, None]  # (..., L, D)
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)  # (..., L, 2D)
    if alpha is not None:
        k = jnp.arange(n_freqs, dtype=jnp.float32)
        w = (1.0 - jnp.cos(
            jnp.pi * jnp.clip(jnp.asarray(alpha, jnp.float32) - k, 0.0, 1.0)
        )) / 2.0
        enc = enc * w[:, None]
    enc = enc.reshape(*x.shape[:-1], n_freqs * 2 * x.shape[-1])
    return jnp.concatenate([x, enc], axis=-1) if include_input else enc


def pe_dim(in_dim: int, n_freqs: int, include_input: bool = True) -> int:
    return in_dim * (2 * n_freqs + (1 if include_input else 0))


_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


class HashEmbedder(NamedTuple):
    """Static config of a multiresolution hash grid."""

    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    finest_resolution: int = 2048
    bounds: tuple = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    @property
    def resolutions(self) -> np.ndarray:
        b = np.exp(
            (np.log(self.finest_resolution) - np.log(self.base_resolution))
            / max(self.n_levels - 1, 1)
        )
        return np.floor(
            self.base_resolution * b ** np.arange(self.n_levels)
        ).astype(np.int64)

    def init(self, key) -> jnp.ndarray:
        """(L, T, F) feature tables, U(-1e-4, 1e-4) like iNGP."""
        T = 1 << self.log2_hashmap_size
        return jax.random.uniform(
            key, (self.n_levels, T, self.n_features), jnp.float32,
            -1e-4, 1e-4,
        )

    def __call__(self, tables: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """x (..., 3) -> (..., L*F) trilinear hash features."""
        T = 1 << self.log2_hashmap_size
        lo = jnp.asarray(self.bounds[0], jnp.float32)
        hi = jnp.asarray(self.bounds[1], jnp.float32)
        u = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)
        shape = x.shape[:-1]
        u = u.reshape(-1, 3)
        feats = []
        # 8 corner offsets
        corners = jnp.asarray(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            jnp.uint32,
        )
        primes = jnp.asarray(_PRIMES.astype(np.int64)).astype(jnp.uint32)
        for li, res in enumerate(self.resolutions):
            p = u * float(res)
            p0 = jnp.floor(p)
            w = p - p0  # (N, 3)
            cell = p0.astype(jnp.uint32)[:, None, :] + corners[None, :, :]
            idx = (cell * primes[None, None, :]).astype(jnp.uint32)
            h = (idx[..., 0] ^ idx[..., 1] ^ idx[..., 2]) % jnp.uint32(T)
            cf = tables[li][h.astype(jnp.int32)]  # (N, 8, F)
            wc = jnp.stack([
                jnp.where(corners[None, :, d] == 1, w[:, None, d],
                          1.0 - w[:, None, d])
                for d in range(3)
            ], -1).prod(-1)  # (N, 8)
            feats.append(jnp.sum(cf * wc[..., None], axis=1))  # (N, F)
        out = jnp.concatenate(feats, axis=-1)
        return out.reshape(*shape, self.out_dim)


class LatentCodeEmbedder(NamedTuple):
    """Per-frame learned latent code (latent_code_embedder.py)."""

    n_codes: int = 1
    out_dim: int = 8

    def init(self, key) -> jnp.ndarray:
        return jax.random.normal(key, (self.n_codes, self.out_dim)) * 0.01

    def __call__(self, codes: jnp.ndarray, t_idx) -> jnp.ndarray:
        return codes[jnp.asarray(t_idx, jnp.int32)]


def composed_xyzt(xyz_feat: jnp.ndarray, t_feat: jnp.ndarray) -> jnp.ndarray:
    """xyz + time embedding concatenation (composed_xyzt_embedder.py)."""
    t_feat = jnp.broadcast_to(t_feat, (*xyz_feat.shape[:-1], t_feat.shape[-1]))
    return jnp.concatenate([xyz_feat, t_feat], axis=-1)


class KPlanesEmbedder(NamedTuple):
    """K-Planes factored spatio-temporal grid (kplanes_embedder.py /
    configs/models/kplanes.yaml): one 2D feature plane per coordinate pair
    — (xy, xz, yz) for static scenes, plus (xt, yt, zt) with `n_frames` > 1
    — bilinearly interpolated and MULTIPLIED across planes (the Hadamard
    combination of the paper), multiscale levels concatenated."""

    n_features: int = 8
    resolutions: tuple = (64, 128)  # multiscale spatial resolutions
    time_resolution: int = 25
    n_frames: int = 1  # > 1 enables the 3 time planes
    bounds: tuple = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))

    @property
    def spatial_pairs(self):
        return ((0, 1), (0, 2), (1, 2))

    @property
    def out_dim(self) -> int:
        return len(self.resolutions) * self.n_features

    def init(self, key) -> dict:
        params = {}
        for li, res in enumerate(self.resolutions):
            for a, b in self.spatial_pairs:
                key, k = jax.random.split(key)
                # init near 1 so the Hadamard product starts informative
                params[f"l{li}_s{a}{b}"] = 1.0 + 0.1 * jax.random.normal(
                    k, (res, res, self.n_features))
            if self.n_frames > 1:
                for a in range(3):
                    key, k = jax.random.split(key)
                    params[f"l{li}_t{a}"] = 1.0 + 0.1 * jax.random.normal(
                        k, (res, self.time_resolution, self.n_features))
        return params

    @staticmethod
    def _interp2(plane, u, v):
        """plane (R0, R1, F); u/v (...,) in [0, 1] -> (..., F) bilinear."""
        R0, R1 = plane.shape[:2]
        x = u * (R0 - 1)
        y = v * (R1 - 1)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, R0 - 2)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, R1 - 2)
        wx = (x - x0)[..., None]
        wy = (y - y0)[..., None]
        return (
            plane[x0, y0] * (1 - wx) * (1 - wy)
            + plane[x0 + 1, y0] * wx * (1 - wy)
            + plane[x0, y0 + 1] * (1 - wx) * wy
            + plane[x0 + 1, y0 + 1] * wx * wy
        )

    def __call__(self, params: dict, x: jnp.ndarray,
                 t: jnp.ndarray | float = 0.0) -> jnp.ndarray:
        """x (..., 3), t scalar or (...,) in [0, 1] -> (..., out_dim)."""
        lo = jnp.asarray(self.bounds[0], jnp.float32)
        hi = jnp.asarray(self.bounds[1], jnp.float32)
        u = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), x.shape[:-1])
        outs = []
        for li in range(len(self.resolutions)):
            f = jnp.ones((*x.shape[:-1], self.n_features))
            for a, b in self.spatial_pairs:
                f = f * self._interp2(params[f"l{li}_s{a}{b}"],
                                      u[..., a], u[..., b])
            if self.n_frames > 1:
                for a in range(3):
                    f = f * self._interp2(params[f"l{li}_t{a}"],
                                          u[..., a], t)
            outs.append(f)
        return jnp.concatenate(outs, axis=-1)


class DeformationEmbedder(NamedTuple):
    """D-NeRF-style deformation field (configs/models/dnerf.yaml): an MLP
    over (PE(x), PE(t)) predicting a canonical-space offset delta-x; the
    canonical radiance field is evaluated at x + delta-x."""

    xyz_freqs: int = 6
    t_freqs: int = 4
    width: int = 64
    depth: int = 3

    def init(self, key):
        din = pe_dim(3, self.xyz_freqs) + pe_dim(1, self.t_freqs)
        params = []
        d = din
        for _ in range(self.depth):
            key, k = jax.random.split(key)
            params.append((
                jax.random.normal(k, (d, self.width)) * jnp.sqrt(2.0 / d),
                jnp.zeros((self.width,)),
            ))
            d = self.width
        key, k = jax.random.split(key)
        # zero-init the head: identity warp at start (t=0 canonical frame)
        params.append((jnp.zeros((d, 3)), jnp.zeros((3,))))
        return params

    def __call__(self, params, x: jnp.ndarray, t) -> jnp.ndarray:
        """x (..., 3), t scalar/(...) -> warped positions x + delta(x, t)."""
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), x.shape[:-1])
        h = jnp.concatenate([
            positional_encoding(x, self.xyz_freqs),
            positional_encoding(t[..., None], self.t_freqs),
        ], -1)
        for w, b in params[:-1]:
            h = jax.nn.relu(h @ w + b)
        w, b = params[-1]
        return x + (h @ w + b)


def empty_embedder(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-width feature (empty_embedder.py: out_dim = 0)."""
    return jnp.zeros((*x.shape[:-1], 0), x.dtype)


def noop_embedder(x: jnp.ndarray) -> jnp.ndarray:
    """Identity passthrough (noop_embedder.py)."""
    return x


def sh_dir_encoding(dirs: jnp.ndarray, degree: int = 3) -> jnp.ndarray:
    """Spherical-harmonics direction encoding, out_dim = degree^2.

    The reference's TcnnDirEmbedder (tcnn_dir_embedder.py:14-36, tinycudann
    otype=SphericalHarmonics, default degree 3 -> 9 features); here the raw
    real-SH basis of utils/sh.py evaluated at the (assumed unit) dirs —
    pure VPU polynomials, fuses into the consuming MLP's first matmul."""
    from envgs_tpu.utils.sh import sh_basis

    return sh_basis(degree - 1, dirs)


class SpacetimeEmbedder(NamedTuple):
    """Concatenated per-view + per-frame latent codes
    (spacetime_embedder.py:17-48: two LatentCodeEmbedders indexed by the
    batch's view id v and frame id t)."""

    n_views: int = 4
    n_frames: int = 1
    space_dim: int = 8
    time_dim: int = 8

    @property
    def out_dim(self) -> int:
        return self.space_dim + self.time_dim

    def init(self, key) -> dict:
        ks, kt = jax.random.split(key)
        return dict(
            space=LatentCodeEmbedder(self.n_views, self.space_dim).init(ks),
            time=LatentCodeEmbedder(self.n_frames, self.time_dim).init(kt),
        )

    def __call__(self, params: dict, v_idx, t_idx) -> jnp.ndarray:
        s = LatentCodeEmbedder(self.n_views, self.space_dim)(
            params["space"], v_idx)
        t = LatentCodeEmbedder(self.n_frames, self.time_dim)(
            params["time"], t_idx)
        return jnp.concatenate([s, t], axis=-1)


def depth_embedder(xyz: jnp.ndarray, K, R, T,
                   normalize: bool = False) -> jnp.ndarray:
    """Camera-space depth of world points, (..., 1)
    (depth_embedder.py:25-35: project onto the image plane, keep z;
    normalize -> per-cloud standardization)."""
    z = xyz @ R.T[:, 2:3] + T[2]  # (..., 1) third row of R x + T
    if normalize:
        mu = jnp.mean(z, axis=-2, keepdims=True)
        sd = jnp.std(z, axis=-2, keepdims=True)
        z = (z - mu) / jnp.maximum(sd, 1e-8)
    return z


def ibr_embedder(xyz, src_feats, src_cams, agg: str = "meanvar"):
    """Standalone image-based-rendering embedder (reference
    models/embedders/image_based_embedder.py semantics): project world
    points into each source view, bilinearly sample its feature map, and
    aggregate across sources.

    xyz (..., 3) world points; src_feats (S, H, W, C); src_cams list[Camera]
    of length S. agg: "meanvar" -> (..., 2C) [mean, var across sources,
    out-of-frustum sources excluded]; "stack" -> (S, ..., C+1) per-view
    features + inside flag (for learned aggregation downstream).
    """
    import jax.numpy as jnp

    from envgs_tpu.models.enerf import _bilinear, _project

    feats, insides = [], []
    for feat, cam in zip(src_feats, src_cams):
        Hs, Ws = feat.shape[0], feat.shape[1]
        x, y, z = _project(xyz, cam.K, cam.R, cam.T)
        inside = ((z > 1e-6) & (x >= 0) & (x <= Ws - 1)
                  & (y >= 0) & (y <= Hs - 1))
        f = _bilinear(feat, jnp.clip(x, 0, Ws - 1), jnp.clip(y, 0, Hs - 1))
        feats.append(f)
        insides.append(inside)
    F = jnp.stack(feats)  # (S, ..., C)
    M = jnp.stack(insides)[..., None].astype(F.dtype)  # (S, ..., 1)
    if agg == "stack":
        return jnp.concatenate([F, M], axis=-1)
    n = jnp.maximum(M.sum(0), 1.0)
    mean = (F * M).sum(0) / n
    var = ((F - mean) ** 2 * M).sum(0) / n
    return jnp.concatenate([mean, var], axis=-1)
