"""Nearest-neighbor scale initialization.

TPU-native replacement for simple-knn's distCUDA2 (mean squared distance to
the 3 nearest neighbors; call-site contract at
/root/reference/easyvolcap/utils/gaussian2d_utils.py:430-443): a blocked
pairwise-distance top-k in JAX for on-device use, plus a host-side KD-tree
fast path for large point clouds (used once at init).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mean_sq_dist3_jax(xyz: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """(P, 3) -> (P,) mean of squared distances to the 3 nearest neighbors.

    Blocked O(P^2) — fine up to ~1e5 points; larger inits go through
    mean_sq_dist3 (host KD-tree).
    """
    P = xyz.shape[0]
    pad = (-P) % block
    pts = jnp.pad(xyz, ((0, pad), (0, 0)), constant_values=1e9)

    def chunk_fn(chunk):
        # (B, P') squared distances from this chunk to all points
        d2 = jnp.sum((chunk[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        # 4 smallest include the self-distance 0
        neg_top4 = jax.lax.top_k(-d2, 4)[0]
        return -jnp.sum(neg_top4[:, 1:], axis=-1) / 3.0

    chunks = pts.reshape(-1, block, 3)
    out = jax.lax.map(chunk_fn, chunks).reshape(-1)
    return out[:P]


def mean_sq_dist3(xyz: np.ndarray) -> np.ndarray:
    """Host-side KD-tree version (numpy in/out)."""
    try:
        from scipy.spatial import cKDTree

        tree = cKDTree(xyz)
        d, _ = tree.query(xyz, k=4)
        return (d[:, 1:] ** 2).mean(axis=-1)
    except Exception:
        return np.asarray(mean_sq_dist3_jax(jnp.asarray(xyz)))


def init_scales_from_dist(xyz: np.ndarray) -> np.ndarray:
    """Initial log-scales (P, 2) = log(sqrt(clamp(d2, 1e-7))) on both axes."""
    d2 = np.clip(mean_sq_dist3(np.asarray(xyz, np.float32)), 1e-7, None)
    s = np.log(np.sqrt(d2))
    return np.repeat(s[:, None], 2, axis=-1).astype(np.float32)
