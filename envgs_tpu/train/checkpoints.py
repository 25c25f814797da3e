"""Checkpoint IO: npz train state + 3DGS ply export/import.

Mirrors the reference conventions (/root/reference/easyvolcap/utils/
net_utils.py:297-523): data/trained_model/<exp>/{N.npz, latest.npz} holding
model+optimizer+step, keep-last-N rotation, latest/epoch selection for
resume, and 3DGS-standard .ply export of both Gaussian sets
(gaussian2d_utils.py:935-1000). npz (flat arrays) replaces torch .pt; pools
are saved COMPACTED (active slots only) and re-padded on load, so capacity
changes between runs are transparent (the reference's shape-adaptive load
hook, gaussian2d_utils.py:469-480).
"""
from __future__ import annotations

import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.gaussians import GaussianParams, GaussianPool, GaussianStats
from envgs_tpu.train.optimizer import AdamState
from envgs_tpu.train.trainer import TrainState
from envgs_tpu.utils.ply import save_gaussian_ply


def _flatten(prefix: str, tree) -> dict:
    out = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        key = prefix + "/".join(
            str(getattr(p, "name", getattr(p, "idx", getattr(p, "key", p))))
            for p in path
        )
        out[key] = np.asarray(leaf)
    return out


def _compact_idx(active: np.ndarray) -> np.ndarray:
    return np.nonzero(active)[0]


def save_checkpoint(path: str, state: TrainState, it: int, keep: int = 3,
                    cam_state=None):
    """Save compacted train state; rotate old epoch files."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {"iter": np.asarray(it)}
    if cam_state is not None:
        arrays.update(_flatten("cam/", cam_state))
    for tag, pool, opt in (
        ("base", state.base, state.opt_base),
        ("env", state.env, state.opt_env),
    ):
        idx = _compact_idx(np.asarray(pool.stats.active))
        for name, arr in pool.params._asdict().items():
            if arr is not None:  # temporal fields absent on static pools
                arrays[f"{tag}/p/{name}"] = np.asarray(arr)[idx]
        for name, arr in pool.stats._asdict().items():
            a = np.asarray(arr)
            arrays[f"{tag}/s/{name}"] = a[idx] if a.ndim else a
        for name, arr in opt.mu._asdict().items():
            if arr is not None:
                arrays[f"{tag}/mu/{name}"] = np.asarray(arr)[idx]
        for name, arr in opt.nu._asdict().items():
            if arr is not None:
                arrays[f"{tag}/nu/{name}"] = np.asarray(arr)[idx]
        arrays[f"{tag}/opt_step"] = np.asarray(opt.step)
        arrays[f"{tag}/max_sh_degree"] = np.asarray(pool.max_sh_degree)
    arrays["key"] = np.asarray(state.key)
    np.savez_compressed(path, **arrays)

    # keep-last-N rotation over numbered checkpoints in the same dir
    d = os.path.dirname(os.path.abspath(path))
    numbered = sorted(
        (f for f in os.listdir(d) if re.fullmatch(r"\d+\.npz", f)),
        key=lambda f: int(f.split(".")[0]),
    )
    for f in numbered[:-keep] if keep > 0 else []:
        os.remove(os.path.join(d, f))


def _pad(arr: np.ndarray, cap: int) -> np.ndarray:
    pad = [(0, cap - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def load_checkpoint(path: str, base_cap: int, env_cap: int,
                    n_views: int | None = None):
    """Load into pools of the given capacities (>= saved active counts).

    Returns (state, iter) — or (state, iter, cam_state_or_None) when
    `n_views` is given (cam_state restored only if saved with a matching
    view count)."""
    z = np.load(path)

    def load_pool(tag, cap):
        n = z[f"{tag}/p/xyz"].shape[0]
        assert n <= cap, f"checkpoint has {n} splats > capacity {cap}"
        params = GaussianParams(**{
            k: jnp.asarray(_pad(z[f"{tag}/p/{k}"], cap))
            for k in GaussianParams._fields if f"{tag}/p/{k}" in z
        })
        stats = {}
        for k in GaussianStats._fields:
            a = z[f"{tag}/s/{k}"]
            stats[k] = jnp.asarray(a if a.ndim == 0 else _pad(a, cap))
        stats = GaussianStats(**stats)
        pool = GaussianPool(params, stats, int(z[f"{tag}/max_sh_degree"]))
        mu = GaussianParams(**{
            k: jnp.asarray(_pad(z[f"{tag}/mu/{k}"], cap))
            for k in GaussianParams._fields if f"{tag}/mu/{k}" in z
        })
        nu = GaussianParams(**{
            k: jnp.asarray(_pad(z[f"{tag}/nu/{k}"], cap))
            for k in GaussianParams._fields if f"{tag}/nu/{k}" in z
        })
        opt = AdamState(mu, nu, jnp.asarray(z[f"{tag}/opt_step"]))
        return pool, opt

    base, opt_base = load_pool("base", base_cap)
    env, opt_env = load_pool("env", env_cap)
    state = TrainState(base, env, opt_base, opt_env, jnp.asarray(z["key"]))
    if n_views is None:
        return state, int(z["iter"])
    cam_state = None
    if "cam/res/se3" in z and z["cam/res/se3"].shape[0] == n_views:
        from envgs_tpu.models.camera_opt import CameraResiduals
        from envgs_tpu.train.trainer import CamOptState

        res = CameraResiduals(jnp.asarray(z["cam/res/se3"]),
                              jnp.asarray(z["cam/res/intr"]))
        mu = CameraResiduals(jnp.asarray(z["cam/opt/mu/se3"]),
                             jnp.asarray(z["cam/opt/mu/intr"]))
        nu = CameraResiduals(jnp.asarray(z["cam/opt/nu/se3"]),
                             jnp.asarray(z["cam/opt/nu/intr"]))
        cam_state = CamOptState(res, AdamState(mu, nu,
                                               jnp.asarray(z["cam/opt/step"])))
    return state, int(z["iter"]), cam_state


def find_latest(model_dir: str) -> str | None:
    """latest.npz, else the highest-numbered N.npz (load_pretrained:297-341)."""
    latest = os.path.join(model_dir, "latest.npz")
    if os.path.exists(latest):
        return latest
    if not os.path.isdir(model_dir):
        return None
    numbered = sorted(
        (f for f in os.listdir(model_dir) if re.fullmatch(r"\d+\.npz", f)),
        key=lambda f: int(f.split(".")[0]),
    )
    return os.path.join(model_dir, numbered[-1]) if numbered else None


def export_ply(pool: GaussianPool, path: str):
    """3DGS-format ply of the active splats (raw parameter values)."""
    idx = _compact_idx(np.asarray(pool.stats.active))
    p = pool.params
    save_gaussian_ply(
        path,
        np.asarray(p.xyz)[idx],
        np.asarray(p.features_dc)[idx],
        np.asarray(p.features_rest)[idx],
        np.asarray(p.opacity)[idx],
        np.asarray(p.scaling)[idx],
        np.asarray(p.rotation)[idx],
    )


def import_ply(path: str, cap: int, sh_degree: int = 3,
               specular_channels: int = 1) -> GaussianPool:
    """Load a 3DGS-format ply into a fresh padded pool."""
    from envgs_tpu.utils.ply import load_gaussian_ply
    from envgs_tpu.models.gaussians import create_pool, logit

    d = load_gaussian_ply(path)
    P = d["xyz"].shape[0]
    pool = create_pool(d["xyz"], None, cap=cap, sh_degree=sh_degree,
                       specular_channels=specular_channels)
    params = pool.params._replace(
        xyz=jnp.asarray(_pad(d["xyz"], cap)),
        features_dc=jnp.asarray(_pad(d["f_dc"], cap)),
        features_rest=jnp.asarray(_pad(d["f_rest"], cap)),
        opacity=jnp.asarray(_pad(d["opacity"], cap)),
        scaling=jnp.asarray(_pad(d["scaling"], cap)),
        rotation=jnp.asarray(_pad(d["rotation"], cap)),
    )
    stats = pool.stats._replace(
        active=jnp.arange(cap) < P,
        sh_degree=jnp.asarray(sh_degree, jnp.int32),
    )
    return pool._replace(params=params, stats=stats)
