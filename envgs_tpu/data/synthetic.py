"""Synthetic reflective scene generator (ground truth from known pools).

Stands in for the reference's real capture datasets (zero-egress image: no
Ref-Real/Shiny-Blender downloads) by building a scene whose TRUE parameters
are known — a specular floor reflecting a colorful environment dome plus
diffuse blobs — and rendering ground-truth images/masks/normals with the
exact pure-JAX reference renderer. End-to-end trainability against these
images validates the same contract the reference validates by "training
PSNR reaches 24-25 dB in 100-200 iterations" (docs/projects/realtime4dv.md).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.envgs import EnvGSConfig, forward_envgs
from envgs_tpu.models.gaussians import GaussianPool, create_pool, logit
from envgs_tpu.utils.camera import Camera, make_camera


def _quat_z_to(n: np.ndarray) -> np.ndarray:
    """(P, 4) wxyz quaternions rotating local +z onto each row of n."""
    n = n / np.clip(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9, None)
    z = np.array([0.0, 0.0, 1.0], np.float32)
    w = 1.0 + n @ z
    xyz = np.cross(np.broadcast_to(z, n.shape), n)
    # antipodal case (n == -z): rotate pi about x
    flip = w < 1e-6
    q = np.concatenate([w[:, None], xyz], axis=-1).astype(np.float32)
    q[flip] = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    return q / np.clip(np.linalg.norm(q, axis=-1, keepdims=True), 1e-9, None)


def make_gt_pools(seed: int = 0, n_floor: int = 900, n_env: int = 512,
                  cap: int | None = None, env_cap: int | None = None,
                  floor_specular: float = 0.55):
    """Ground-truth (base, env) Gaussian pools for the reflective scene."""
    rng = np.random.default_rng(seed)

    # --- base set: specular floor grid at z=0 + diffuse blobs above it ---
    g = int(np.sqrt(n_floor * 2 // 3))
    xs = np.linspace(-2.0, 2.0, g)
    fx, fy = np.meshgrid(xs, xs)
    floor = np.stack([fx.ravel(), fy.ravel(), np.zeros(g * g)], -1)
    spacing = xs[1] - xs[0]
    n_blob = max(n_floor - floor.shape[0], 16)
    centers = np.array([[-0.8, 0.5, 0.45], [0.9, -0.3, 0.35],
                        [0.1, 0.9, 0.6]], np.float32)
    blob = (centers[rng.integers(0, 3, n_blob)]
            + rng.normal(scale=0.18, size=(n_blob, 3))).astype(np.float32)
    blob[:, 2] = np.abs(blob[:, 2] - 0.1) + 0.15
    xyz = np.concatenate([floor, blob]).astype(np.float32)
    P = xyz.shape[0]

    # floor: smooth checker-ish grey; blobs: saturated random colors
    floor_col = 0.35 + 0.15 * np.stack([
        np.sin(2.0 * floor[:, 0]) * np.sin(2.0 * floor[:, 1]),
        np.cos(1.5 * floor[:, 0]),
        np.sin(1.0 * floor[:, 1]),
    ], -1)
    blob_col = rng.random((n_blob, 3)) * 0.8 + 0.2
    colors = np.concatenate([floor_col, blob_col]).astype(np.float32)

    cap = cap or -(-P // 256) * 256
    base = create_pool(xyz, colors, cap=cap, sh_degree=1,
                       init_opacity=0.95, seed=seed)
    quat = np.zeros((cap, 4), np.float32)
    quat[:, 0] = 1.0
    quat[:floor.shape[0]] = _quat_z_to(
        np.broadcast_to(np.array([0, 0, 1.0]), (floor.shape[0], 3)))
    # blobs get random-ish orientations from create_pool's default
    quat[floor.shape[0]:P] = np.asarray(base.params.rotation)[floor.shape[0]:P]
    scal = np.full((cap, 2), np.log(0.5 * spacing), np.float32)
    scal[floor.shape[0]:P] = np.log(0.08)
    spec = np.full((cap, 1), float(logit(jnp.asarray(1e-3))), np.float32)
    spec[:floor.shape[0]] = float(logit(jnp.asarray(floor_specular)))
    base = base._replace(params=base.params._replace(
        rotation=jnp.asarray(quat),
        scaling=jnp.asarray(scal),
        specular=jnp.asarray(spec),
    ))

    # --- env set: colorful dome, normals pointing inward ---
    dirs = rng.normal(size=(n_env, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs[:, 2] = np.abs(dirs[:, 2])  # upper hemisphere
    R_dome = 10.0
    env_xyz = (dirs * R_dome).astype(np.float32)
    env_col = (0.5 + 0.5 * np.stack([
        np.sin(3.0 * dirs[:, 0] + 1.0),
        np.sin(5.0 * dirs[:, 1]),
        np.cos(4.0 * dirs[:, 2]),
    ], -1)).astype(np.float32)
    env_cap = env_cap or -(-n_env // 256) * 256
    env = create_pool(env_xyz, env_col, cap=env_cap, sh_degree=1,
                      init_opacity=0.9, seed=seed + 1)
    # area per splat ~ hemisphere area / n; normals point inward (-dir)
    s = np.sqrt(2 * np.pi * R_dome ** 2 / max(n_env, 1))
    env_n = np.concatenate(
        [-dirs, np.tile([0.0, 0.0, 1.0], (env_cap - n_env, 1))]
    ).astype(np.float32)
    env = env._replace(params=env.params._replace(
        rotation=jnp.asarray(_quat_z_to(env_n)),
        scaling=jnp.full((env_cap, 2), np.log(0.6 * s), jnp.float32),
    ))
    return base, env


def make_cameras(n_views: int, H: int, W: int, radius: float = 3.2,
                 height: float = 1.6, look=(0.0, 0.0, 0.25)) -> list[Camera]:
    """Ring of cameras above the floor looking at the scene center."""
    cams = []
    look = np.asarray(look, np.float64)
    up = np.array([0.0, 0.0, 1.0])
    f = 0.9 * max(H, W)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    for t in np.linspace(0, 2 * np.pi, n_views, endpoint=False):
        c = np.array([radius * np.cos(t), radius * np.sin(t), height])
        fwd = look - c
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, up)
        right = right / np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd]).astype(np.float32)
        T = (-R @ c).astype(np.float32)
        cams.append(make_camera(H, W, K, R, T, 0.02, 60.0))
    return cams


class Scene(NamedTuple):
    cams: list
    images: list  # (H, W, 3) float32 in [0, 1]
    masks: list  # (H, W, 1) float32
    normals: list  # (H, W, 3) [0,1]-encoded VIEW-space normals
    gt_base: GaussianPool
    gt_env: GaussianPool


def make_scene(n_views: int = 12, H: int = 128, W: int = 128,
               seed: int = 0) -> Scene:
    """Render the ground-truth multi-view capture with the exact renderer."""
    base, env = make_gt_pools(seed=seed)
    cams = make_cameras(n_views, H, W)
    cfg = EnvGSConfig(
        raster_backend="ref", tracer_backend="ref",
        reflection_start_iter=0, pair_cap=2 ** 14,
    )
    it = jnp.asarray(10 ** 6)

    @jax.jit
    def render(K, R, T):
        cam = Camera(H, W, K, R, T, cams[0].znear, cams[0].zfar)
        out = forward_envgs(base, env, cam, it, cfg)
        return out.rgb_map, out.acc_map, out.norm_map

    images, masks, normals = [], [], []
    for cam in cams:
        rgb, acc, nrm = render(cam.K, cam.R, cam.T)
        images.append(np.clip(np.asarray(rgb), 0, 1).astype(np.float32))
        masks.append((np.asarray(acc) > 0.5).astype(np.float32))
        n = np.asarray(nrm)
        n = n / np.clip(np.linalg.norm(n, axis=-1, keepdims=True), 1e-8, None)
        n_view = n @ np.asarray(cam.R).T  # world -> view
        normals.append(((n_view + 1.0) / 2.0).astype(np.float32))
    return Scene(cams, images, masks, normals, base, env)
