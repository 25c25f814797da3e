"""Camera model, projection matrices and ray generation (pure JAX).

Conventions (column-vector math throughout, unlike the reference's row-vector
torch convention — the matrices here are the transposes of the reference's):

- world -> view:  x_v = R @ x_w + T                  (V = [[R, T], [0, 1]])
- view  -> clip:  OpenGL-style perspective with w_clip = z_view
  (same entries as /root/reference/easyvolcap/utils/gaussian2d_utils.py:41-64)
- ndc   -> pixel: x_pix = (x_ndc * W + W - 1) / 2, i.e. pixel centers sit on
  integer coordinates 0..W-1 (matching the rasterizer's ndc2pix at
  gaussian2d_utils.py:1055-1059), which is consistent with camera rays cast
  through (j + 0.5, i + 0.5) under K (ray_utils.py:63-70, correct_pix=True).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from envgs_tpu.utils.transforms import normalize


class Camera(NamedTuple):
    """A single pinhole camera. H/W are static Python ints (XLA shapes)."""

    H: int
    W: int
    K: jnp.ndarray  # (3, 3) intrinsics
    R: jnp.ndarray  # (3, 3) world->view rotation
    T: jnp.ndarray  # (3,)   world->view translation
    znear: float = 0.01
    zfar: float = 100.0

    @property
    def view(self) -> jnp.ndarray:
        """(4, 4) world->view transform."""
        top = jnp.concatenate([self.R, self.T[:, None]], axis=-1)
        return jnp.concatenate(
            [top, jnp.asarray([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)], axis=0
        )

    @property
    def center(self) -> jnp.ndarray:
        """(3,) camera center in world space (-R^T T)."""
        return -self.R.T @ self.T

    @property
    def fovx(self) -> jnp.ndarray:
        return 2.0 * jnp.arctan(self.W / (2.0 * self.K[0, 0]))

    @property
    def fovy(self) -> jnp.ndarray:
        return 2.0 * jnp.arctan(self.H / (2.0 * self.K[1, 1]))

    @property
    def proj(self) -> jnp.ndarray:
        """(4, 4) view->clip projection, w_clip = z_view.

        Entries match getProjectionMatrix (gaussian2d_utils.py:41-64) in
        column-vector convention.
        """
        n, f = self.znear, self.zfar
        tanx = jnp.tan(self.fovx / 2.0)
        tany = jnp.tan(self.fovy / 2.0)
        z = jnp.zeros((), dtype=jnp.float32)
        o = jnp.ones((), dtype=jnp.float32)
        row0 = jnp.stack([1.0 / tanx, z, z, z])
        row1 = jnp.stack([z, 1.0 / tany, z, z])
        row2 = jnp.stack([z, z, o * f / (f - n), o * (-f * n / (f - n))])
        row3 = jnp.stack([z, z, o, z])
        return jnp.stack([row0, row1, row2, row3], axis=0)

    @property
    def full_proj(self) -> jnp.ndarray:
        """(4, 4) world->clip."""
        return self.proj @ self.view

    @property
    def pix_from_clip(self) -> jnp.ndarray:
        """(3, 4) clip -> (x_pix*w, y_pix*w, w)."""
        W, H = float(self.W), float(self.H)
        return jnp.asarray(
            [
                [W / 2.0, 0.0, 0.0, (W - 1) / 2.0],
                [0.0, H / 2.0, 0.0, (H - 1) / 2.0],
                [0.0, 0.0, 0.0, 1.0],
            ],
            dtype=jnp.float32,
        )

    @property
    def pix_from_world(self) -> jnp.ndarray:
        """(3, 4) world -> (x_pix*w, y_pix*w, w=z_view).

        Built directly from K so off-center principal points are exact
        (the fov/ndc composition assumes cx=W/2): x_pix = fx x/z + cx - 0.5,
        matching rays cast through (j+0.5, i+0.5) under K.
        """
        K = self.K
        z = jnp.zeros((), jnp.float32)
        o = jnp.ones((), jnp.float32)
        pix_from_view = jnp.stack(
            [
                jnp.stack([K[0, 0], K[0, 1], K[0, 2] - 0.5, z]),
                jnp.stack([z, K[1, 1], K[1, 2] - 0.5, z]),
                jnp.stack([z, z, o, z]),
            ],
            axis=0,
        )
        return pix_from_view @ self.view

    def crop_rows(self, row0: int, band_h: int) -> "Camera":
        """Camera viewing rows [row0, row0+band_h) of this camera's image —
        the image-band decomposition used for multi-chip rendering."""
        K = self.K.at[1, 2].add(-float(row0))
        return self._replace(H=band_h, K=K)


def make_camera(H, W, K, R, T, znear=0.01, zfar=100.0) -> Camera:
    K = jnp.asarray(K, jnp.float32)
    R = jnp.asarray(R, jnp.float32)
    T = jnp.asarray(T, jnp.float32).reshape(3)
    return Camera(int(H), int(W), K, R, T, float(znear), float(zfar))


def get_rays(cam: Camera, z_depth: bool = True, correct_pix: bool = True,
             i0=None):
    """Camera rays for every pixel.

    Returns (ray_o (3,), ray_d (H, W, 3)). With z_depth=True, ray_d is scaled
    so that `o + t * d` has view-space depth t (NOT normalized) — the contract
    the surfel tracer expects (/root/reference/easyvolcap/utils/optix_utils.py:124-127;
    ray_utils.py:63-80).

    i0: global pixel-row offset of row 0 (band-parallel row-crop: cam holds
    the full-image K with H = the band height; adding the offset here keeps
    every ray bit-identical to the full-image get_rays).
    """
    i = jnp.arange(cam.H, dtype=jnp.float32)
    if i0 is not None:
        i = i + i0
    j = jnp.arange(cam.W, dtype=jnp.float32)
    if correct_pix:
        i = i + 0.5
        j = j + 0.5
    jj, ii = jnp.meshgrid(j, i)  # (H, W) x-coords, y-coords
    pix = jnp.stack([jj, ii, jnp.ones_like(ii)], axis=-1)  # (H, W, 3)
    Kinv = jnp.linalg.inv(cam.K)
    d_cam = pix @ Kinv.T  # (H, W, 3), z=1 in view space
    d_world = d_cam @ cam.R  # R^T @ d, row-vec form
    if not z_depth:
        d_world = normalize(d_world)
    return cam.center, d_world


def camera_path_interpolate(cams: list, n_out: int, kind: str = "orbit"):
    """Novel-view camera path generation (host-side numpy).

    Supported kinds: 'orbit' (circle around the mean center, facing the
    look-at point), 'spiral', 'cubic'/'linear' (smooth interpolation through
    the given cameras). Mirrors the capability of
    /root/reference/easyvolcap/dataloaders/datasets/volumetric_video_inference_dataset.py:155-163.
    """
    import numpy as np

    Ks = np.stack([np.asarray(c.K) for c in cams])
    Rs = np.stack([np.asarray(c.R) for c in cams])
    Ts = np.stack([np.asarray(c.T).reshape(3) for c in cams])
    centers = np.einsum("nij,nj->ni", -Rs.transpose(0, 2, 1), Ts)
    look = centers.mean(0) + np.array([0.0, 0.0, 1.0]) * 0.0
    K = Ks.mean(0)
    H, W = cams[0].H, cams[0].W

    out = []
    if kind in ("orbit", "spiral"):
        c0 = centers.mean(0)
        radius = np.linalg.norm(centers - c0, axis=-1).mean()
        up = -Rs.mean(0)[1]  # approximate world up (y-down cameras)
        up = up / np.linalg.norm(up)
        # Build an orthonormal basis of the orbit plane
        a = np.cross(up, centers[0] - c0)
        a = a / (np.linalg.norm(a) + 1e-8)
        b = np.cross(a, up)
        for t in np.linspace(0, 2 * np.pi, n_out, endpoint=False):
            h = 0.1 * radius * np.sin(2 * t) if kind == "spiral" else 0.0
            c = c0 + radius * (np.cos(t) * b + np.sin(t) * a) + h * up
            fwd = look - c
            fwd = fwd / np.linalg.norm(fwd)
            right = np.cross(fwd, up)
            right = right / np.linalg.norm(right)
            down = np.cross(fwd, right)
            R = np.stack([right, down, fwd], axis=0)
            T = -R @ c
            out.append(make_camera(H, W, K, R, T, cams[0].znear, cams[0].zfar))
    else:  # linear / cubic interpolation through given cameras
        from numpy import interp

        n_in = len(cams)
        ts = np.linspace(0, n_in - 1, n_out)
        for t in ts:
            i0 = int(np.floor(t))
            i1 = min(i0 + 1, n_in - 1)
            a = t - i0
            c = (1 - a) * centers[i0] + a * centers[i1]
            # slerp-lite on rotations via orthonormalization of the lerp
            R = (1 - a) * Rs[i0] + a * Rs[i1]
            u, _, vt = np.linalg.svd(R)
            R = u @ vt
            T = -R @ c
            out.append(make_camera(H, W, K, R, T, cams[0].znear, cams[0].zfar))
    return out
