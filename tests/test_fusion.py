"""TSDF fusion + marching-tetrahedra mesh extraction: recover a sphere
from rendered depth maps (fusion/tsdf/mesh tooling parity)."""
import numpy as np
import jax.numpy as jnp

from envgs_tpu.utils.camera import make_camera
from envgs_tpu.utils.fusion import (
    marching_tetrahedra,
    save_mesh_ply,
    tsdf_fuse,
)

R_SPHERE = 0.4


def _sphere_depth(cam):
    """Analytic z-depth map of the origin-centered sphere."""
    H, W = cam.H, cam.W
    jj, ii = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    d = np.stack([(jj - cam.K[0, 2]) / cam.K[0, 0],
                  (ii - cam.K[1, 2]) / cam.K[1, 1],
                  np.ones_like(jj)], -1)
    # rays in world: o = C, dir = R^T d
    C = np.asarray(cam.center)
    dw = d @ np.asarray(cam.R)
    dn = dw / np.linalg.norm(dw, axis=-1, keepdims=True)
    b = np.sum(C * dn, -1)
    c = np.sum(C * C) - R_SPHERE ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    # z-depth = t * (view-z component of the unit ray)
    zfac = dw[..., 2] / np.linalg.norm(dw, axis=-1) * 0  # placeholder
    # point in view space:
    pw = C + t[..., None] * dn
    pv = pw @ np.asarray(cam.R).T + np.asarray(cam.T)
    depth = np.where(hit & (t > 0), pv[..., 2], 0.0)
    return depth.astype(np.float32)


def _cams(n=6, H=64, W=64, f=70.0):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    cams = []
    for i in range(n):
        th = 2 * np.pi * i / n
        # camera on a circle of radius 2 in the xz plane, looking at origin
        C = np.array([2 * np.sin(th), 0.0, -2 * np.cos(th)], np.float32)
        z = -C / np.linalg.norm(C)  # view +z toward origin
        x = np.cross([0.0, 1.0, 0.0], z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z]).astype(np.float32)  # world->view rows
        T = (-R @ C).astype(np.float32)
        cams.append(make_camera(H, W, K, R, T))
    return cams


def test_tsdf_sphere_reconstruction(tmp_path):
    cams = _cams()
    depths = jnp.asarray(np.stack([_sphere_depth(c) for c in cams]))
    assert float(depths.max()) > 1.0  # hits exist
    bounds = ((-0.7, -0.7, -0.7), (0.7, 0.7, 0.7))
    tsdf, w = tsdf_fuse(depths, cams, bounds, res=48)
    tsdf = np.asarray(tsdf)
    # sign structure: inside negative, far corners positive
    assert tsdf[24, 24, 24] < -0.5
    assert tsdf[2, 2, 2] > 0.5
    # multi-view coverage: near-surface band voxels seen from >= 3 views
    assert float(np.asarray(w).max()) >= 3

    verts, faces = marching_tetrahedra(tsdf, 0.0, bounds,
                                       observed=np.asarray(w) > 0)
    assert len(verts) > 200 and len(faces) == len(verts) // 3
    r = np.linalg.norm(verts, axis=-1)
    # extracted surface lies on the sphere (voxel ~ 0.03)
    assert abs(float(np.median(r)) - R_SPHERE) < 0.05, float(np.median(r))
    assert float(np.percentile(np.abs(r - R_SPHERE), 90)) < 0.1

    out = str(tmp_path / "mesh.ply")
    save_mesh_ply(out, verts, faces)
    head = open(out).read(200)
    assert "element vertex" in head and "element face" in head


def test_visual_hull_carves_sphere():
    from envgs_tpu.utils.fusion import visual_hull

    cams = _cams()
    masks = jnp.asarray(
        np.stack([(_sphere_depth(c) > 0).astype(np.float32) for c in cams]))
    bounds = ((-0.7, -0.7, -0.7), (0.7, 0.7, 0.7))
    pts = visual_hull(masks, cams, bounds, res=40)
    assert len(pts) > 100
    r = np.linalg.norm(pts, axis=-1)
    # all hull points within (slightly dilated) sphere; hull fills it
    assert float(r.max()) < R_SPHERE + 0.15, float(r.max())
    assert float(r.min()) < 0.1  # interior filled
    # center of mass at the sphere center
    assert float(np.abs(pts.mean(0)).max()) < 0.05
