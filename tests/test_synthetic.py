"""Synthetic reflective scene: generator invariants (GT pools + renders)."""
import numpy as np

from envgs_tpu.data.synthetic import make_cameras, make_gt_pools, make_scene


def test_gt_pools_shapes():
    base, env = make_gt_pools(seed=0, n_floor=300, n_env=128)
    assert int(base.n_active) > 200
    assert int(env.n_active) == 128
    # floor splats are specular, blobs are not
    spec = 1 / (1 + np.exp(-np.asarray(base.params.specular)[:, 0]))
    assert spec.max() > 0.5 and spec.min() < 0.01
    # env normals point inward: dot(normal, -dir) > 0; normal is the rotated
    # local z axis — check via quaternion action on (0,0,1)
    q = np.asarray(env.params.rotation)[: int(env.n_active)]
    w, x, y, z = q.T
    nz = np.stack([2 * (x * z + w * y), 2 * (y * z - w * x),
                   1 - 2 * (x * x + y * y)], -1)
    dirs = np.asarray(env.params.xyz)[: int(env.n_active)]
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    assert (np.sum(nz * -dirs, -1) > 0.99).all()


def test_cameras_look_at_scene():
    cams = make_cameras(6, 64, 64)
    for c in cams:
        R = np.asarray(c.R)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        # scene center projects near the image center, in front of the camera
        p = R @ np.array([0.0, 0.0, 0.25]) + np.asarray(c.T)
        assert p[2] > 1.0


def test_make_scene_renders():
    scene = make_scene(n_views=3, H=48, W=48)
    assert len(scene.images) == 3
    for im, mk, nm in zip(scene.images, scene.masks, scene.normals):
        assert im.shape == (48, 48, 3) and im.std() > 0.05
        assert 0.2 < mk.mean() < 1.0
        assert np.isfinite(nm).all() and nm.min() >= 0 and nm.max() <= 1
