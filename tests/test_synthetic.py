"""Synthetic reflective scene: generator invariants (GT pools + renders)."""
import numpy as np
import pytest

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


@pytest.mark.slow
def test_long_synthetic_convergence_psnr_floor():
    """Long-horizon convergence with an ABSOLUTE floor: train a degraded
    init against the synthetic reflective scene for 300 steps over 4 views
    and require mean train-view PSNR >= 24 dB (the reference's 'training
    PSNR reaches 24-25 dB quickly' bar, docs/projects/realtime4dv.md).
    Delta-based smoke tests pass under a 2x-slower optimizer; this floor
    catches optimizer/loss/schedule regressions outright."""
    import jax
    import jax.numpy as jnp

    from envgs_tpu.data.synthetic import make_scene
    from envgs_tpu.models.envgs import EnvGSConfig
    from envgs_tpu.train.optimizer import LRConfig
    from envgs_tpu.train.supervisor import LossConfig
    from envgs_tpu.train.trainer import (
        Batch, init_train_state, make_train_step,
    )

    scene = make_scene(n_views=4, H=64, W=64, seed=3)
    cfg = EnvGSConfig(
        raster_backend="ref", tracer_backend="ref",
        pair_cap=2 ** 14, env_pair_cap=2 ** 14, reflection_start_iter=0,
    )
    # degrade the GT pools: colors wiped to grey, opacity knocked down —
    # geometry stays (a full random init needs densification cycles that
    # do not fit a CPU test budget)
    base, env = scene.gt_base, scene.gt_env
    key = jax.random.PRNGKey(0)
    base = base._replace(params=base.params._replace(
        features_dc=jnp.zeros_like(base.params.features_dc),
        features_rest=jnp.zeros_like(base.params.features_rest),
        opacity=base.params.opacity - 1.5,
    ))
    env = env._replace(params=env.params._replace(
        features_dc=jnp.zeros_like(env.params.features_dc)
        + 0.3 * jax.random.normal(key, env.params.features_dc.shape),
        features_rest=jnp.zeros_like(env.params.features_rest),
    ))

    loss_cfg = LossConfig(perc_loss_weight=0.0)
    lr = LRConfig(use_opacity_pulse=False)
    step = make_train_step(scene.cams[0], cfg, loss_cfg, lr, lr,
                           donate=False, has_norm=True)
    state = init_train_state(base, env, jax.random.PRNGKey(1))
    batches = [
        Batch(rgb=jnp.asarray(im), msk=jnp.asarray(mk),
              norm=jnp.asarray(nm))
        for im, mk, nm in zip(scene.images, scene.masks, scene.normals)
    ]
    psnr_by_view = {}
    for it in range(300):
        v = it % len(batches)
        cam = scene.cams[v]
        state, stats = step(state, batches[v], cam.K, cam.R, cam.T,
                            jnp.asarray(it))
        psnr_by_view[v] = float(stats["psnr"])
    mean_psnr = float(np.mean(list(psnr_by_view.values())))
    assert mean_psnr >= 24.0, (mean_psnr, psnr_by_view)
