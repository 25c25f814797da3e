"""Splat-slab model parallelism: per-frame depth-rank slabs composed over
a mesh axis must reproduce the single-device render AND its gradients
(the associative alpha-blend composition, incl. the closed-form
cross-slab distortion term)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from envgs_tpu.models.envgs import EnvGSConfig, render_base
from envgs_tpu.models.gaussians import create_pool
from envgs_tpu.parallel.splat_sharding import (
    compose_slabs,
    make_splat_sharded_render_base,
    slab_assignment,
)
from envgs_tpu.utils.camera import make_camera

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 devices (CPU mesh)"
)


def _cam(H=48, W=48, f=60.0):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return make_camera(H, W, K, np.eye(3, dtype=np.float32),
                       np.zeros(3, np.float32))


def _pool(P=160, seed=0):
    rng = np.random.default_rng(seed)
    xyz = np.concatenate(
        [rng.normal(size=(P, 2)) * 0.6, rng.random((P, 1)) * 4 + 1.5], -1
    ).astype(np.float32)
    pool = create_pool(xyz, rng.random((P, 3)).astype(np.float32), cap=P,
                       sh_degree=1, init_opacity=0.7, seed=seed)
    scal = np.log(rng.random((P, 2)).astype(np.float32) * 0.15 + 0.02)
    return pool._replace(params=pool.params._replace(
        scaling=jnp.asarray(scal)))


_CFG = EnvGSConfig(raster_backend="pallas_interp", pair_cap=2 ** 12,
                   render_reflection=False, reflection_start_iter=10 ** 9)


def test_slab_assignment_partitions_by_depth_rank():
    depth = jnp.asarray([5.0, 1.0, 3.0, 2.0, 4.0, 9.0])
    valid = jnp.asarray([True, True, True, True, True, False])
    slab = np.asarray(slab_assignment(depth, valid, 3))
    # ranks: 1,3 -> slab0; 2,4 -> slab1; 0, invalid -> slab2
    np.testing.assert_array_equal(slab, [2, 0, 1, 0, 1, 2])


@pytest.mark.slow
def test_splat_sharded_render_matches_single_device():
    from jax.sharding import Mesh

    D = 4
    mesh = Mesh(np.array(jax.devices()[:D]), ("splat",))
    cam = _cam()
    pool = _pool()
    single = render_base(pool, cam, _CFG)
    fn = make_splat_sharded_render_base(mesh, cam, _CFG,
                                        slab_pair_cap=2 ** 12)
    sharded = fn(pool)
    for k in ("rgb", "alpha", "depth_expected", "normal_world",
              "distortion", "surf_depth"):
        a = np.asarray(getattr(single, k))
        b = np.asarray(getattr(sharded, k))
        np.testing.assert_allclose(b, a, atol=5e-5, rtol=1e-4, err_msg=k)
    # per-splat wet is slab-LOCAL (documented upper bound: nearer slabs'
    # occlusion is not seen); check the bound and exactness for slab 0
    wet_s = np.asarray(sharded.wet)
    wet_1 = np.asarray(single.wet)
    assert np.all(wet_s >= wet_1 - 1e-4)
    from envgs_tpu.ops.common import prepare_splats
    from envgs_tpu.parallel.splat_sharding import slab_assignment

    prep = prepare_splats(pool.params.xyz, pool.params.rotation,
                          pool.get_scaling, pool.get_opacity[:, 0],
                          jnp.zeros((pool.cap, 3)), cam,
                          active=pool.stats.active)
    slab = np.asarray(slab_assignment(prep.depth, prep.valid, D))
    np.testing.assert_allclose(wet_s[slab == 0], wet_1[slab == 0],
                               atol=1e-5, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(sharded.radii),
                                  np.asarray(single.radii))


@pytest.mark.slow
def test_splat_sharded_gradients_match_single_device():
    """Parameter gradients through the slab composition (shard_map
    transpose psums each slab's contribution) must match single-device."""
    from jax.sharding import Mesh

    D = 4
    mesh = Mesh(np.array(jax.devices()[:D]), ("splat",))
    cam = _cam(H=32, W=32)
    pool = _pool(P=96, seed=2)
    fn = make_splat_sharded_render_base(mesh, cam, _CFG,
                                        slab_pair_cap=2 ** 12)
    rng = np.random.default_rng(1)
    gr = jnp.asarray(rng.normal(size=(32, 32, 3)).astype(np.float32))

    def loss_sharded(xyz, opac):
        p = pool._replace(params=pool.params._replace(xyz=xyz, opacity=opac))
        out = fn(p)
        return jnp.sum(out.rgb * gr) + jnp.sum(out.distortion)

    def loss_single(xyz, opac):
        p = pool._replace(params=pool.params._replace(xyz=xyz, opacity=opac))
        out = render_base(p, cam, _CFG)
        return jnp.sum(out.rgb * gr) + jnp.sum(out.distortion)

    args = (pool.params.xyz, pool.params.opacity)
    g_s = jax.grad(loss_sharded, argnums=(0, 1))(*args)
    g_1 = jax.grad(loss_single, argnums=(0, 1))(*args)
    for name, a, b in zip(("xyz", "opacity"), g_1, g_s):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-4,
                                   err_msg=name)


def _env_shells(Pe=96, cap=96, seed=5):
    """Env splats in two well-separated radial shells: the slab partition
    (global radial rank) then matches every ray's own front-to-back order,
    so the trace composition is order-exact, not just approximate."""
    from envgs_tpu.models.gaussians import create_pool as _cp

    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(Pe, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    r = np.where(np.arange(Pe) % 2 == 0, 12.0, 22.0)[:, None]
    env = _cp((dirs * r).astype(np.float32),
              rng.random((Pe, 3)).astype(np.float32), cap=cap,
              sh_degree=1, init_opacity=0.6, seed=seed)
    return env._replace(params=env.params._replace(
        scaling=jnp.full((cap, 2), np.log(0.8))))


@pytest.mark.slow
def test_slab_train_step_matches_single_chip():
    """Slab-sharded FULL train step (compose -> losses -> grads through the
    blend monoid, BOTH pair pipelines sharded incl. the env tracer) vs the
    single-chip trainer step on the production kernels (interpret mode)."""
    from jax.sharding import Mesh

    from envgs_tpu.parallel.splat_sharding import (
        make_splat_sharded_train_step,
    )
    from envgs_tpu.train.optimizer import LRConfig
    from envgs_tpu.train.supervisor import LossConfig
    from envgs_tpu.train.trainer import (
        Batch, init_train_state, make_train_step,
    )

    D = 4
    mesh = Mesh(np.array(jax.devices()[:D]), ("splat",))
    H, W = 32, 32
    cam = _cam(H, W, f=40.0)
    base = _pool(P=96, seed=4)
    env = _env_shells()
    cfg = EnvGSConfig(
        raster_backend="pallas_interp", tracer_backend="tiled_interp",
        pair_cap=2 ** 12, env_pair_cap=2 ** 12, reflection_start_iter=0,
    )
    loss_cfg = LossConfig(
        img_loss_weight=1.0, ssim_loss_weight=0.0, gs_norm_loss_weight=0.0,
        norm_loss_weight=0.0, perc_loss_weight=0.0,
        gs_dist_loss_weight=0.01,  # exercises the cross-slab dist term
        gs_dist_loss_start_iter=0,
    )
    lr = LRConfig(use_opacity_pulse=False)
    rng = np.random.default_rng(6)
    batch = Batch(
        rgb=jnp.asarray(rng.random((H, W, 3)).astype(np.float32)),
        msk=jnp.ones((H, W, 1)),
        norm=jnp.zeros((H, W, 3)),
    )
    it = jnp.asarray(5)

    step1 = make_train_step(cam, cfg, loss_cfg, lr, lr, donate=False)
    s1 = init_train_state(base, env, jax.random.PRNGKey(0))
    s1n, stats1 = step1(s1, batch, cam.K, cam.R, cam.T, it)

    stepD = make_splat_sharded_train_step(
        mesh, cam, cfg, loss_cfg, lr, lr,
        slab_pair_cap=2 ** 12, slab_env_cap=2 ** 12)
    sD = init_train_state(base, env, jax.random.PRNGKey(0))
    sDn, statsD = stepD(sD, batch, cam.K, cam.R, cam.T, it)

    np.testing.assert_allclose(
        float(statsD["img_loss"]), float(stats1["img_loss"]), rtol=5e-5)
    np.testing.assert_allclose(
        float(statsD["loss"]), float(stats1["loss"]), rtol=1e-4)
    # parameter updates through both slab-sharded pair pipelines
    np.testing.assert_allclose(
        np.asarray(sDn.base.params.xyz), np.asarray(s1n.base.params.xyz),
        atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(sDn.env.params.xyz), np.asarray(s1n.env.params.xyz),
        atol=1e-3)  # Adam normalizes grads (m/sqrt(v) ~ +-1): float noise
    # on near-zero env gradients flips a few steps' signs; bound by ~2 lr
    np.testing.assert_allclose(
        np.asarray(sDn.base.params.features_dc),
        np.asarray(s1n.base.params.features_dc), atol=3e-5)


@pytest.mark.slow
def test_band_splat_2d_mesh_train_step():
    """('band', 'splat') 2-D mesh: pixels split over bands AND splats over
    slabs in ONE step — parity vs the single-chip trainer step."""
    from jax.sharding import Mesh

    from envgs_tpu.parallel.splat_sharding import (
        make_splat_sharded_train_step,
    )
    from envgs_tpu.train.optimizer import LRConfig
    from envgs_tpu.train.supervisor import LossConfig
    from envgs_tpu.train.trainer import (
        Batch, init_train_state, make_train_step,
    )

    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("band", "splat"))
    H, W = 32, 32  # 2 bands x 16 rows
    cam = _cam(H, W, f=40.0)
    base = _pool(P=96, seed=8)
    env = _env_shells(seed=9)
    cfg = EnvGSConfig(
        raster_backend="pallas_interp", tracer_backend="tiled_interp",
        pair_cap=2 ** 12, env_pair_cap=2 ** 12, reflection_start_iter=0,
    )
    loss_cfg = LossConfig(
        img_loss_weight=1.0, ssim_loss_weight=0.0, gs_norm_loss_weight=0.0,
        norm_loss_weight=0.0, perc_loss_weight=0.0,
    )
    lr = LRConfig(use_opacity_pulse=False)
    rng = np.random.default_rng(10)
    batch = Batch(
        rgb=jnp.asarray(rng.random((H, W, 3)).astype(np.float32)),
        msk=jnp.ones((H, W, 1)),
        norm=jnp.zeros((H, W, 3)),
    )
    it = jnp.asarray(5)

    step1 = make_train_step(cam, cfg, loss_cfg, lr, lr, donate=False)
    s1 = init_train_state(base, env, jax.random.PRNGKey(0))
    s1n, stats1 = step1(s1, batch, cam.K, cam.R, cam.T, it)

    step2d = make_splat_sharded_train_step(
        mesh, cam, cfg, loss_cfg, lr, lr, band_axis="band",
        slab_pair_cap=2 ** 12, slab_env_cap=2 ** 12)
    s2 = init_train_state(base, env, jax.random.PRNGKey(0))
    s2n, stats2 = step2d(s2, batch, cam.K, cam.R, cam.T, it)

    # reflected rays amplify float noise: the band K-shift + slab compose
    # perturb normals at the ulp level, which moves env-trace hits — bound
    # the loss statistically, not at band-parallel tightness
    np.testing.assert_allclose(
        float(stats2["img_loss"]), float(stats1["img_loss"]), rtol=5e-4)
    np.testing.assert_allclose(
        np.asarray(s2n.base.params.xyz), np.asarray(s1n.base.params.xyz),
        atol=1e-3)  # base grads flow through the reflected-ray chain too:
    # Adam sign-flips on noise-flipped near-zero gradients (see 1-D note)
    np.testing.assert_allclose(
        np.asarray(s2n.env.params.xyz), np.asarray(s1n.env.params.xyz),
        atol=1e-3)  # see the 1-D test's note on Adam sign-flips
