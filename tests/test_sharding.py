"""Multi-chip band-parallel training on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from envgs_tpu.models.envgs import EnvGSConfig
from envgs_tpu.parallel.sharding import make_mesh, make_sharded_train_step
from envgs_tpu.train.optimizer import LRConfig
from envgs_tpu.train.supervisor import LossConfig
from envgs_tpu.train.trainer import Batch, init_train_state, make_train_step
from tests.test_envgs_model import _cam, _pools


@pytest.mark.slow
def test_band_parallel_matches_single_chip():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    H, W = 128, 32  # 8 bands x 16 rows
    cam = _cam(H, W, f=40.0)
    base, env = _pools(seed=7)
    cfg = EnvGSConfig(
        raster_backend="pallas_interp", tracer_backend="ref",
        pair_cap=2 ** 12, reflection_start_iter=0,
    )
    loss_cfg = LossConfig(
        img_loss_weight=1.0, ssim_loss_weight=0.0, gs_norm_loss_weight=0.0,
        norm_loss_weight=0.0, perc_loss_weight=0.0,
    )
    lr = LRConfig(use_opacity_pulse=False)
    rng = np.random.default_rng(0)
    batch = Batch(
        rgb=jnp.asarray(rng.random((H, W, 3)).astype(np.float32)),
        msk=jnp.ones((H, W, 1)),
        norm=jnp.zeros((H, W, 3)),
    )
    it = jnp.asarray(5)

    # single-chip step
    step1 = make_train_step(cam, cfg, loss_cfg, lr, lr, donate=False)
    s1 = init_train_state(base, env, jax.random.PRNGKey(0))
    s1n, stats1 = step1(s1, batch, cam.K, cam.R, cam.T, it)

    # 8-band sharded step
    mesh = make_mesh(8)
    step8 = make_sharded_train_step(mesh, cam, cfg, loss_cfg, lr, lr)
    s8 = init_train_state(base, env, jax.random.PRNGKey(0))
    s8n, stats8 = step8(s8, batch, cam.K, cam.R, cam.T, it)

    # image L1 loss decomposes exactly over equal bands
    np.testing.assert_allclose(
        float(stats8["img_loss"]), float(stats1["img_loss"]), rtol=1e-5
    )
    # parameter updates must match (grads all-reduced over bands)
    np.testing.assert_allclose(
        np.asarray(s8n.base.params.xyz), np.asarray(s1n.base.params.xyz),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s8n.base.params.features_dc),
        np.asarray(s1n.base.params.features_dc), atol=2e-5,
    )
    # densification stats must match (wet summed over bands)
    # band K-shifts perturb last-ulp alphas at the 1/255 floor, so a few
    # boundary splats differ discretely; bound it statistically
    np.testing.assert_allclose(
        np.asarray(s8n.base.stats.weight_accum),
        np.asarray(s1n.base.stats.weight_accum), rtol=5e-3, atol=0.05,
    )


@pytest.mark.slow
def test_band_parallel_default_loss_band_exact():
    """The FULL default loss (SSIM + depth-quantile-scaled normal terms) is
    band-exact: the band renders a row-CROP of the global camera, SSIM
    exchanges 5-row halos, the depth quantiles psum their CDF counts, and
    depth-to-normal gets a 1-row halo. Asserted on Adam's first moment
    (0.1*g after step 1 — linear in the gradient; post-step params are
    sign-descent-amplified and only meaningful for single-term losses)."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    H, W = 128, 32
    cam = _cam(H, W, f=40.0)
    base, env = _pools(seed=7)
    cfg = EnvGSConfig(
        raster_backend="pallas_interp", tracer_backend="ref",
        pair_cap=2 ** 12, reflection_start_iter=0,
    )
    loss_cfg = LossConfig(perc_loss_weight=0.0)  # full default terms
    lr = LRConfig(use_opacity_pulse=False)
    rng = np.random.default_rng(0)
    batch = Batch(
        rgb=jnp.asarray(rng.random((H, W, 3)).astype(np.float32)),
        msk=jnp.ones((H, W, 1)),
        norm=jnp.asarray(rng.random((H, W, 3)).astype(np.float32)),
    )
    it = jnp.asarray(5)

    step1 = make_train_step(cam, cfg, loss_cfg, lr, lr, donate=False,
                            has_norm=True)
    s1 = init_train_state(base, env, jax.random.PRNGKey(0))
    s1n, stats1 = step1(s1, batch, cam.K, cam.R, cam.T, it)

    mesh = make_mesh(8)
    step8 = make_sharded_train_step(mesh, cam, cfg, loss_cfg, lr, lr,
                                    has_norm=True)
    s8 = init_train_state(base, env, jax.random.PRNGKey(0))
    s8n, stats8 = step8(s8, batch, cam.K, cam.R, cam.T, it)

    for k in ("loss", "img_loss", "ssim_loss", "gs_norm_loss", "norm_loss"):
        np.testing.assert_allclose(
            float(stats8[k]), float(stats1[k]), rtol=2e-5, atol=1e-7,
            err_msg=k)
    for a, b in zip(jax.tree.leaves(s8n.opt_base.mu),
                    jax.tree.leaves(s1n.opt_base.mu)):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5 * scale + 1e-9)


@pytest.mark.slow
def test_band_parallel_camopt_and_base_tracing():
    """Sharded-step feature parity: camera-residual optimization and the
    use_base_tracing m2z width must match the single-chip step (the two
    paths share the forward; this guards against future drift)."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    from envgs_tpu.train.trainer import CamOptConfig, init_cam_opt

    H, W = 128, 32
    cam = _cam(H, W, f=40.0)
    base, env = _pools(seed=7)
    cfg = EnvGSConfig(
        raster_backend="ref", tracer_backend="ref", use_base_tracing=True,
        pair_cap=2 ** 12, reflection_start_iter=0,
    )
    loss_cfg = LossConfig(
        img_loss_weight=1.0, ssim_loss_weight=0.0, gs_norm_loss_weight=0.0,
        norm_loss_weight=0.0, perc_loss_weight=0.0,
    )
    lr = LRConfig(use_opacity_pulse=False)
    copt = CamOptConfig(enabled=True, extri_lr=1e-4, intri_lr=1e-6)
    rng = np.random.default_rng(1)
    batch = Batch(
        rgb=jnp.asarray(rng.random((H, W, 3)).astype(np.float32)),
        msk=jnp.ones((H, W, 1)),
        norm=jnp.zeros((H, W, 3)),
    )
    it = jnp.asarray(5)
    vi = jnp.asarray(2)

    step1 = make_train_step(cam, cfg, loss_cfg, lr, lr, donate=False,
                            cam_opt=copt)
    s1 = init_train_state(base, env, jax.random.PRNGKey(0))
    c1 = init_cam_opt(4)
    s1n, c1n, stats1 = step1(s1, c1, batch, cam.K, cam.R, cam.T, vi, it)

    mesh = make_mesh(8)
    step8 = make_sharded_train_step(mesh, cam, cfg, loss_cfg, lr, lr,
                                    cam_opt=copt)
    s8 = init_train_state(base, env, jax.random.PRNGKey(0))
    c8 = init_cam_opt(4)
    s8n, c8n, stats8 = step8(s8, c8, batch, cam.K, cam.R, cam.T, vi, it)

    np.testing.assert_allclose(
        float(stats8["img_loss"]), float(stats1["img_loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s8n.base.params.xyz), np.asarray(s1n.base.params.xyz),
        atol=2e-5)
    # camera residuals optimized identically (gradients all-reduced)
    np.testing.assert_allclose(
        np.asarray(c8n.res.se3), np.asarray(c1n.res.se3), atol=1e-7)
    # world-space densification grads (m2z width 3 under base tracing)
    np.testing.assert_allclose(
        np.asarray(s8n.base.stats.grad_accum),
        np.asarray(s1n.base.stats.grad_accum), rtol=5e-3, atol=1e-6)


@pytest.mark.slow
def test_band_parallel_production_kernels():
    """The kernels actually shipped (Pallas raster + tiled tracer, interpret
    mode on CPU) running UNDER shard_map must match the same kernels on one
    chip (VERDICT r2 #9: multi-chip correctness of the production path was
    previously inferred from the ref backends, not tested).

    Band boundaries align with the tracer's 16px ray tiles, so the per-tile
    radial blend order is identical between the sharded and single-chip runs
    — only the loss reductions differ, and L1 decomposes exactly."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    H, W = 128, 32  # 8 bands x 16 rows; tracer tiles 16x16
    cam = _cam(H, W, f=40.0)
    base, env = _pools(seed=3)
    cfg = EnvGSConfig(
        raster_backend="pallas_interp", tracer_backend="tiled_interp",
        pair_cap=2 ** 12, env_pair_cap=2 ** 14, reflection_start_iter=0,
    )
    loss_cfg = LossConfig(
        img_loss_weight=1.0, ssim_loss_weight=0.0, gs_norm_loss_weight=0.0,
        norm_loss_weight=0.0, perc_loss_weight=0.0,
    )
    lr = LRConfig(use_opacity_pulse=False)
    rng = np.random.default_rng(2)
    batch = Batch(
        rgb=jnp.asarray(rng.random((H, W, 3)).astype(np.float32)),
        msk=jnp.ones((H, W, 1)),
        norm=jnp.zeros((H, W, 3)),
    )
    it = jnp.asarray(5)

    step1 = make_train_step(cam, cfg, loss_cfg, lr, lr, donate=False)
    s1 = init_train_state(base, env, jax.random.PRNGKey(0))
    s1n, stats1 = step1(s1, batch, cam.K, cam.R, cam.T, it)

    mesh = make_mesh(8)
    step8 = make_sharded_train_step(mesh, cam, cfg, loss_cfg, lr, lr)
    s8 = init_train_state(base, env, jax.random.PRNGKey(0))
    s8n, stats8 = step8(s8, batch, cam.K, cam.R, cam.T, it)

    np.testing.assert_allclose(
        float(stats8["img_loss"]), float(stats1["img_loss"]), rtol=5e-5)
    # parameter updates through BOTH production backward kernels + the
    # pair-grad transposes, all-reduced over bands
    np.testing.assert_allclose(
        np.asarray(s8n.base.params.xyz), np.asarray(s1n.base.params.xyz),
        atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(s8n.env.params.xyz), np.asarray(s1n.env.params.xyz),
        atol=5e-4)  # Adam normalizes grads (m/sqrt(v) ~ +-1): band-order
    # float noise on near-zero env grads flips a few update signs; bound
    # by a fraction of the lr rather than float tolerance
    # densification stats: gradient-lane wet psum'ed over bands
    np.testing.assert_allclose(
        np.asarray(s8n.base.stats.weight_accum),
        np.asarray(s1n.base.stats.weight_accum), rtol=5e-3, atol=0.05)
    # env wet: the band K-shift perturbs reflected rays at the ulp level,
    # which flips cone-cull pair membership DISCRETELY for a few splats
    # (whole blend weights appear/disappear) — bound the per-splat error by
    # an O(alpha-sum) margin and the total mass statistically instead
    w8 = np.asarray(s8n.env.stats.weight_accum)
    w1 = np.asarray(s1n.env.stats.weight_accum)
    np.testing.assert_allclose(w8.sum(), w1.sum(), rtol=1e-2)
    assert np.abs(w8 - w1).max() < 3.0, np.abs(w8 - w1).max()


def test_multihost_helpers():
    """Single-host semantics of the multi-host orchestration helpers."""
    from envgs_tpu.parallel import multihost as mh

    assert mh.process_index() == 0
    assert mh.process_count() == 1
    assert mh.is_main_process()
    mh.barrier()  # no-op on one host, must not hang
    # explicit-rank sharding matches ims[:, rank::world]
    items = list(range(10))
    s0 = mh.shard_for_host(items, rank=0, world=3)
    s1 = mh.shard_for_host(items, rank=1, world=3)
    s2 = mh.shard_for_host(items, rank=2, world=3)
    assert s0 == [0, 3, 6, 9] and s1 == [1, 4, 7] and s2 == [2, 5, 8]
    assert sorted(s0 + s1 + s2) == items
    # default uses this process's rank
    assert mh.shard_for_host(items) == items
