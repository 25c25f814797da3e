"""EnvGS model composition + end-to-end training smoke tests."""
import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.envgs import EnvGSConfig, forward_envgs
from envgs_tpu.models.gaussians import create_pool
from envgs_tpu.train.optimizer import LRConfig
from envgs_tpu.train.supervisor import LossConfig
from envgs_tpu.train.trainer import (
    Batch,
    ScheduleConfig,
    init_train_state,
    make_train_step,
)
from envgs_tpu.utils.camera import make_camera
import pytest


def _cam(H=48, W=48, f=60.0):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return make_camera(H, W, K, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))


def _pools(seed=0, P=64, Pe=64, cap=128):
    rng = np.random.default_rng(seed)
    xyz = np.concatenate(
        [rng.normal(size=(P, 2)) * 0.6, rng.random((P, 1)) * 2 + 2.0], -1
    ).astype(np.float32)
    base = create_pool(xyz, rng.random((P, 3)).astype(np.float32), cap=cap,
                       sh_degree=2, init_opacity=0.5, seed=seed)
    # env points on a dome around the scene
    dirs = rng.normal(size=(Pe, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    env_xyz = (dirs * 8.0).astype(np.float32)
    env = create_pool(env_xyz, rng.random((Pe, 3)).astype(np.float32),
                      cap=cap, sh_degree=2, init_opacity=0.5, seed=seed + 1)
    return base, env


_CFG = EnvGSConfig(
    raster_backend="pallas_interp",
    tracer_backend="ref",
    pair_cap=2 ** 12,
    env_pair_cap=2 ** 12,
    reflection_start_iter=0,
)


@pytest.mark.slow
def test_forward_shapes_and_composition():
    cam = _cam()
    base, env = _pools()
    out = forward_envgs(base, env, cam, jnp.asarray(10), _CFG)
    H, W = cam.H, cam.W
    assert out.rgb_map.shape == (H, W, 3)
    assert out.spec_map.shape == (H, W, 1)
    assert out.norm_map.shape == (H, W, 3)
    assert np.all(np.isfinite(np.asarray(out.rgb_map)))
    # composition identity: rgb = (1-s) base + s env
    recon = (1 - np.asarray(out.spec_map)) * np.asarray(out.dif_rgb_map) / np.clip(
        1 - np.asarray(out.spec_map), 1e-6, None
    )
    s = np.asarray(out.spec_map)
    lhs = np.asarray(out.rgb_map)
    rhs = (1 - s) * (np.asarray(out.dif_rgb_map) / np.clip(1 - s, 1e-6, None)) \
        + s * np.asarray(out.env_rgb_map)
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


@pytest.mark.slow
def test_reflection_gate():
    """Before reflection_start_iter the env pass must not contribute."""
    cam = _cam()
    base, env = _pools()
    cfg = _CFG._replace(reflection_start_iter=100)
    out0 = forward_envgs(base, env, cam, jnp.asarray(5), cfg)
    np.testing.assert_allclose(np.asarray(out0.env_rgb_map), 0.0, atol=1e-7)
    out1 = forward_envgs(base, env, cam, jnp.asarray(100), cfg)
    assert float(jnp.abs(out1.env_rgb_map).sum()) > 0


@pytest.mark.slow
def test_reflect_rays_geometry():
    """Reflected rays must bounce off the rendered surface."""
    cam = _cam()
    base, env = _pools()
    out = forward_envgs(base, env, cam, jnp.asarray(10), _CFG)
    d = np.asarray(out.ref_d)
    assert np.all(np.isfinite(d))
    # where the surface is visible, reflected dirs differ from camera rays
    acc = np.asarray(out.acc_map[..., 0])
    assert acc.max() > 0.5


@pytest.mark.slow
def test_train_step_improves_psnr():
    """Supervise against a target render; PSNR must improve substantially
    (the reference's 'training PSNR reaches 24-25 dB quickly' smoke check,
    docs/projects/realtime4dv.md:192 — scaled down to a toy scene)."""
    cam = _cam(32, 32, f=40.0)
    base_t, env_t = _pools(seed=42)
    cfg = _CFG._replace(reflection_start_iter=10 ** 9)  # base-only regime
    target = forward_envgs(base_t, env_t, cam, jnp.asarray(0), cfg)
    gt = jnp.clip(target.rgb_map, 0.0, 1.0)

    # perturb the pool: noisy colors + opacities
    base, env = _pools(seed=42)
    key = jax.random.PRNGKey(0)
    noisy = base.params._replace(
        features_dc=base.params.features_dc
        + 0.8 * jax.random.normal(key, base.params.features_dc.shape),
        opacity=base.params.opacity - 1.0,
    )
    base = base._replace(params=noisy)

    loss_cfg = LossConfig(
        img_loss_weight=0.8, ssim_loss_weight=0.2, gs_norm_loss_weight=0.0,
        norm_loss_weight=0.0, perc_loss_weight=0.0,
    )
    lr = LRConfig(use_opacity_pulse=False)
    step = make_train_step(cam, cfg, loss_cfg, lr, lr, donate=False)
    state = init_train_state(base, env, jax.random.PRNGKey(1))
    batch = Batch(
        rgb=gt, msk=jnp.ones((32, 32, 1)), norm=jnp.zeros((32, 32, 3)),
    )
    psnrs = []
    for it in range(30):
        state, stats = step(state, batch, cam.K, cam.R, cam.T, jnp.asarray(it))
        psnrs.append(float(stats["psnr"]))
        assert np.isfinite(psnrs[-1])
    assert psnrs[-1] > psnrs[0] + 2.0, psnrs
    assert float(state.base.n_active) == 64  # no topology change mid-training


@pytest.mark.slow
def test_render_mode_matches_training_forward():
    """cfg.render_mode=True strips training-only kernel work; the visible
    outputs (rgb/depth/normal/acc/spec) must match to fp-regrouping noise
    (render mode uses the unaligned pair layout, so chunk boundaries — and
    the within-chunk cumsum groupings — differ), while dist_map and the wet
    buffers become exact zeros."""
    cam = _cam()
    base, env = _pools()
    cfg = _CFG._replace(tracer_backend="tiled_interp",
                        pair_cap=2 ** 12, env_pair_cap=2 ** 12)
    full = forward_envgs(base, env, cam, jnp.asarray(10), cfg)
    lean = forward_envgs(base, env, cam, jnp.asarray(10),
                         cfg._replace(render_mode=True))
    for k in ("rgb_map", "dif_rgb_map", "env_rgb_map", "dpt_map",
              "norm_map", "acc_map", "spec_map"):
        np.testing.assert_allclose(
            np.asarray(getattr(full, k)), np.asarray(getattr(lean, k)),
            atol=1e-5, rtol=1e-5, err_msg=k)
    assert np.all(np.asarray(lean.dist_map) == 0.0)
    assert np.all(np.asarray(lean.base_wet) == 0.0)
    assert np.all(np.asarray(lean.env_wet) == 0.0)
