"""use_base_tracing, reflection ray filtering, and multi-bounce tracing."""
import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.envgs import EnvGSConfig, forward_envgs
from envgs_tpu.ops import tracer
from envgs_tpu.ops.tracer_ref import prepare_trace_scene, trace_rays_reference
from tests.test_runner_wiring import _cam, _pools
import pytest

_REF = EnvGSConfig(
    raster_backend="ref", tracer_backend="ref",
    pair_cap=2 ** 12, env_pair_cap=2 ** 12, reflection_start_iter=0,
)


@pytest.mark.slow
def test_base_tracing_close_to_raster():
    """Tracing camera rays against the base set must closely reproduce the
    rasterized base pass (same splats, same blend; only the projection
    approximation differs)."""
    cam = _cam(H=32, W=32)
    base, env = _pools()
    it = jnp.asarray(0)
    ras = forward_envgs(base, env, cam, it, _REF)
    trc = forward_envgs(base, env, cam, it,
                        _REF._replace(use_base_tracing=True))
    # the rasterizer low-pass-filters tiny splats; compare where both solid
    m = (np.asarray(ras.acc_map)[..., 0] > 0.9) & (
        np.asarray(trc.acc_map)[..., 0] > 0.9)
    assert m.mean() > 0.2
    d = np.abs(np.asarray(ras.rgb_map) - np.asarray(trc.rgb_map))[m]
    assert d.mean() < 0.05, d.mean()
    # densification signals exist
    assert np.asarray(trc.base_visibility).sum() > 10
    assert np.isfinite(np.asarray(trc.dpt_map)).all()


@pytest.mark.slow
def test_base_tracing_train_step_grads():
    """Gradients flow through the traced base pass incl. the means3d zero."""
    from envgs_tpu.train.optimizer import LRConfig
    from envgs_tpu.train.supervisor import LossConfig
    from envgs_tpu.train.trainer import Batch, init_train_state, make_train_step

    cam = _cam(H=32, W=32)
    base, env = _pools()
    cfg = _REF._replace(use_base_tracing=True)
    loss_cfg = LossConfig(img_loss_weight=1.0, ssim_loss_weight=0.0,
                          gs_norm_loss_weight=0.0, norm_loss_weight=0.0,
                          perc_loss_weight=0.0)
    lr = LRConfig(use_opacity_pulse=False)
    step = make_train_step(cam, cfg, loss_cfg, lr, lr, donate=False)
    state = init_train_state(base, env, jax.random.PRNGKey(0))
    batch = Batch(rgb=jnp.zeros((32, 32, 3)), msk=jnp.ones((32, 32, 1)),
                  norm=jnp.zeros((32, 32, 3)))
    state2, stats = step(state, batch, cam.K, cam.R, cam.T, jnp.asarray(1))
    assert np.isfinite(float(stats["loss"]))
    # xyz moved and densification grad stats accumulated
    assert float(jnp.abs(state2.base.params.xyz - state.base.params.xyz).max()) > 0
    assert float(state2.base.stats.grad_accum.sum()) > 0


def _dome_scene(P=96, seed=0):
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(P, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    mean = jnp.asarray(dirs * 6.0, jnp.float32)
    quat = jnp.concatenate(
        [jnp.ones((P, 1)), jnp.asarray(rng.normal(size=(P, 3)) * 0.2)], -1
    ).astype(jnp.float32)
    scales = jnp.full((P, 2), 0.8, jnp.float32)
    opac = jnp.full((P,), 0.7, jnp.float32)
    color = jnp.asarray(rng.random((P, 3)), jnp.float32)
    return prepare_trace_scene(mean, quat, scales, opac, color)


@pytest.mark.slow
def test_ray_mask_culls_but_matches_unmasked_pixels():
    scene = _dome_scene()
    H = W = 32
    rng = np.random.default_rng(1)
    o = jnp.zeros((H, W, 3))
    d = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    bg = jnp.zeros(3)
    full = tracer.trace_rays(scene, o, d, bg, backend="tiled_interp")
    # mask in only the top-left ray tile
    mask = np.zeros((H, W), bool)
    mask[:16, :16] = True
    part = tracer.trace_rays(scene, o, d, bg, backend="tiled_interp",
                             ray_mask=jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(part.rgb)[:16, :16], np.asarray(full.rgb)[:16, :16],
        atol=1e-5)
    # culled tiles render as pure background (transmittance 1)
    np.testing.assert_allclose(np.asarray(part.acc)[16:, 16:], 0.0, atol=1e-7)


def test_multibounce_zero_depth_equals_single_trace():
    scene = _dome_scene()
    H = W = 16
    rng = np.random.default_rng(2)
    o = jnp.zeros((H, W, 3))
    d = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    single = trace_rays_reference(scene, o, d, bg)
    multi, mids = tracer.trace_rays_multibounce(
        scene, o, d, bg, max_trace_depth=0, backend="ref")
    np.testing.assert_allclose(np.asarray(multi.rgb), np.asarray(single.rgb),
                               atol=1e-6)
    assert len(mids) == 1


def test_multibounce_reflects_specular_surface():
    """A fully-specular mirror plane facing a colored wall: bounce-1 color
    must show up in the composited ray color."""
    # splat 0: mirror at z=2 (normal -z), specular 1; splat 1: red wall at
    # z=-2 behind the origin, hit by the reflected ray
    mean = jnp.asarray([[0, 0, 2.0], [0, 0, -2.0]], jnp.float32)
    quat = jnp.asarray([[1, 0, 0, 0], [1, 0, 0, 0]], jnp.float32)
    scales = jnp.full((2, 2), 4.0, jnp.float32)
    opac = jnp.asarray([0.999, 0.999], jnp.float32)
    color = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    aux = jnp.asarray([[1.0, 0.0], [0.0, 0.0]], jnp.float32)  # spec, rough
    scene = prepare_trace_scene(mean, quat, scales, opac, color, aux=aux)
    o = jnp.zeros((1, 1, 3))
    d = jnp.asarray([[[0.0, 0.0, 1.0]]])
    bg = jnp.zeros(3)
    out, mids = tracer.trace_rays_multibounce(
        scene, o, d, bg, max_trace_depth=1, specular_threshold=0.5,
        backend="ref")
    assert len(mids) == 2
    # composited color is dominated by the reflected red wall
    rgb = np.asarray(out.rgb)[0, 0]
    assert rgb[0] > 0.5, rgb
    assert rgb[1] < 0.1 and rgb[2] < 0.1


@pytest.mark.slow
def test_specular_filtering_gate():
    """With an extreme filtering percentile, unfiltered pixels keep the pure
    base color after the reflection start."""
    cam = _cam(H=32, W=32)
    base, env = _pools()
    cfg = _REF._replace(specular_filtering_start_iter=5,
                        specular_filtering_percent=0.99)
    it = jnp.asarray(10)
    out = forward_envgs(base, env, cam, it, cfg)
    out_plain = forward_envgs(base, env, cam, it, _REF)
    # ~99% of pixels keep the base (diffuse-composite) color
    base_rgb = np.asarray(out_plain.dif_rgb_map) / np.clip(
        1 - np.asarray(out_plain.spec_map), 1e-6, None)
    diff = np.abs(np.asarray(out.rgb_map) - base_rgb).max(-1)
    assert (diff < 1e-5).mean() > 0.95
    # before the gate iteration, filtering is inactive (matches plain)
    out0 = forward_envgs(base, env, cam, jnp.asarray(1), cfg)
    np.testing.assert_allclose(np.asarray(out0.rgb_map),
                               np.asarray(out_plain.rgb_map), atol=1e-5)
