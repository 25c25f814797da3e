import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.ops.common import prepare_splats
from envgs_tpu.ops.raster_ref import rasterize_reference
from envgs_tpu.utils.camera import make_camera
import pytest


def _cam(H=40, W=48, f=60.0):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return make_camera(H, W, K, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))


def _single_splat(z=2.0, s=0.3, opac=0.8, color=(1.0, 0.0, 0.0)):
    means = jnp.array([[0.0, 0.0, z]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])  # identity: splat plane ⟂ z
    scales = jnp.array([[s, s]])
    opacity = jnp.array([opac])
    colors = jnp.array([color])
    return means, quats, scales, opacity, colors


def test_single_splat_center_alpha():
    cam = _cam()
    prep = prepare_splats(*_single_splat(), cam)
    out = rasterize_reference(prep, cam, jnp.zeros(3))
    cx, cy = cam.W // 2, cam.H // 2
    # at the splat center the Gaussian response is ~1 -> alpha ~ opacity
    assert abs(float(out.alpha[cy, cx]) - 0.8) < 0.02
    # expected depth premultiplied by alpha
    assert abs(float(out.depth_expected[cy, cx]) / float(out.alpha[cy, cx]) - 2.0) < 1e-3
    # median depth = splat depth
    assert abs(float(out.depth_median[cy, cx]) - 2.0) < 1e-3
    # color = w * red + T * bg
    np.testing.assert_allclose(
        np.asarray(out.rgb[cy, cx]), [0.8, 0.0, 0.0], atol=0.02
    )
    # normal points toward camera (-z in view space)
    n = np.asarray(out.normal[cy, cx])
    assert n[2] < 0
    # far away pixels untouched
    assert float(out.alpha[0, 0]) < 1e-3
    # wet ~ sum of weights > 0
    assert float(out.wet[0]) > 0


def test_background_blend():
    cam = _cam()
    prep = prepare_splats(*_single_splat(opac=0.5), cam)
    bg = jnp.array([0.0, 1.0, 0.0])
    out = rasterize_reference(prep, cam, bg)
    cx, cy = cam.W // 2, cam.H // 2
    px = np.asarray(out.rgb[cy, cx])
    assert abs(px[0] - 0.5) < 0.02  # w * red
    assert abs(px[1] - 0.5) < 0.02  # T * green bg


@pytest.mark.slow
def test_two_splats_occlusion_order():
    cam = _cam()
    means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    scales = jnp.full((2, 2), 0.5)
    opacity = jnp.array([0.9, 0.9])
    colors = jnp.array([[1.0, 0, 0], [0, 0, 1.0]])
    prep = prepare_splats(means, quats, scales, opacity, colors, cam)
    out = rasterize_reference(prep, cam, jnp.zeros(3))
    cx, cy = cam.W // 2, cam.H // 2
    px = np.asarray(out.rgb[cy, cx])
    # near red splat dominates: w0=0.9, w1=0.1*0.9=0.09
    assert px[0] > 0.85 and px[2] < 0.15
    # median depth is the first splat crossing T=0.5
    assert abs(float(out.depth_median[cy, cx]) - 2.0) < 1e-3
    # order independence of input: swap inputs, same result
    prep2 = prepare_splats(
        means[::-1], quats, scales, opacity[::-1], colors[::-1], cam
    )
    out2 = rasterize_reference(prep2, cam, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out2.rgb), np.asarray(out.rgb), atol=1e-5)


@pytest.mark.slow
def test_padded_pool_mask():
    """Inactive pool slots must not contribute."""
    cam = _cam()
    means, quats, scales, opacity, colors = _single_splat()
    pad = lambda x, v: jnp.concatenate([x, jnp.full((3,) + x.shape[1:], v)], 0)
    active = jnp.array([True, False, False, False])
    prep = prepare_splats(
        pad(means, 0.1), pad(quats, 1.0), pad(scales, 1.0), pad(opacity, 1.0),
        pad(colors, 1.0), cam, active=active,
    )
    out = rasterize_reference(prep, cam, jnp.zeros(3))
    prep1 = prepare_splats(means, quats, scales, opacity, colors, cam)
    out1 = rasterize_reference(prep1, cam, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(out1.rgb), atol=1e-6)


def test_tilted_splat_depth_gradient():
    """A tilted surfel must show a depth gradient across the image."""
    cam = _cam()
    # rotate 40deg about y: quat (cos20, 0, sin20, 0)
    a = np.deg2rad(40 / 2)
    quats = jnp.array([[np.cos(a), 0.0, np.sin(a), 0.0]], jnp.float32)
    means = jnp.array([[0.0, 0.0, 2.0]])
    prep = prepare_splats(
        means, quats, jnp.array([[0.8, 0.8]]), jnp.array([0.95]),
        jnp.array([[1.0, 1.0, 1.0]]), cam,
    )
    out = rasterize_reference(prep, cam, jnp.zeros(3))
    cy = cam.H // 2
    a_ = np.asarray(out.alpha[cy])
    cols = np.where(a_ > 0.5)[0]
    assert len(cols) > 4
    d = np.asarray(out.depth_expected[cy]) / np.clip(a_, 1e-6, None)
    # depth should vary monotonically along the tilt direction
    dd = np.diff(d[cols])
    assert np.all(dd > 0) or np.all(dd < 0)


@pytest.mark.slow
def test_autodiff_flows():
    cam = _cam(24, 24, f=40.0)
    means, quats, scales, opacity, colors = _single_splat(s=0.4)

    def loss(means, scales, opacity, colors):
        prep = prepare_splats(means, quats, scales, opacity, colors, cam)
        out = rasterize_reference(prep, cam, jnp.zeros(3))
        return jnp.sum(out.rgb**2) + jnp.sum(out.distortion) + jnp.sum(out.alpha)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(means, scales, opacity, colors)
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))
    assert float(jnp.abs(g[2]).sum()) > 0  # opacity grad nonzero
    assert float(jnp.abs(g[0]).sum()) > 0  # position grad nonzero
