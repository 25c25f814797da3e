"""3DGS (EWA) rasterizer: oracle sanity + Pallas gauss3d-mode parity —
the diff_gauss model family (reference GaussianTSampler,
/root/reference/easyvolcap/models/samplers/gaussiant_sampler.py:173-280),
tested with the reference's CUDA-vs-pytorch grad_check strategy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from envgs_tpu.ops.raster3d import (
    prepare_splats3d,
    rasterize3d,
    render_gaussians3d,
)
from envgs_tpu.utils.camera import make_camera


def _cam(H=64, W=64, f=80.0):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return make_camera(H, W, K, np.eye(3, dtype=np.float32),
                       np.zeros(3, np.float32))


def _random_scene(P=200, C=3, seed=0):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [
            rng.normal(size=(P, 2)).astype(np.float32) * 0.5,
            (rng.random((P, 1)).astype(np.float32) * 4.0 + 1.5),
        ],
        axis=1,
    )
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    scales = (rng.random((P, 3)).astype(np.float32) * 0.12 + 0.02)
    opac = rng.random(P).astype(np.float32) * 0.9 + 0.05
    colors = rng.random((P, C)).astype(np.float32)
    return (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors),
    )


def test_oracle_sanity():
    cam = _cam()
    scene = _random_scene()
    prep = prepare_splats3d(*scene, cam)
    out = rasterize3d(prep, cam, jnp.zeros(3), backend="ref")
    assert int(jnp.sum(prep.valid)) > 100
    assert bool(jnp.isfinite(out.rgb).all())
    a = np.asarray(out.alpha)
    assert a.max() > 0.5 and a.min() >= 0.0 and a.max() <= 1.0 + 1e-5
    # expected depth premultiplied by alpha: normalized depth in scene range
    d = np.asarray(out.depth) / np.clip(a, 1e-6, None)
    assert 1.0 < d[a > 0.5].mean() < 6.0
    assert float(out.wet.sum()) > 0


@pytest.mark.slow
def test_forward_parity():
    cam = _cam()
    scene = _random_scene()
    prep = prepare_splats3d(*scene, cam)
    bg = jnp.asarray([0.2, 0.5, 0.8])
    ref = rasterize3d(prep, cam, bg, backend="ref")
    out = rasterize3d(prep, cam, bg, backend="pallas_interp",
                      pair_cap=2 ** 13)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=1.5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.trans), np.asarray(ref.trans),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(out.wet), np.asarray(ref.wet),
                               atol=5e-3, rtol=1e-3)


@pytest.mark.slow
def test_grad_parity():
    cam = _cam(48, 48)
    scene = _random_scene(P=120, seed=3)
    bg = jnp.asarray([0.2, 0.3, 0.4])
    rng = np.random.default_rng(7)
    gr = jnp.asarray(rng.normal(size=(48, 48, 3)).astype(np.float32))
    gd = jnp.asarray(rng.normal(size=(48, 48)).astype(np.float32))
    ga = jnp.asarray(rng.normal(size=(48, 48)).astype(np.float32))

    def loss(backend, means, quats, scales, opac, colors, m2z):
        out = render_gaussians3d(means, quats, scales, opac, colors, cam,
                                 bg, backend=backend, pair_cap=2 ** 12,
                                 means2d_zero=m2z)
        return (jnp.sum(out.rgb * gr) + jnp.sum(out.depth * gd)
                + jnp.sum(out.alpha * ga))

    m2z = jnp.zeros((120, 2))
    args = (*scene, m2z)
    g_ref = jax.grad(lambda *a: loss("ref", *a), argnums=(0, 1, 2, 3, 4, 5))(
        *args)
    g_out = jax.grad(lambda *a: loss("pallas_interp", *a),
                     argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ["means", "quats", "scales", "opacity", "colors", "means2d"]
    for n, a, b in zip(names, g_ref, g_out):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-3,
                                   err_msg=f"grad mismatch: {n}")


def test_active_mask_and_scale_modifier():
    cam = _cam()
    means, quats, scales, opac, colors = _random_scene(P=64, seed=5)
    active = jnp.asarray(np.arange(64) % 2 == 0)
    out_half = render_gaussians3d(means, quats, scales, opac, colors, cam,
                                  backend="ref", active=active)
    out_full = render_gaussians3d(means, quats, scales, opac, colors, cam,
                                  backend="ref")
    assert float(out_half.alpha.sum()) < float(out_full.alpha.sum())
    # inactive splats accumulate no weight
    assert float(out_half.wet[1::2].sum()) == 0.0
    # doubling all scales grows coverage
    out_big = render_gaussians3d(means, quats, scales, opac, colors, cam,
                                 backend="ref", scale_modifier=2.0)
    assert float(out_big.alpha.sum()) > float(out_full.alpha.sum())


def test_mip_splatting_antialiasing():
    """diff_mip_rasterization parity: the 3D smoothing filter + 2D mip
    filter preserve splat mass where classic dilation inflates it."""
    from envgs_tpu.ops.raster3d_ref import compute_filter3d

    cam = _cam(64, 64, f=80.0)
    rng = np.random.default_rng(11)
    P = 64
    means = np.concatenate(
        [rng.normal(size=(P, 2)).astype(np.float32) * 0.4,
         np.full((P, 1), 3.0, np.float32)], -1)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    # subpixel splats: world scale far below one pixel (pixel ~ z/f = 0.0375)
    scales = np.full((P, 3), 0.004, np.float32)
    opac = np.full((P,), 0.8, np.float32)
    colors = rng.random((P, 3)).astype(np.float32)
    args = (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors))

    f3d = compute_filter3d(args[0], [cam])
    # sampling interval at depth 3 with f=80: 3/80 * sqrt(0.2) ~ 0.0168
    assert np.allclose(np.asarray(f3d), 3.0 / 80.0 * np.sqrt(0.2), atol=1e-3)

    classic = render_gaussians3d(*args, cam, backend="ref")
    mip = render_gaussians3d(*args, cam, backend="ref", filter3d=f3d,
                             mip=True)
    a_classic = float(classic.alpha.sum())
    a_mip = float(mip.alpha.sum())
    # classic dilation inflates subpixel splats; mip compensation removes
    # most of the inflation
    assert a_mip < 0.7 * a_classic, (a_classic, a_mip)
    assert a_mip > 0.0 and bool(jnp.isfinite(mip.rgb).all())

    # a larger smoothing filter spreads the same mass wider at lower peak:
    # opacity compensation must be monotone in the filter scale
    mip_big = render_gaussians3d(*args, cam, backend="ref",
                                 filter3d=2.0 * f3d, mip=True)
    assert float(mip_big.alpha.sum()) <= a_mip + 1e-4
    # well-resolved splats (scale >> filter) are nearly unaffected
    scales_big = jnp.full((P, 3), 0.2)
    big_plain = render_gaussians3d(args[0], args[1], scales_big, args[3],
                                   args[4], cam, backend="ref")
    big_mip = render_gaussians3d(args[0], args[1], scales_big, args[3],
                                 args[4], cam, backend="ref", filter3d=f3d,
                                 mip=True)
    ratio = float(big_mip.alpha.sum()) / max(float(big_plain.alpha.sum()),
                                             1e-6)
    assert 0.9 < ratio < 1.1, ratio
