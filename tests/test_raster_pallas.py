"""Parity of the Pallas tile rasterizer (interpret mode) vs the pure-JAX
reference — mirrors the reference's CUDA-vs-pytorch grad_check strategy
(/root/reference/easyvolcap/utils/test_utils.py:30-69)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from envgs_tpu.ops.common import prepare_splats
from envgs_tpu.ops.raster import rasterize
from envgs_tpu.utils.camera import make_camera


def _cam(H=64, W=64, f=80.0):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return make_camera(H, W, K, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))


def _random_scene(P=200, C=3, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [
            rng.normal(size=(P, 2)).astype(np.float32) * spread * 0.5,
            (rng.random((P, 1)).astype(np.float32) * 4.0 + 1.5),
        ],
        axis=1,
    )
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    scales = (rng.random((P, 2)).astype(np.float32) * 0.25 + 0.02)
    opac = rng.random(P).astype(np.float32) * 0.9 + 0.05
    colors = rng.random((P, C)).astype(np.float32)
    return (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors),
    )


def _prep(scene, cam):
    return prepare_splats(*scene, cam)


@pytest.mark.parametrize("C", [3, 5])
def test_forward_parity(C):
    cam = _cam()
    scene = _random_scene(C=C)
    prep = _prep(scene, cam)
    bg = jnp.arange(1, C + 1, dtype=jnp.float32) / (C + 1)
    ref = rasterize(prep, cam, bg, backend="ref")
    out = rasterize(prep, cam, bg, backend="pallas_interp", pair_cap=2 ** 13)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.depth_expected),
                               np.asarray(ref.depth_expected),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.normal), np.asarray(ref.normal),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.trans), np.asarray(ref.trans),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.distortion),
                               np.asarray(ref.distortion), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.depth_median),
                               np.asarray(ref.depth_median), atol=1e-3,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.wet), np.asarray(ref.wet),
                               atol=5e-3, rtol=1e-3)


@pytest.mark.slow
def test_grad_parity():
    cam = _cam(48, 48)
    scene = _random_scene(P=120, seed=3)
    bg = jnp.asarray([0.2, 0.3, 0.4])
    rng = np.random.default_rng(7)
    # random cotangent projections to compare full VJPs
    gr = jnp.asarray(rng.normal(size=(48, 48, 3)).astype(np.float32))
    gd = jnp.asarray(rng.normal(size=(48, 48)).astype(np.float32))
    ga = jnp.asarray(rng.normal(size=(48, 48)).astype(np.float32))
    gn = jnp.asarray(rng.normal(size=(48, 48, 3)).astype(np.float32))
    gdist = jnp.asarray(rng.normal(size=(48, 48)).astype(np.float32))

    def loss(backend, means, quats, scales, opac, colors, m2z):
        prep = prepare_splats(means, quats, scales, opac, colors, cam)
        out = rasterize(prep, cam, bg, backend=backend, pair_cap=2 ** 12,
                        means2d_zero=m2z)
        return (
            jnp.sum(out.rgb * gr)
            + jnp.sum(out.depth_expected * gd)
            + jnp.sum(out.alpha * ga)
            + jnp.sum(out.normal * gn)
            + 0.1 * jnp.sum(out.distortion * gdist)
        )

    m2z = jnp.zeros((120, 2))
    args = scene + (m2z,)
    g_ref = jax.grad(lambda *a: loss("ref", *a), argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_pal = jax.grad(lambda *a: loss("pallas_interp", *a),
                     argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ["means", "quats", "scales", "opac", "colors", "means2d"]
    for name, gr_, gp_ in zip(names, g_ref, g_pal):
        gr_, gp_ = np.asarray(gr_), np.asarray(gp_)
        assert np.all(np.isfinite(gp_)), name
        scale = np.abs(gr_).max() + 1e-6
        np.testing.assert_allclose(
            gp_ / scale, gr_ / scale, atol=5e-4,
            err_msg=f"grad mismatch: {name}",
        )
    # screen-space translation gradient must be nonzero (densify signal)
    assert float(np.abs(np.asarray(g_pal[5])).sum()) > 0


@pytest.mark.slow
def test_empty_scene():
    cam = _cam(32, 32)
    scene = _random_scene(P=16)
    # all opacities zero -> background only
    scene = scene[:3] + (jnp.zeros(16),) + scene[4:]
    prep = _prep(scene, cam)
    out = rasterize(prep, cam, jnp.asarray([1.0, 0.5, 0.25]),
                    backend="pallas_interp", pair_cap=2 ** 10)
    np.testing.assert_allclose(
        np.asarray(out.rgb),
        np.broadcast_to([1.0, 0.5, 0.25], (32, 32, 3)),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(out.trans), 1.0, atol=1e-6)


@pytest.mark.slow
def test_render_mode_unaligned_parity():
    """Pure-render calls (needs all-False) take the unaligned pair layout
    (no chunk-alignment stage; the blend kernel masks each tile's tail
    chunk) — rgb/alpha/depth/normal/trans must match the reference."""
    cam = _cam()
    scene = _random_scene(P=300, seed=3)
    prep = _prep(scene, cam)
    bg = jnp.asarray([0.2, 0.4, 0.6])
    ref = rasterize(prep, cam, bg, backend="ref")
    out = rasterize(prep, cam, bg, backend="pallas_interp",
                    pair_cap=2 ** 13, needs=(False, False, False))
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.depth_expected),
                               np.asarray(ref.depth_expected),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.normal), np.asarray(ref.normal),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.trans), np.asarray(ref.trans),
                               atol=2e-4)


@pytest.mark.slow
def test_gradient_lane_wet_matches_forward_wet():
    """With wet_zero, per-splat wet arrives as d(loss)/d(wet_zero) through
    the blend backward's WET_COL lane — it must match the forward
    segment-sum wet (and the forward wet output must be exact zeros)."""
    cam = _cam()
    scene = _random_scene(P=150, seed=4)
    prep = _prep(scene, cam)
    bg = jnp.zeros(3)
    P = prep.depth.shape[0]

    out_fwd = rasterize(prep, cam, bg, backend="pallas_interp",
                        pair_cap=2 ** 12)

    def loss(wz):
        out = rasterize(prep, cam, bg, backend="pallas_interp",
                        pair_cap=2 ** 12, wet_zero=wz)
        # the primal ignores wz; the custom VJP defines its cotangent
        return jnp.sum(out.rgb)

    g_wet = jax.grad(loss)(jnp.zeros(P))
    # rtol: the lane rides presort_transpose's prefix-difference reduction,
    # whose block-spanning cancellation is ~1e-3 relative (the same budget
    # every parameter gradient gets); exact zeros stay exact zeros, so
    # visibility (wet > 0) is unaffected
    np.testing.assert_allclose(np.asarray(g_wet), np.asarray(out_fwd.wet),
                               rtol=1e-2, atol=1e-4)
    fw = np.asarray(out_fwd.wet)
    np.testing.assert_array_equal(np.asarray(g_wet)[fw == 0], 0.0)
    wet_zeroed = rasterize(prep, cam, bg, backend="pallas_interp",
                           pair_cap=2 ** 12, wet_zero=jnp.zeros(P)).wet
    np.testing.assert_array_equal(np.asarray(wet_zeroed), 0.0)


@pytest.mark.slow
def test_distortion_moment_cotangents_match_oracle():
    """The d1/d2 moment outputs' cotangents (consumed by splat-slab
    composition) must flow through the blend backward like the depth
    row's — verified against the pure-JAX oracle."""
    cam = _cam(48, 48)
    scene = _random_scene(P=120, seed=3)
    bg = jnp.zeros(3)
    rng = np.random.default_rng(7)
    gd1 = jnp.asarray(rng.normal(size=(48, 48)).astype(np.float32))
    gd2 = jnp.asarray(rng.normal(size=(48, 48)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(48, 48)).astype(np.float32))

    def loss(backend, means, quats, scales, opac, colors):
        prep = prepare_splats(means, quats, scales, opac, colors, cam)
        out = rasterize(prep, cam, bg, backend=backend, pair_cap=2 ** 12)
        return (jnp.sum(out.d1 * gd1) + jnp.sum(out.d2 * gd2)
                + jnp.sum(out.trans * gt))

    g_r = jax.grad(lambda *a: loss("ref", *a), argnums=(0, 3))(*scene)
    g_p = jax.grad(lambda *a: loss("pallas_interp", *a), argnums=(0, 3))(*scene)
    for name, a, b in zip(("xyz", "opacity"), g_r, g_p):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-4,
                                   err_msg=name)


@pytest.mark.slow
def test_row_window_crop_matches_full_render():
    """rasterize(row_window=(row0, band_h)) reproduces the matching rows
    of a full render — the band-parallel row-crop contract (prep/binning
    floats are full-camera values; banding is integer tile arithmetic + a
    global pixel-row offset in the kernel).

    The ALIGNED (training) layout is BIT-identical: chunk windows start
    at CHUNK multiples in both runs, so every float sums in the same
    grouping. The unaligned render fast path rounds each tile's window
    down to its own start%8, so chunk GROUPING shifts between the two
    runs and blending reassociates at the 1-ulp level — asserted <=2e-7."""
    cam = _cam(H=64, W=64)
    scene = _random_scene(C=3, seed=5)
    prep = _prep(scene, cam)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    full_a = rasterize(prep, cam, bg, backend="pallas_interp",
                       pair_cap=2 ** 12, needs=(True, True, True))
    full_u = rasterize(prep, cam, bg, backend="pallas_interp",
                       pair_cap=2 ** 12, needs=(True, True, False))
    for row0 in (0, 16, 48):
        rw = (jnp.asarray(row0, jnp.int32), 16)
        sl = slice(row0, row0 + 16)
        band = rasterize(prep, cam, bg, backend="pallas_interp",
                         pair_cap=2 ** 12, needs=(True, True, True),
                         row_window=rw)
        for name in ("rgb", "alpha", "depth_expected", "normal"):
            np.testing.assert_array_equal(
                np.asarray(getattr(band, name)),
                np.asarray(getattr(full_a, name))[sl], err_msg=name)
        band_u = rasterize(prep, cam, bg, backend="pallas_interp",
                           pair_cap=2 ** 12, needs=(True, True, False),
                           row_window=rw)
        np.testing.assert_allclose(
            np.asarray(band_u.rgb), np.asarray(full_u.rgb)[sl], atol=2e-7)
