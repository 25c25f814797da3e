"""Tracer tests: exact reference behavior + tiled Pallas parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from envgs_tpu.ops.tracer import trace_rays
from envgs_tpu.ops.tracer_ref import prepare_trace_scene, trace_rays_reference


def _quat_z_to(dirs):
    """wxyz quaternions rotating +z to each (unit) direction."""
    z = np.array([0.0, 0.0, 1.0])
    axis = np.cross(np.broadcast_to(z, dirs.shape), dirs)
    s = np.linalg.norm(axis, axis=-1, keepdims=True)
    axis = np.where(s > 1e-6, axis / np.clip(s, 1e-6, None), [1.0, 0, 0])
    ang = np.arccos(np.clip(dirs[..., 2:3], -1, 1))
    return np.concatenate(
        [np.cos(ang / 2), axis * np.sin(ang / 2)], axis=-1
    ).astype(np.float32)


def _shell_scene(P=64, seed=0, rmin=4.0, rmax=8.0, tangent=True, jitter=0.03):
    """Random surfels on spherical shells around the origin. With
    tangent=True, surfel planes are tangent to their shell (the realistic
    environment-dome geometry), making center-distance blend order per-ray
    exact; tangent=False gives the adversarial tilted-overlap regime."""
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(P, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    radii = rng.choice(np.linspace(rmin, rmax, 8), size=P)
    means = (dirs * radii[:, None]).astype(np.float32)
    if tangent:
        quats = _quat_z_to(dirs)
        quats += jitter * rng.normal(size=(P, 4)).astype(np.float32)
    else:
        quats = rng.normal(size=(P, 4)).astype(np.float32)
    scales = (rng.random((P, 2)) * 0.3 + 0.1).astype(np.float32)
    opac = (rng.random(P) * 0.8 + 0.1).astype(np.float32)
    colors = rng.random((P, 3)).astype(np.float32)
    return (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors))


def _ray_grid(H=16, W=16, seed=1, spread=0.35):
    """Coherent ray bundle (reflected-ray-like) from near the origin."""
    rng = np.random.default_rng(seed)
    base = np.array([0.3, -0.2, 1.0])
    base /= np.linalg.norm(base)
    jj, ii = np.meshgrid(np.linspace(-1, 1, W), np.linspace(-1, 1, H))
    d = base[None, None] + spread * np.stack(
        [jj, ii, np.zeros_like(jj)], axis=-1
    )
    o = rng.normal(size=3).astype(np.float32) * 0.1 + np.zeros(3)
    o = np.broadcast_to(o, (H, W, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def test_reference_tracer_basics():
    scene_args = _shell_scene()
    scene = prepare_trace_scene(*scene_args)
    o, d = _ray_grid()
    out = trace_rays_reference(scene, o, d, jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(out.rgb)))
    assert float(out.acc.max()) <= 1.0 + 1e-5
    # o + t*d must land on surfels: re-render from returned depth
    assert float(out.dpt.max()) > 0


def test_reference_tracer_occlusion():
    """An opaque near splat must hide a far splat along the same ray."""
    means = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 5.0]])
    quats = jnp.asarray([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    scales = jnp.full((2, 2), 2.0)
    opac = jnp.asarray([0.99, 0.99])
    colors = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
    scene = prepare_trace_scene(means, quats, scales, opac, colors)
    o = jnp.zeros((1, 1, 3))
    d = jnp.asarray([[[0.0, 0.0, 1.0]]])
    out = trace_rays_reference(scene, o, d, jnp.zeros(3))
    px = np.asarray(out.rgb[0, 0])
    assert px[0] > 0.95 and px[1] < 0.05
    assert abs(float(out.dpt[0, 0]) - 2.0) < 0.05


@pytest.mark.slow
def test_reference_tracer_zdepth_scaling():
    """Scaling ray_d by s scales the returned t by 1/s (z-depth contract)."""
    scene = prepare_trace_scene(*_shell_scene(P=32, seed=2))
    o, d = _ray_grid(4, 4)
    out1 = trace_rays_reference(scene, o, d, jnp.zeros(3))
    out2 = trace_rays_reference(scene, o, 2.0 * d, jnp.zeros(3))
    np.testing.assert_allclose(
        np.asarray(out1.dpt), np.asarray(out2.dpt) * 2.0, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out1.rgb), np.asarray(out2.rgb), atol=1e-5
    )


def test_tiled_tracer_parity():
    scene = prepare_trace_scene(*_shell_scene(P=96, seed=3))
    o, d = _ray_grid(16, 16, seed=4)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    ref = trace_rays_reference(scene, o, d, bg)
    out = trace_rays(scene, o, d, bg, backend="tiled_interp")
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               atol=3e-3)
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.dpt), np.asarray(ref.dpt),
                               atol=2e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out.norm), np.asarray(ref.norm),
                               atol=3e-3)
    np.testing.assert_allclose(np.asarray(out.wet), np.asarray(ref.wet),
                               atol=1e-2, rtol=2e-2)


def test_tiled_tracer_adversarial_order():
    """Tilted overlapping splats: center-keyed order deviates from per-ray
    order (the same approximation class as tile rasterization's per-tile
    center-depth sort). Bound the blend-order error statistically."""
    scene = prepare_trace_scene(*_shell_scene(P=96, seed=3, tangent=False))
    o, d = _ray_grid(16, 16, seed=4)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    ref = trace_rays_reference(scene, o, d, bg)
    out = trace_rays(scene, o, d, bg, backend="tiled_interp")
    diff = np.abs(np.asarray(out.rgb) - np.asarray(ref.rgb))
    assert diff.max() < 0.15
    assert diff.mean() < 5e-3


@pytest.mark.slow
def test_tiled_tracer_grad_parity():
    scene_args = _shell_scene(P=48, seed=5)
    o, d = _ray_grid(16, 16, seed=6)
    bg = jnp.asarray([0.0, 0.0, 0.0])
    rng = np.random.default_rng(8)
    gr = jnp.asarray(rng.normal(size=(16, 16, 3)).astype(np.float32))
    gd = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32))

    def loss(backend, means, quats, scales, opac, colors, o_, d_):
        scene = prepare_trace_scene(means, quats, scales, opac, colors)
        if backend == "ref":
            out = trace_rays_reference(scene, o_, d_, bg)
        else:
            out = trace_rays(scene, o_, d_, bg, backend="tiled_interp")
        return jnp.sum(out.rgb * gr) + jnp.sum(out.acc * gd) + jnp.sum(
            out.dpt * gd * out.acc
        )

    args = scene_args + (o, d)
    g_ref = jax.grad(lambda *a: loss("ref", *a), argnums=tuple(range(7)))(*args)
    g_til = jax.grad(lambda *a: loss("tiled", *a), argnums=tuple(range(7)))(*args)
    names = ["means", "quats", "scales", "opac", "colors", "ray_o", "ray_d"]
    for name, a_, b_ in zip(names, g_ref, g_til):
        a_, b_ = np.asarray(a_), np.asarray(b_)
        assert np.all(np.isfinite(b_)), name
        scale = np.abs(a_).max() + 1e-6
        np.testing.assert_allclose(
            b_ / scale, a_ / scale, atol=3e-3, err_msg=f"tracer grad: {name}"
        )


@pytest.mark.slow
def test_tracer_render_mode_strips_training_outputs():
    """needs=(False, False) (pure render) must leave rgb/acc/dpt/norm
    bit-identical and zero the training-only wet/dist outputs."""
    scene = prepare_trace_scene(*_shell_scene(P=96, seed=3))
    o, d = _ray_grid(16, 16, seed=4)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    full = trace_rays(scene, o, d, bg, backend="tiled_interp")
    lean = trace_rays(scene, o, d, bg, backend="tiled_interp",
                      needs=(False, False))
    for k in ("rgb", "acc", "dpt", "norm"):
        np.testing.assert_array_equal(
            np.asarray(getattr(full, k)), np.asarray(getattr(lean, k)), err_msg=k)
    assert np.all(np.asarray(lean.wet) == 0.0)


@pytest.mark.slow
def test_tracer_gradient_lane_wet_matches_forward_wet():
    """Tracer counterpart of the raster wet-lane test: with wet_zero, the
    per-splat traced wet arrives as d(loss)/d(wet_zero) and must match the
    forward segment-sum wet; forward wet output becomes exact zeros."""
    scene = prepare_trace_scene(*_shell_scene(P=96, seed=5))
    ray_o, ray_d = _ray_grid(16, 16, seed=6)
    bg = jnp.zeros(3)

    out_fwd = trace_rays(scene, ray_o, ray_d, bg, backend="tiled_interp",
                         total_pair_cap=2 ** 12)
    P = scene.mean.shape[0]

    def loss(wz):
        out = trace_rays(scene, ray_o, ray_d, bg, backend="tiled_interp",
                         total_pair_cap=2 ** 12, wet_zero=wz)
        return jnp.sum(out.rgb)

    g_wet = jax.grad(loss)(jnp.zeros(P))
    fw = np.asarray(out_fwd.wet)
    np.testing.assert_allclose(np.asarray(g_wet), fw, rtol=1e-2, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(g_wet)[fw == 0], 0.0)
    wet_zeroed = trace_rays(scene, ray_o, ray_d, bg,
                            backend="tiled_interp",
                            total_pair_cap=2 ** 12,
                            wet_zero=jnp.zeros(P)).wet
    np.testing.assert_array_equal(np.asarray(wet_zeroed), 0.0)


def test_exact_order_matches_oracle():
    """exact_order=True re-blends the production candidate windows in
    per-ray depth order: on the ADVERSARIAL tilted-overlap scene (where the
    radial order deviates, test_tiled_tracer_adversarial_order) it must
    match the oracle to float tolerance, because with no cull truncation
    the only difference left is summation order."""
    scene = prepare_trace_scene(*_shell_scene(P=96, seed=3, tangent=False))
    o, d = _ray_grid(16, 16, seed=4)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    ref = trace_rays_reference(scene, o, d, bg)
    out = trace_rays(scene, o, d, bg, backend="tiled_interp",
                     exact_order=True)
    for a, b in [(out.rgb, ref.rgb), (out.acc, ref.acc), (out.dpt, ref.dpt),
                 (out.norm, ref.norm), (out.dist, ref.dist),
                 (out.trans, ref.trans)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4)
    # PSNR formulation of the same bound (VERDICT r3: parity <= 0.01 dB)
    mse = float(np.mean((np.asarray(out.rgb) - np.asarray(ref.rgb)) ** 2))
    assert mse < 1e-10
