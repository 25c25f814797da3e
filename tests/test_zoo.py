"""Embedder/regressor zoo breadth (VERDICT r3 item 7): shape + gradient
checks for every component reachable from the reference's shipped configs
(grep 'type: *Embedder|*Regressor' over /root/reference/configs), and
registry-name parity for the full set."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from envgs_tpu.models.embedders import (
    SpacetimeEmbedder,
    depth_embedder,
    empty_embedder,
    noop_embedder,
    sh_dir_encoding,
)
from envgs_tpu.models.regressors import (
    DisplacementRegressor,
    ImageBasedRegressor,
    ImageBasedSphericalHarmonics,
    ResidualRegressor,
    SE3Regressor,
    empty_regressor,
    noop_regressor,
    se3_exp_rt,
    zero_regressor,
)


def _grad_ok(f, *args):
    """Finite, nonzero-capable gradient through f wrt args[0]."""
    g = jax.grad(lambda *a: jnp.sum(f(*a) ** 2))(*args)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    return g


def test_trivial_embedders_and_regressors():
    x = jnp.ones((4, 7, 3))
    assert empty_embedder(x).shape == (4, 7, 0)
    assert noop_embedder(x) is x
    assert empty_regressor(x).shape == (4, 7, 0)
    assert noop_regressor(x) is x
    assert zero_regressor(x, out_dim=5).shape == (4, 7, 5)
    np.testing.assert_array_equal(np.asarray(zero_regressor(x)), 0.0)


def test_sh_dir_encoding_matches_eval_sh():
    """basis . coeffs == eval_sh for every supported degree."""
    from envgs_tpu.utils.sh import eval_sh

    rng = np.random.default_rng(0)
    d = rng.normal(size=(50, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    for degree in (1, 2, 3, 4, 5):  # tcnn degree = deg + 1
        enc = sh_dir_encoding(d, degree=degree)
        assert enc.shape == (50, degree ** 2)
        sh = jnp.asarray(
            rng.normal(size=(50, 1, degree ** 2)), jnp.float32)
        ref = eval_sh(degree - 1, sh, d)[:, 0]
        np.testing.assert_allclose(
            np.asarray(jnp.sum(enc * sh[:, 0], -1)), np.asarray(ref),
            rtol=1e-5, atol=1e-5)


def test_spacetime_embedder():
    emb = SpacetimeEmbedder(n_views=5, n_frames=7, space_dim=4, time_dim=6)
    params = emb.init(jax.random.PRNGKey(0))
    out = emb(params, jnp.asarray([0, 2]), jnp.asarray([3, 3]))
    assert out.shape == (2, 10)
    # same (v, t) -> same code; different v -> different space half
    out2 = emb(params, jnp.asarray([0, 0]), jnp.asarray([3, 3]))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]))
    assert not np.allclose(np.asarray(out[1, :4]), np.asarray(out2[1, :4]))
    np.testing.assert_allclose(np.asarray(out[1, 4:]),
                               np.asarray(out2[1, 4:]))
    _grad_ok(lambda p: emb(p, jnp.asarray([1]), jnp.asarray([2])), params)


def test_depth_embedder():
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.normal(size=(30, 3)) + [0, 0, 5], jnp.float32)
    R = jnp.eye(3)
    T = jnp.asarray([0.0, 0.0, 1.0])
    K = jnp.eye(3)
    z = depth_embedder(xyz, K, R, T)
    assert z.shape == (30, 1)
    np.testing.assert_allclose(np.asarray(z[:, 0]),
                               np.asarray(xyz[:, 2] + 1.0), rtol=1e-6)
    zn = depth_embedder(xyz, K, R, T, normalize=True)
    assert abs(float(jnp.mean(zn))) < 1e-5
    assert abs(float(jnp.std(zn)) - 1.0) < 1e-3


def test_displacement_regressor():
    reg = DisplacementRegressor(in_dim=8, width=16, depth=2, scale=0.1,
                                zero_canonical=True)
    params = reg.init(jax.random.PRNGKey(0))
    feat = jnp.asarray(np.random.default_rng(2).normal(size=(6, 8)),
                       jnp.float32)
    t = jnp.asarray([0.0, 0.5, 1.0, 0.0, 0.25, 0.75])
    d = reg(params, feat, t)
    assert d.shape == (6, 3)
    assert float(jnp.max(jnp.abs(d))) <= 0.1 + 1e-6  # tanh * scale bound
    np.testing.assert_array_equal(np.asarray(d[0]), 0.0)  # canonical frame
    np.testing.assert_array_equal(np.asarray(d[3]), 0.0)
    assert float(jnp.max(jnp.abs(d[1]))) > 0
    _grad_ok(lambda p: reg(p, feat, t), params)


def test_residual_regressor_concats():
    reg = ResidualRegressor(in_dim=5, width=8, depth=1)
    params = reg.init(jax.random.PRNGKey(1))
    feat = jnp.ones((4, 5))
    out = reg(params, feat)
    assert out.shape == (4, 10)
    np.testing.assert_allclose(np.asarray(out[:, :5]), 1.0)
    assert float(jnp.min(out[:, 5:])) >= 0.0  # relu half
    _grad_ok(lambda p: reg(p, feat), params)


def test_se3_exp_rt_identity_and_pure_cases():
    # zero screw -> identity rt
    np.testing.assert_allclose(np.asarray(se3_exp_rt(jnp.zeros((6,)))), 0.0)
    # pure translation: t == v
    v = jnp.asarray([0.3, -0.2, 0.5, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(se3_exp_rt(v)[3:]),
                               [0.3, -0.2, 0.5], rtol=1e-6)
    # pure rotation: r == w, t == 0
    w = jnp.asarray([0.0, 0.0, 0.0, 0.1, 0.2, -0.3])
    rt = se3_exp_rt(w)
    np.testing.assert_allclose(np.asarray(rt[:3]), [0.1, 0.2, -0.3],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rt[3:]), 0.0, atol=1e-7)
    # 90-deg z-rotation + unit-x translation-log: known closed form
    th = np.pi / 2
    screw = jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, th])
    rt = np.asarray(se3_exp_rt(screw))
    # V(w) @ [1,0,0] with w = th*ez: V = [[s/th, -(1-c)/th, 0], ...]
    np.testing.assert_allclose(rt[3], np.sin(th) / th, rtol=1e-5)
    np.testing.assert_allclose(rt[4], (1 - np.cos(th)) / th, rtol=1e-5)
    # grad-safe at 0
    g = jax.grad(lambda s: jnp.sum(se3_exp_rt(s)))(jnp.zeros((6,)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_regressor_near_identity_start():
    reg = SE3Regressor(in_dim=4, width=16, depth=2)
    params = reg.init(jax.random.PRNGKey(3))
    feat = jnp.asarray(np.random.default_rng(4).normal(size=(10, 4)),
                       jnp.float32)
    rt = reg(params, feat)
    assert rt.shape == (10, 6)
    assert float(jnp.max(jnp.abs(rt))) < 1e-2  # near-zero head
    _grad_ok(lambda p: reg(p, feat), params)


def test_image_based_regressor_blends_sources():
    reg = ImageBasedRegressor(geo_dim=6, src_dim=7, width=8, depth=1)
    params = reg.init(jax.random.PRNGKey(5))
    rng = np.random.default_rng(6)
    geo = jnp.asarray(rng.normal(size=(11, 6)), jnp.float32)
    src = jnp.asarray(rng.uniform(size=(3, 11, 7)), jnp.float32)
    rgb = reg(params, geo, src)
    assert rgb.shape == (11, 3)
    assert float(jnp.min(rgb)) >= 0 and float(jnp.max(rgb)) <= 1
    # softmax blend of source rgbs lives in the convex hull pre-sigmoid:
    # identical sources -> exactly that source
    src_eq = jnp.broadcast_to(src[0:1], src.shape)
    np.testing.assert_allclose(
        np.asarray(reg(params, geo, src_eq)),
        np.asarray(jax.nn.sigmoid(src[0, :, -3:])), rtol=1e-5, atol=1e-6)
    _grad_ok(lambda p: reg(p, geo, src), params)


@pytest.mark.slow
def test_image_based_spherical_harmonics():
    reg = ImageBasedSphericalHarmonics(xyz_dim=5, src_dim=7, sh_deg=2,
                                       resd_limit=0.2, width=8, depth=1)
    params = reg.init(jax.random.PRNGKey(7))
    rng = np.random.default_rng(8)
    xyz_feat = jnp.asarray(rng.normal(size=(9, 5)), jnp.float32)
    src = jnp.asarray(rng.uniform(size=(2, 9, 7)), jnp.float32)
    d = rng.normal(size=(9, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rgb = reg(params, xyz_feat, src, jnp.asarray(d, jnp.float32))
    assert rgb.shape == (9, 3)
    assert float(jnp.min(rgb)) >= 0 and float(jnp.max(rgb)) <= 1
    _grad_ok(lambda p: reg(p, xyz_feat, src, jnp.asarray(d, jnp.float32)),
             params)


@pytest.mark.slow
def test_nerf_family_trains_with_sh_dir_encoding():
    """TcnnDirEmbedder-style SH direction encoding wired into the NeRF
    family (NerfConfig.dir_encoding='sh'): a few optimizer steps on a
    view-dependent target must reduce the loss."""
    from envgs_tpu.models.nerf import NerfConfig, make_nerf_train_step

    cfg = NerfConfig(xyz_freqs=4, width=32, depth=2, feat_dim=32,
                     n_samples=(8,), dir_encoding="sh", sh_dir_degree=3)
    init, step = make_nerf_train_step(cfg, lr=5e-3)
    params, opt_state = init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(9)
    P = 64
    ray_o = jnp.zeros((P, 3))
    d = rng.normal(size=(P, 3))
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray_d = jnp.asarray(d, jnp.float32)
    near, far = jnp.full((P,), 1.0), jnp.full((P,), 4.0)
    target = jnp.asarray(np.abs(d), jnp.float32)
    losses = []
    for i in range(8):
        params, opt_state, stats = step(params, opt_state, ray_o, ray_d,
                                        near, far, target,
                                        jax.random.PRNGKey(i))
        losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_registry_has_full_zoo():
    import envgs_tpu.models  # noqa: F401 (registration side effects)
    from envgs_tpu.engine import EMBEDDERS, REGRESSORS

    for name in ["EmptyEmbedder", "NoopEmbedder", "TcnnDirEmbedder",
                 "SpacetimeEmbedder", "DepthEmbedder",
                 "GeometryImageBasedEmbedder", "TcnnHashEmbedder",
                 "ComposedXyztEmbedder", "KPlanesEmbedder"]:
        assert EMBEDDERS.get(name) is not None, name
    for name in ["EmptyRegressor", "NoopRegressor", "ZeroRegressor",
                 "DisplacementRegressor", "ResidualRegressor",
                 "SE3Regressor", "ImageBasedRegressor",
                 "ImageBasedSphericalHarmonics", "TcnnMlpRegressor",
                 "TcnnSplitRegressor", "SDFRegressor", "ColorRegressor"]:
        assert REGRESSORS.get(name) is not None, name
