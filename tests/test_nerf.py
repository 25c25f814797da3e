"""NeRF stack: embedders, regressors, sampling, volume rendering, training."""
import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.embedders import (
    HashEmbedder,
    LatentCodeEmbedder,
    composed_xyzt,
    pe_dim,
    positional_encoding,
)
from envgs_tpu.models.nerf import (
    NerfConfig,
    importance_z_vals,
    make_nerf_train_step,
    render_rays_nerf,
    uniform_z_vals,
    volume_render,
)
from envgs_tpu.models.regressors import MLP, SplitRegressor, contract
import pytest


def test_positional_encoding_shapes_and_anneal():
    x = jnp.ones((5, 3))
    e = positional_encoding(x, n_freqs=4)
    assert e.shape == (5, pe_dim(3, 4))
    # alpha=0 zeroes all frequency bands (input passthrough remains)
    e0 = positional_encoding(x, n_freqs=4, alpha=0.0)
    np.testing.assert_allclose(np.asarray(e0[:, 3:]), 0.0, atol=1e-7)
    e4 = positional_encoding(x, n_freqs=4, alpha=4.0)
    np.testing.assert_allclose(np.asarray(e4), np.asarray(e), atol=1e-6)


def test_hash_embedder_interpolates():
    he = HashEmbedder(n_levels=4, log2_hashmap_size=10, base_resolution=4,
                      finest_resolution=32)
    tables = he.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (64, 3)),
                    jnp.float32)
    f = he(tables, x)
    assert f.shape == (64, he.out_dim)
    assert np.isfinite(np.asarray(f)).all()
    # continuity: nearby points give nearby features
    f2 = he(tables, x + 1e-5)
    assert float(jnp.abs(f - f2).max()) < 1e-3
    # differentiable w.r.t. tables
    g = jax.grad(lambda t: jnp.sum(he(t, x) ** 2))(tables)
    assert float(jnp.abs(g).sum()) > 0


def test_latent_and_composed():
    le = LatentCodeEmbedder(n_codes=3, out_dim=4)
    codes = le.init(jax.random.PRNGKey(0))
    z = le(codes, 1)
    assert z.shape == (4,)
    xyz_feat = jnp.ones((10, 6))
    out = composed_xyzt(xyz_feat, z)
    assert out.shape == (10, 10)


def test_mlp_skips_and_activation():
    mlp = MLP(in_dim=8, width=16, depth=4, out_dim=2, skips=(2,),
              out_actvn="sigmoid")
    params = mlp.init(jax.random.PRNGKey(0))
    y = mlp(params, jnp.ones((7, 8)))
    assert y.shape == (7, 2)
    assert (np.asarray(y) >= 0).all() and (np.asarray(y) <= 1).all()


def test_contract_is_bounded():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(100, 3)) * 10,
                    jnp.float32)
    c = contract(x, radius=1.0)
    assert float(jnp.linalg.norm(c, axis=-1).max()) < 2.0 + 1e-5
    # identity inside the unit ball
    xs = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-6) * 0.5
    np.testing.assert_allclose(np.asarray(contract(xs)), np.asarray(xs),
                               atol=1e-6)


def test_uniform_z_vals_bounds():
    near = jnp.full((10,), 2.0)
    far = jnp.full((10,), 6.0)
    z = uniform_z_vals(near, far, 32, jax.random.PRNGKey(0))
    assert z.shape == (10, 32)
    assert float(z.min()) >= 2.0 and float(z.max()) <= 6.0
    assert (np.diff(np.asarray(z), axis=-1) >= 0).all()


def test_importance_concentrates_samples():
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 64), (4, 64))
    w = jnp.zeros((4, 64)).at[:, 30:34].set(1.0)  # peak near z ~ 0.5
    zf = importance_z_vals(z, w, 32, jax.random.PRNGKey(1))
    frac_near_peak = float(jnp.mean(jnp.abs(zf - 0.5) < 0.08))
    assert frac_near_peak > 0.8, frac_near_peak


def test_volume_render_opaque_wall():
    # dense slab at samples 10..12 -> depth there, full acc
    S = 32
    z = jnp.broadcast_to(jnp.linspace(1.0, 3.0, S), (5, S))
    sigma = jnp.zeros((5, S)).at[:, 10:13].set(1e4)
    rgb = jnp.broadcast_to(jnp.asarray([0.2, 0.5, 0.8]), (5, S, 3))
    out = volume_render(rgb, sigma, z)
    np.testing.assert_allclose(np.asarray(out["acc_map"]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["rgb_map"]),
                               [[0.2, 0.5, 0.8]] * 5, atol=1e-4)
    d = float(z[0, 10])
    np.testing.assert_allclose(np.asarray(out["dpt_map"]), d, atol=0.1)


@pytest.mark.slow
def test_nerf_overfits_tiny_batch():
    """End-to-end: the hierarchical NeRF must overfit a toy scene's rays."""
    cfg = NerfConfig(xyz_freqs=4, dir_freqs=2, width=32, depth=3,
                     feat_dim=32, n_samples=(16, 16))
    init, step = make_nerf_train_step(cfg, lr=5e-3)
    params, opt_state = init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    P = 64
    ray_o = jnp.zeros((P, 3))
    d = rng.normal(size=(P, 3))
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray_d = jnp.asarray(d, jnp.float32)
    near = jnp.full((P,), 1.0)
    far = jnp.full((P,), 4.0)
    # target: color by direction (view-dependent, solvable)
    target = jnp.asarray((d + 1) / 2, jnp.float32)

    key = jax.random.PRNGKey(1)
    psnrs = []
    for it in range(150):
        key, k = jax.random.split(key)
        params, opt_state, stats = step(
            params, opt_state, ray_o, ray_d, near, far, target, k)
        psnrs.append(float(stats["psnr"]))
    assert psnrs[-1] > psnrs[0] + 6.0, (psnrs[0], psnrs[-1])
    assert psnrs[-1] > 20.0, psnrs[-1]


@pytest.mark.slow
def test_render_rays_deterministic_eval():
    cfg = NerfConfig(xyz_freqs=2, dir_freqs=1, width=16, depth=2,
                     feat_dim=16, n_samples=(8, 8))
    params = cfg.init(jax.random.PRNGKey(0))
    ray_o = jnp.zeros((4, 3))
    ray_d = jnp.asarray([[0, 0, 1.0]] * 4)
    near = jnp.full((4,), 1.0)
    far = jnp.full((4,), 3.0)
    a = render_rays_nerf(cfg, params, ray_o, ray_d, near, far, key=None)
    b = render_rays_nerf(cfg, params, ray_o, ray_d, near, far, key=None)
    np.testing.assert_allclose(np.asarray(a["rgb_map"]),
                               np.asarray(b["rgb_map"]), atol=0)


@pytest.mark.slow
def test_kplanes_embedder():
    from envgs_tpu.models.embedders import KPlanesEmbedder

    emb = KPlanesEmbedder(n_features=4, resolutions=(8, 16), n_frames=10)
    params = emb.init(jax.random.PRNGKey(0))
    # 3 spatial + 3 time planes per level
    assert len(params) == 2 * 6
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1,
                           maxval=1)
    f0 = emb(params, x, t=0.0)
    f1 = emb(params, x, t=1.0)
    assert f0.shape == (32, 2 * 4)
    assert bool(jnp.isfinite(f0).all())
    # time planes make features time-dependent
    assert float(jnp.abs(f0 - f1).max()) > 1e-4
    # static variant has no time planes and ignores t
    emb_s = KPlanesEmbedder(n_features=4, resolutions=(8,), n_frames=1)
    ps = emb_s.init(jax.random.PRNGKey(2))
    assert len(ps) == 3
    np.testing.assert_allclose(np.asarray(emb_s(ps, x, 0.0)),
                               np.asarray(emb_s(ps, x, 0.7)))
    # gradients flow to the planes
    g = jax.grad(lambda p: jnp.sum(emb(p, x, 0.3) ** 2))(params)
    assert any(float(jnp.abs(v).sum()) > 0 for v in g.values())


def test_deformation_embedder():
    from envgs_tpu.models.embedders import DeformationEmbedder

    emb = DeformationEmbedder()
    params = emb.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    # zero-initialized head: identity warp everywhere at start
    np.testing.assert_allclose(np.asarray(emb(params, x, 0.5)),
                               np.asarray(x), atol=1e-6)
    # after perturbing the head, the warp is time-dependent + differentiable
    w, b = params[-1]
    params2 = params[:-1] + [(w + 0.01, b)]
    d0 = emb(params2, x, 0.0)
    d1 = emb(params2, x, 1.0)
    assert float(jnp.abs(d0 - d1).max()) > 1e-5
    g = jax.grad(
        lambda p: jnp.sum(emb(p, x, 0.2) ** 2)
    )(params2)
    assert float(jnp.abs(g[0][0]).sum()) > 0


@pytest.mark.slow
def test_kplanes_dynamic_radiance_field():
    """End-to-end dynamic capability (kplanes.yaml / dnerf.yaml regime): a
    K-Planes-embedded field fits a TIME-VARYING scene — a colored blob
    moving along x — and reproduces the motion at render time."""
    from envgs_tpu.models.embedders import KPlanesEmbedder
    from envgs_tpu.models.nerf import volume_render
    import optax

    emb = KPlanesEmbedder(n_features=8, resolutions=(16,), n_frames=8,
                          time_resolution=8)
    W_HEAD = 32

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return dict(
            planes=emb.init(k1),
            w1=jax.random.normal(k2, (emb.out_dim, W_HEAD)) * 0.3,
            b1=jnp.zeros((W_HEAD,)),
            # small head: the field starts (near-)empty, not as dense fog
            w2=jax.random.normal(k3, (W_HEAD, 4)) * 0.03,
            b2=jnp.zeros((4,)),
        )

    def field(params, x, t):
        h = jax.nn.relu(emb(params["planes"], x, t) @ params["w1"]
                        + params["b1"])
        o = h @ params["w2"] + params["b2"]
        return jax.nn.sigmoid(o[..., :3]), jax.nn.softplus(o[..., 3] - 2.0)

    def gt_sigma(x, t):
        # blob center moves from x=-0.5 to x=+0.5 over t
        c = jnp.stack([t - 0.5, jnp.zeros_like(t), jnp.zeros_like(t)], -1)
        d2 = jnp.sum((x - c) ** 2, -1)
        return 20.0 * jnp.exp(-d2 / 0.02)

    def render(params, ray_o, ray_d, t):
        z = jnp.linspace(0.5, 2.5, 32)
        pts = ray_o[:, None] + z[None, :, None] * ray_d[:, None]
        rgb, sig = field(params, pts, t[:, None])
        return volume_render(rgb, sig, jnp.broadcast_to(z, sig.shape))

    def gt_render(ray_o, ray_d, t):
        z = jnp.linspace(0.5, 2.5, 32)
        pts = ray_o[:, None] + z[None, :, None] * ray_d[:, None]
        sig = gt_sigma(pts, t[:, None])
        rgb = jnp.broadcast_to(jnp.asarray([1.0, 0.3, 0.1]),
                               (*sig.shape, 3))
        return volume_render(rgb, sig, jnp.broadcast_to(z, sig.shape))

    opt = optax.adam(1e-2)
    params = init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        ko, kt = jax.random.split(key)
        o_xy = jax.random.uniform(ko, (256, 2), minval=-0.8, maxval=0.8)
        ray_o = jnp.concatenate([o_xy, jnp.full((256, 1), -1.5)], -1)
        ray_d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (256, 3))
        t = jax.random.randint(kt, (256,), 0, 8) / 7.0

        tgt = gt_render(ray_o, ray_d, t)

        def loss_fn(p):
            # rgb-only: volume_render's infinite last interval saturates
            # acc to 1 for ANY positive sigma, so acc is not fittable
            out = render(p, ray_o, ray_d, t)
            return jnp.mean((out["rgb_map"] - tgt["rgb_map"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    key = jax.random.PRNGKey(1)
    losses = []
    for it in range(400):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))
    assert losses[-1] < 0.02, (losses[0], losses[-1])

    # the fitted field reproduces the MOTION: the blob's rendered position
    # at t=0 vs t=1 differs, and each matches its own ground truth better
    # than the other time's
    xs = jnp.linspace(-0.8, 0.8, 41)
    ray_o = jnp.stack([xs, jnp.zeros_like(xs), jnp.full_like(xs, -1.5)], -1)
    ray_d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (41, 3))
    for tval in (0.0, 1.0):
        t = jnp.full((41,), tval)
        rgb = render(params, ray_o, ray_d, t)["rgb_map"]
        gt = gt_render(ray_o, ray_d, t)["rgb_map"]
        gt_other = gt_render(ray_o, ray_d, 1.0 - t)["rgb_map"]
        err_own = float(jnp.mean((rgb - gt) ** 2))
        err_other = float(jnp.mean((rgb - gt_other) ** 2))
        assert err_own < 0.5 * err_other, (tval, err_own, err_other)
