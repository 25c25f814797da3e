import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.gaussians import (
    DensifyConfig,
    GaussianParams,
    accumulate_stats,
    create_pool,
    densify_and_prune,
    distort_color,
    enlarge_opacity,
    enlarge_scaling,
    oneup_sh_degree,
    reset_opacity,
    reset_specular,
    sh_degree_mask,
    sigmoid,
)


def _pool(P=16, cap=64, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(P, 3)).astype(np.float32)
    rgb = rng.random((P, 3)).astype(np.float32)
    return create_pool(xyz, rgb, cap=cap, sh_degree=2, seed=seed)


def _zero_adam(pool):
    return jax.tree_util.tree_map(jnp.zeros_like, pool.params)


def test_create_pool_basics():
    pool = _pool()
    assert pool.cap == 64
    assert int(pool.n_active) == 16
    assert pool.params.features_rest.shape == (64, 8, 3)
    # init opacity ~ 0.1 post-activation
    np.testing.assert_allclose(
        np.asarray(pool.get_opacity[:16, 0]), 0.1, atol=1e-4
    )
    # scales finite on active slots
    assert np.all(np.isfinite(np.asarray(pool.params.scaling[:16])))


def test_sh_degree_mask():
    m = np.asarray(sh_degree_mask(jnp.asarray(1), 3))
    assert m.tolist() == [1, 1, 1, 1] + [0] * 12
    m = np.asarray(sh_degree_mask(jnp.asarray(3), 3))
    assert m.sum() == 16


def test_oneup_sh_degree_caps():
    pool = _pool()
    for _ in range(5):
        pool = oneup_sh_degree(pool)
    assert int(pool.stats.sh_degree) == 2  # max_sh_degree


def test_accumulate_and_clone():
    pool = _pool()
    cap = pool.cap
    # give splat 0 a huge accumulated screen-gradient -> clone candidate
    grad = jnp.zeros((cap, 2)).at[0].set(jnp.asarray([10.0, 0.0]))
    vis = jnp.zeros((cap,), bool).at[:16].set(True)
    stats = accumulate_stats(pool.stats, grad, vis, weight=jnp.ones((cap,)))
    pool = pool._replace(stats=stats)
    assert float(pool.stats.grad_accum[0]) == 10.0
    assert float(pool.stats.denom[1]) == 1.0

    adam = _zero_adam(pool)
    cfg = DensifyConfig(densify_grad_threshold=1.0, min_opacity=0.01,
                        max_scene_threshold=None)
    # make splat 0 small -> clone rather than split
    params = pool.params._replace(
        scaling=pool.params.scaling.at[0].set(jnp.log(1e-4))
    )
    pool = pool._replace(params=params)
    new_pool, _ = densify_and_prune(pool, adam, cfg, jax.random.PRNGKey(0))
    assert int(new_pool.n_active) == 17  # one clone appended
    # the clone landed in slot 16 (first free slot) with identical params
    np.testing.assert_allclose(
        np.asarray(new_pool.params.xyz[16]), np.asarray(pool.params.xyz[0])
    )
    # stats reset
    assert float(new_pool.stats.grad_accum.sum()) == 0.0


def test_split_deactivates_parent():
    pool = _pool()
    cap = pool.cap
    grad = jnp.zeros((cap, 2)).at[3].set(jnp.asarray([10.0, 0.0]))
    vis = jnp.zeros((cap,), bool).at[:16].set(True)
    pool = pool._replace(stats=accumulate_stats(pool.stats, grad, vis))
    # make splat 3 big -> split
    params = pool.params._replace(
        scaling=pool.params.scaling.at[3].set(jnp.log(10.0))
    )
    pool = pool._replace(params=params)
    cfg = DensifyConfig(densify_grad_threshold=1.0, min_opacity=0.01,
                        max_scene_threshold=None)
    new_pool, adam = densify_and_prune(pool, _zero_adam(pool), cfg,
                                       jax.random.PRNGKey(0))
    # parent gone, two children -> net +1
    assert int(new_pool.n_active) == 17
    assert not bool(new_pool.stats.active[3])
    # children have shrunken scales: exp(log(10)) / (0.8 * 2) = 6.25
    child_scales = np.exp(np.asarray(new_pool.params.scaling[16:18]))
    np.testing.assert_allclose(child_scales, 6.25, rtol=1e-4)


def test_prune_low_opacity():
    pool = _pool()
    params = pool.params._replace(
        opacity=pool.params.opacity.at[5].set(-20.0)  # sigmoid -> ~0
    )
    pool = pool._replace(params=params)
    cfg = DensifyConfig(min_opacity=0.05, max_scene_threshold=None)
    new_pool, _ = densify_and_prune(pool, _zero_adam(pool), cfg,
                                    jax.random.PRNGKey(0))
    assert not bool(new_pool.stats.active[5])
    assert int(new_pool.n_active) == 15


def test_budget_prune_visibility():
    pool = _pool(P=16, cap=64)
    # fill weights: low weight for slots 0..7
    w = jnp.ones((64,)).at[:8].set(0.01)
    vis = jnp.zeros((64,), bool).at[:16].set(True)
    pool = pool._replace(stats=accumulate_stats(
        pool.stats, jnp.zeros((64, 2)), vis, weight=w))
    cfg = DensifyConfig(
        densify_grad_threshold=1e9, min_opacity=0.0, max_scene_threshold=None,
        prune_visibility=True, max_gs=10, max_gs_threshold=1.0,
    )
    new_pool, _ = densify_and_prune(pool, _zero_adam(pool), cfg,
                                    jax.random.PRNGKey(0))
    assert int(new_pool.n_active) == 10
    # the 6 pruned are among the low-weight slots
    assert not np.any(np.asarray(new_pool.stats.active[:6]))


def test_resets_and_tricks():
    pool = _pool()
    adam = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), pool.params)
    pool2, adam2 = reset_opacity(pool, adam, 0.01)
    assert float(pool2.get_opacity.max()) <= 0.011
    # only the opacity moments were zeroed
    assert float(jnp.sum(adam2.opacity)) == 0.0
    assert float(jnp.sum(adam2.xyz)) > 0.0

    pool3, _ = reset_specular(pool, adam, 1e-3)
    assert float(pool3.get_specular.max()) <= 1.1e-3

    pool4, _ = enlarge_opacity(pool, adam, 0.9)
    assert float(pool4.get_opacity[:16].min()) >= 0.89

    # high-specular splats get enlarged scaling
    params = pool.params._replace(specular=pool.params.specular.at[0].set(5.0))
    pool5 = pool._replace(params=params)
    pool6, _ = enlarge_scaling(pool5, adam, ratio=2.0, threshold=0.02)
    np.testing.assert_allclose(
        np.exp(np.asarray(pool6.params.scaling[0])),
        np.exp(np.asarray(pool5.params.scaling[0])) * 2.0,
        rtol=1e-3,
    )
    # low-specular splats keep scaling
    np.testing.assert_allclose(
        np.asarray(pool6.params.scaling[1]), np.asarray(pool5.params.scaling[1])
    )

    # color sabotage perturbs low-spec, keeps high-spec
    pool7, _ = distort_color(pool5, adam, jax.random.PRNGKey(1))
    assert np.allclose(
        np.asarray(pool7.params.features_dc[0]),
        np.asarray(pool5.params.features_dc[0]),
    )
    assert not np.allclose(
        np.asarray(pool7.params.features_dc[1]),
        np.asarray(pool5.params.features_dc[1]),
    )


def test_densify_is_jittable():
    pool = _pool()
    cfg = DensifyConfig(max_scene_threshold=None)
    fn = jax.jit(lambda p, a, k: densify_and_prune(p, a, cfg, k))
    out, _ = fn(pool, _zero_adam(pool), jax.random.PRNGKey(0))
    assert out.cap == pool.cap


def test_weight_split_uses_n5_ratio05():
    """Weight-quantile split follows the reference's exact recipe —
    split(mask, N=5, ratio=0.5) (gaussian2d_utils.py:836-847): a too-big,
    not-low-weight splat yields FIVE children with scale / (0.5 * 5),
    while a gradient-split in the same call still yields TWO children at
    scale / (0.8 * 2)."""
    pool = _pool()
    cap = pool.cap
    # splat 3: high grad + big -> gradient split (N=2)
    grad = jnp.zeros((cap, 2)).at[3].set(jnp.asarray([10.0, 0.0]))
    vis = jnp.zeros((cap,), bool).at[:16].set(True)
    # weights: everyone visible gets weight 1 except splat 7 (3.0, clearly
    # above the quantile) -> splat 7 is too-big & not-low-weight
    w = jnp.zeros((cap,)).at[:16].set(1.0).at[7].set(3.0)
    pool = pool._replace(stats=accumulate_stats(pool.stats, grad, vis,
                                                weight=w))
    params = pool.params._replace(
        scaling=pool.params.scaling.at[3].set(jnp.log(10.0))
                                    .at[7].set(jnp.log(50.0)))
    pool = pool._replace(params=params)
    cfg = DensifyConfig(densify_grad_threshold=1.0, min_opacity=0.01,
                        prune_large_gs=True, max_scene_threshold=4.0,
                        min_weight_threshold=0.5, spatial_scale=1.0)
    new_pool, _ = densify_and_prune(pool, _zero_adam(pool), cfg,
                                    jax.random.PRNGKey(0))
    # splat 3 is ALSO too-big & not-low-weight, but the gradient split
    # claims it (masks are exclusive): 16 - 2 parents + 2 + 5 = 21
    assert int(new_pool.n_active) == 21
    assert not bool(new_pool.stats.active[3])
    assert not bool(new_pool.stats.active[7])
    scal = np.exp(np.asarray(new_pool.params.scaling))
    active = np.asarray(new_pool.stats.active)
    children = scal[np.arange(len(active)) >= 16][active[16:]]
    # 2 children at 10/(0.8*2)=6.25, 5 at 50/(0.5*5)=20.0
    vals = np.sort(np.unique(np.round(children[:, 0], 3)))
    np.testing.assert_allclose(vals, [6.25, 20.0], rtol=1e-4)
    assert int((np.round(children[:, 0], 3) == 20.0).sum()) == 5
    assert int((np.round(children[:, 0], 3) == 6.25).sum()) == 2
