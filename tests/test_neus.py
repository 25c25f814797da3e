"""NeuS SDF family: unbiased surface rendering math + SDF recovery of a
sphere from multi-view supervision (NeusNetwork capability)."""
import jax
import jax.numpy as jnp
import numpy as np

import pytest

from envgs_tpu.models.neus import (
    NeusConfig,
    make_neus_train_step,
    neus_alpha,
    render_rays_neus,
    sdf_fn,
)

R_SPHERE = 0.5


def test_neus_alpha_localizes_surface():
    """With an analytic sphere SDF, the NeuS alpha concentrates the weight
    at the first ray-sphere intersection as inv_s grows."""
    # ray through the center: o = (0,0,-2), d = +z; sphere radius 0.5
    S = 128
    z = jnp.linspace(0.5, 3.5, S)[None]  # (1, S)
    pts_z = -2.0 + z
    sdf = jnp.sqrt(pts_z ** 2) - R_SPHERE  # |z_world| - r on the axis
    for inv_s, tol in [(16.0, 0.35), (64.0, 0.1)]:
        a = neus_alpha(sdf, inv_s)
        trans = jnp.cumprod(1.0 - a + 1e-7, axis=-1)
        trans = jnp.concatenate([jnp.ones_like(trans[..., :1]),
                                 trans[..., :-1]], -1)
        w = a * trans
        zm = 0.5 * (z[..., :-1] + z[..., 1:])
        dpt = float(jnp.sum(w * zm) / jnp.clip(jnp.sum(w), 1e-6, None))
        # entry point at z = 2 - 0.5 = 1.5
        assert abs(dpt - 1.5) < tol, (inv_s, dpt)
        assert float(jnp.sum(w)) > 0.9


def _sphere_rays(n, key):
    """Random rays from a shell toward the origin; target color = white on
    sphere hit, black on miss (binary silhouette supervision)."""
    k1, k2 = jax.random.split(key)
    o_dir = jax.random.normal(k1, (n, 3))
    o_dir = o_dir / jnp.linalg.norm(o_dir, axis=-1, keepdims=True)
    ray_o = o_dir * 2.0
    # aim at a jittered point near the origin
    aim = jax.random.normal(k2, (n, 3)) * 0.35
    ray_d = aim - ray_o
    ray_d = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    # analytic ray-sphere hit
    b = jnp.sum(ray_o * ray_d, -1)
    c = jnp.sum(ray_o * ray_o, -1) - R_SPHERE ** 2
    hit = (b * b - c) > 0
    target = jnp.where(hit[:, None], 1.0, 0.0) * jnp.ones((n, 3))
    return ray_o, ray_d, target


@pytest.mark.slow
def test_neus_learns_sphere_sdf():
    cfg = NeusConfig(n_samples=32, width=64, depth=3, feat_dim=32,
                     eikonal_weight=0.05)
    init, step = make_neus_train_step(cfg, lr=2e-3)
    params, opt_state = init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    near = jnp.full((256,), 0.5)
    far = jnp.full((256,), 3.5)
    first = last = None
    for it in range(150):
        key, kr, ks = jax.random.split(key, 3)
        ray_o, ray_d, target = _sphere_rays(256, kr)
        params, opt_state, aux = step(params, opt_state, ray_o, ray_d,
                                      near, far, target, ks)
        if first is None:
            first = float(aux["psnr"])
        last = float(aux["psnr"])
    assert np.isfinite(last) and last > first + 2.0, (first, last)

    # the signed field separates inside from outside
    inside, _ = sdf_fn(cfg, params, jnp.zeros((1, 3)))
    probe = jnp.asarray([[1.5, 0.0, 0.0], [0.0, 1.5, 0.0], [0.0, 0.0, 1.5]])
    outside, _ = sdf_fn(cfg, params, probe)
    assert float(inside[0]) < 0.0, float(inside[0])
    assert float(outside.min()) > 0.0, np.asarray(outside)

    # eikonal regularizer keeps gradients near unit norm
    assert float(aux["eikonal"]) < 0.5, float(aux["eikonal"])

    # rendered depth on a center ray matches the sphere entry point
    out = render_rays_neus(
        cfg, params, jnp.asarray([[0.0, 0.0, -2.0]]),
        jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([0.5]),
        jnp.asarray([3.5]))
    assert abs(float(out["dpt_map"][0]) - 1.5) < 0.35, float(
        out["dpt_map"][0])
