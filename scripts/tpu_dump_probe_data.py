"""Dump bench-scene probe inputs (candidates + tiles + scene) to npz so
probe-test variants can be iterated offline in numpy (no TPU recompiles).
Writes /tmp/probe_data.npz; consumed by scripts/probe_lab.py.
"""
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import make_render_scene  # noqa: E402
from envgs_tpu.models.envgs import render_base, reflect_rays  # noqa: E402
from envgs_tpu.ops.tracer import build_ray_tiles, cull_and_sort  # noqa: E402
from envgs_tpu.ops.tracer_ref import prepare_trace_scene  # noqa: E402


def main():
    base, env, cam, cfg = make_render_scene()
    b = jax.jit(lambda p: render_base(p, cam, cfg))(base)
    jax.block_until_ready(b.rgb)
    ref_o, ref_d = reflect_rays(cam, b)
    tiles = build_ray_tiles(ref_o, ref_d)
    Pe = env.cap
    scene = prepare_trace_scene(
        env.params.xyz, env.params.rotation, env.get_scaling,
        env.get_opacity[:, 0], jnp.zeros((Pe, 3)),
        active=env.stats.active, scale_modifier=cfg.scale_modifier,
    )
    su = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_u, axis=-1), 1e-12, None)
    sv = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_v, axis=-1), 1e-12, None)
    radius3 = 3.0 * jnp.maximum(su, sv)
    K = min(-(-Pe // 64) * 64, 2048)
    gauss_idx, bounds, _ = jax.jit(
        lambda s, r: cull_and_sort(tiles, s, r, per_tile_cap=K,
                                   total_pair_cap=cfg.env_pair_cap,
                                   probe=False)
    )(scene, radius3)
    np.savez_compressed(
        "/tmp/probe_data.npz",
        gauss_idx=np.asarray(gauss_idx),
        bounds=np.asarray(bounds),
        rays=np.asarray(tiles.rays, np.float32),
        apex=np.asarray(tiles.apex),
        axis=np.asarray(tiles.axis),
        tan_half=np.asarray(tiles.tan_half),
        spread=np.asarray(tiles.spread),
        mean=np.asarray(scene.mean),
        normal=np.asarray(scene.normal),
        t_u=np.asarray(scene.t_u),
        t_v=np.asarray(scene.t_v),
        opacity=np.asarray(scene.opacity),
        radius3=np.asarray(radius3),
        Pe=Pe,
    )
    print("wrote /tmp/probe_data.npz")


if __name__ == "__main__":
    main()
