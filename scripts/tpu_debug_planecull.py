"""Diagnose the plane-footprint refine bound on the bench scene.

Prints distributions of the bound's terms (c_lo, wabs, reach in sigma
units, dist0) over sphere-kept candidates, to see which slack keeps the
rejection rate low.
"""
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import make_render_scene  # noqa: E402
from envgs_tpu.models.envgs import render_base, reflect_rays  # noqa: E402
from envgs_tpu.ops.tracer import build_ray_tiles  # noqa: E402
from envgs_tpu.ops.tracer_ref import prepare_trace_scene  # noqa: E402


def main():
    base, env, cam, cfg = make_render_scene()
    b = jax.jit(lambda p: render_base(p, cam, cfg))(base)
    jax.block_until_ready(b.rgb)
    ref_o, ref_d = reflect_rays(cam, b)
    tiles = build_ray_tiles(ref_o, ref_d)
    tanh = np.asarray(tiles.tan_half)
    sprd = np.asarray(tiles.spread)
    print("tile tan_half percentiles:",
          [round(float(np.percentile(tanh, p)), 4)
           for p in (10, 50, 90, 99)])
    print("tile spread percentiles:  ",
          [round(float(np.percentile(sprd, p)), 4)
           for p in (10, 50, 90, 99)])

    Pe = env.cap
    scene = prepare_trace_scene(
        env.params.xyz, env.params.rotation, env.get_scaling,
        env.get_opacity[:, 0], jnp.zeros((Pe, 3)),
        active=env.stats.active, scale_modifier=cfg.scale_modifier,
    )
    su = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_u, axis=-1), 1e-12, None)
    sv = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_v, axis=-1), 1e-12, None)
    act = np.asarray(scene.valid)
    smax = np.asarray(jnp.maximum(su, sv))[act]
    print("splat sigma_max percentiles:",
          [round(float(np.percentile(smax, p)), 5)
           for p in (10, 50, 90, 99)])
    # scene extent for context
    m = np.asarray(scene.mean)[act]
    print("scene bbox:", m.min(0).round(3), m.max(0).round(3))


if __name__ == "__main__":
    main()
