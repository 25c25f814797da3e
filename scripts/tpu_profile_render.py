"""Decompose bench.py's render frame: base-pass-only vs full pipeline, plus
the render-mode stage costs inside each pass.

Usage: python scripts/tpu_profile_render.py [H W P_BASE P_ENV]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.envgs import (
    EnvGSConfig, forward_envgs, render_base, reflect_rays, render_env,
)
from envgs_tpu.models.gaussians import create_pool, logit
from envgs_tpu.utils.camera import make_camera

H = int(sys.argv[1]) if len(sys.argv) > 1 else 1040
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1584
P_BASE = int(sys.argv[3]) if len(sys.argv) > 3 else 300_000
P_ENV = int(sys.argv[4]) if len(sys.argv) > 4 else 32_768

rng = np.random.default_rng(0)
xyz = np.concatenate(
    [rng.normal(size=(P_BASE, 2)) * 1.5,
     (rng.random((P_BASE, 1)) * 5 + 2.0)], -1).astype(np.float32)
base = create_pool(xyz, rng.random((P_BASE, 3)).astype(np.float32),
                   cap=P_BASE, sh_degree=3, init_opacity=0.8)
qv = np.stack([
    np.ones(P_BASE, np.float32),
    0.18 * np.sin(2.0 * xyz[:, 0]),
    0.18 * np.cos(2.0 * xyz[:, 1]),
    0.10 * np.sin(xyz[:, 0] + xyz[:, 1]),
], -1).astype(np.float32)  # bench.py's coherent (wavy) normal field
base = base._replace(params=base.params._replace(
    rotation=jnp.asarray(qv),
    scaling=jnp.full((P_BASE, 2), np.log(0.012)),
    specular=jnp.full((P_BASE, 1), float(logit(jnp.asarray(0.3))))))
dirs = rng.normal(size=(P_ENV, 3))
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
env = create_pool((dirs * 20).astype(np.float32),
                  rng.random((P_ENV, 3)).astype(np.float32),
                  cap=P_ENV, sh_degree=3, init_opacity=0.8)
env = env._replace(params=env.params._replace(
    scaling=jnp.full((P_ENV, 2), np.log(0.5))))
f = 0.9 * W
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(H, W, K, np.eye(3, dtype=np.float32),
                  np.zeros(3, np.float32), 0.02, 100.0)
cfg = EnvGSConfig(raster_backend="pallas", tracer_backend="tiled",
                  pair_cap=1_179_648, env_pair_cap=786_432,
                  reflection_start_iter=0, render_mode=True)
it = jnp.asarray(10)


def timeit(fn, *a, n=10, name=""):
    # block_until_ready, NOT an np.asarray fetch: fetching an output pulls
    # the whole buffer through the axon relay (tens of MB for image/pair
    # outputs), polluting per-call time by transfer/n
    out = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1000:.2f} ms", flush=True)
    return out


full = jax.jit(lambda b, e: forward_envgs(b, e, cam, it, cfg).rgb_map)
timeit(full, base, env, name="full frame")

base_fn = jax.jit(lambda b: render_base(b, cam, cfg).rgb)
timeit(base_fn, base, name="base pass only")


def env_only(b, e):
    bout = render_base(b, cam, cfg)
    ro, rd = reflect_rays(cam, bout)
    ro = jax.lax.stop_gradient(ro)
    rd = jax.lax.stop_gradient(rd)
    return ro, rd


ro, rd = jax.jit(env_only)(base, env)
ro = jax.device_put(np.asarray(ro))
rd = jax.device_put(np.asarray(rd))
env_fn = jax.jit(lambda e, o, d: render_env(e, o, d, cfg).rgb)
timeit(env_fn, env, ro, rd, name="env pass only (precomputed rays)")

# tracer stage split at this scale
from envgs_tpu.ops import tracer as tr
from envgs_tpu.ops.tracer_ref import prepare_trace_scene
from envgs_tpu.ops.raster_pallas import pack_rows

scene = jax.jit(lambda e: prepare_trace_scene(
    e.params.xyz, e.params.rotation, e.get_scaling, e.get_opacity[:, 0],
    rng.random((P_ENV, 3)).astype(np.float32), active=e.stats.active))(env)
tiles = tr.build_ray_tiles(ro, rd)
timeit(jax.jit(tr.build_ray_tiles), ro, rd, name="  build_ray_tiles")
su = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_u, axis=-1), 1e-12, None)
sv = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_v, axis=-1), 1e-12, None)
radius3 = 3.0 * jnp.maximum(su, sv)
NT = int(tiles.n_tiles)
cull_fn = jax.jit(lambda s, r: tr.cull_and_sort(
    tiles, s, r, per_tile_cap=2048, total_pair_cap=786_432))
gauss_idx, bounds, _ = timeit(
    cull_fn, scene, radius3, name="  cull_and_sort")
print("    env pairs:", int(bounds[-1]), "/", gauss_idx.shape[0])
table_fn = jax.jit(lambda s: pack_rows(tr._pack_scene_table(s)))
packed16 = timeit(table_fn, scene, name="  pack env table")
gather_fn = jax.jit(lambda t, i: t[i])
pd16 = timeit(gather_fn, packed16, gauss_idx, name="  env pair gather")
fwd_fn = jax.jit(lambda p, r, b: tr._trace_fwd_call(
    p, r, b, 0, False, needs=(False, False, False)))
timeit(fwd_fn, pd16, tiles.rays, bounds, name="  env blend fwd (stripped)")

# raster render-mode stage split
from envgs_tpu.ops import raster_pallas as rp
from envgs_tpu.ops.binning import bin_splats
from envgs_tpu.ops.common import prepare_splats
from envgs_tpu.ops.raster import _pack_table
from envgs_tpu.models.envgs import _pool_colors

colors = jax.jit(lambda p: jnp.concatenate(
    [_pool_colors(p, cam.center), p.get_specular, p.get_roughness], -1))(base)
prep_fn = jax.jit(lambda b, c: prepare_splats(
    b.params.xyz, b.params.rotation, b.get_scaling, b.get_opacity[:, 0],
    c, cam, active=b.stats.active))
prep = timeit(prep_fn, base, colors, name="  base prepare")
bin_fn = jax.jit(lambda p: bin_splats(
    p, H, W, rp.TILE, 2 ** 21, align=rp.CHUNK, aligned=False))
bins = timeit(bin_fn, prep, name="  base bin+sort (unaligned)")
print("    base pairs:", int(bins.num_pairs))
table_fn2 = jax.jit(lambda p: rp.pack_rows(_pack_table(p, None)))
packed2 = timeit(table_fn2, prep, name="  base pack table")
gather2 = timeit(gather_fn, packed2, bins.gauss_idx, name="  base pair gather")
blend_fn = jax.jit(lambda pd, b: rp._blend_fwd_call(
    pd, b, 5, int(bins.tiles_x), False, needs=(False, False, False),
    aligned=False))
timeit(blend_fn, gather2, bins.tile_bounds, name="  base blend fwd (stripped)")
