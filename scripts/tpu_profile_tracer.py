"""Stage-by-stage timing of the surfel tracer pipeline on the TPU.

Workload mirrors bench.py's env pass: reflected-ray-like grid at 1584x1040
against a 32K-splat environment dome.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.ops import tracer as tr
from envgs_tpu.ops.tracer_ref import prepare_trace_scene

H = int(sys.argv[1]) if len(sys.argv) > 1 else 1040
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1584
P = int(sys.argv[3]) if len(sys.argv) > 3 else 32_768
CAP = int(sys.argv[4]) if len(sys.argv) > 4 else 2 ** 21
KTILE = int(sys.argv[5]) if len(sys.argv) > 5 else 4096

rng = np.random.default_rng(0)
dirs = rng.normal(size=(P, 3))
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
mean = jnp.asarray(dirs * 20.0, jnp.float32)
quat = jnp.asarray(
    np.concatenate([np.ones((P, 1)), rng.normal(size=(P, 3)) * 0.3], -1),
    jnp.float32)
scales = jnp.full((P, 2), 0.5, jnp.float32)
opac = jnp.asarray(rng.random(P) * 0.9 + 0.05, jnp.float32)
colors = jnp.asarray(rng.random((P, 3)), jnp.float32)
scene = prepare_trace_scene(mean, quat, scales, opac, colors)

# reflected-ray-like bundle: origins on a plane slab, directions sky-ward
# with smooth spatial variation (what a ground reflector produces)
yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                     indexing="ij")
o = np.stack([xx * 2, yy * 2, np.full_like(xx, 3.0)], -1).astype(np.float32)
d = np.stack([0.3 * np.sin(2 * xx), 0.3 * np.cos(2 * yy),
              -np.ones_like(xx)], -1).astype(np.float32)
ray_o, ray_d = jnp.asarray(o), jnp.asarray(d)
bg = jnp.zeros(3)


def timeit(fn, *a, n=5, name=""):
    out = jax.block_until_ready(fn(*a))
    # axon block_until_ready caveat: force a fetch
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return out


tiles_fn = jax.jit(tr.build_ray_tiles)
tiles = timeit(tiles_fn, ray_o, ray_d, name="build_ray_tiles")
print("  n_tiles:", tiles.n_tiles)

su = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_u, axis=-1), 1e-12, None)
sv = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_v, axis=-1), 1e-12, None)
radius3 = 3.0 * jnp.maximum(su, sv)

NT = int(tiles.n_tiles)  # static for jit (RayTiles.n_tiles is a python int)
cull_fn = jax.jit(lambda rays, ap, ax, th, sp, s, r: tr.cull_and_sort(
    tr.RayTiles(rays, ap, ax, th, sp, NT), s, r,
    per_tile_cap=KTILE, total_pair_cap=CAP))
gauss_idx, bounds, _dropped = timeit(
    cull_fn, tiles.rays, tiles.apex, tiles.axis, tiles.tan_half,
    tiles.spread, scene, radius3, name=f"cull_and_sort K={KTILE}")
print("  total pairs:", int(bounds[-1]), "/ cap", gauss_idx.shape[0])

from envgs_tpu.ops.raster_pallas import pack_rows

table_fn = jax.jit(lambda s: pack_rows(tr._pack_scene_table(s)))
packed16 = timeit(table_fn, scene, name="pack table + bf16 split (P rows)")

gather_fn = jax.jit(lambda t, i: t[i])
pd16 = timeit(gather_fn, packed16, gauss_idx, name="pair gather (bf16)")

fwd_fn = jax.jit(lambda p, r, b: tr._trace_fwd_call(p, r, b, 0, False))
tiles_out, wet = timeit(fwd_fn, pd16, tiles.rays, bounds, name="blend fwd")

bwd_fn = jax.jit(lambda p, r, b, res, g: tr._trace_bwd(
    0, False, (True, True), (p, r, b, res), (g, None)))
timeit(bwd_fn, pd16, tiles.rays, bounds, tiles_out,
       jnp.ones_like(tiles_out), name="blend bwd")

full_fn = jax.jit(lambda s, o, d: tr.trace_rays(
    s, o, d, bg, per_tile_cap=KTILE, total_pair_cap=CAP))
timeit(full_fn, scene, ray_o, ray_d, name="trace_rays end-to-end")


# full forward+backward (training regime): grads w.r.t. scene arrays AND
# ray origins/directions (the reflect-ray chain needs both)
def _loss(m, q, sc, op, co, o, d):
    s = prepare_trace_scene(m, q, sc, op, co)
    out = tr.trace_rays(s, o, d, bg, per_tile_cap=KTILE, total_pair_cap=CAP)
    return (jnp.sum(out.rgb) + jnp.sum(out.dpt) + jnp.sum(out.acc)
            + jnp.sum(out.norm))


grad_all = jax.jit(jax.grad(_loss, argnums=(0, 1, 2, 3, 4, 5, 6)))
timeit(grad_all, mean, quat, scales, opac, colors, ray_o, ray_d,
       name="trace fwd+bwd (params+rays)")

grad_scene = jax.jit(jax.grad(_loss, argnums=(0, 1, 2, 3, 4)))
timeit(grad_scene, mean, quat, scales, opac, colors, ray_o, ray_d,
       name="trace fwd+bwd (params only)")

# isolate the pair-grad transpose (segmented sum over the aligned cap)
from envgs_tpu.ops.segsum import gather_transpose

g_pair = jnp.ones((gauss_idx.shape[0], 128), jnp.float32)
gt_fn = jax.jit(lambda g, i: gather_transpose(g, i, P + 1, P + 1, False))
timeit(gt_fn, g_pair, gauss_idx, name="gather_transpose (cap,128)")

