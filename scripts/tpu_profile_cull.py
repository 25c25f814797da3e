"""Stage decomposition of tracer cull_and_sort at sedan env scale.

Separates: coarse cone-vs-chunk scores, +top_k chunk pick, +refine gather/
cone test, +packed radial sort, full cull_and_sort (incl. aligned-layout
sweeps) — the knobs are per_tile_cap (refine width) and P (the splat count;
the chunk count NC = ceil(P / CHUNK) is the top_k width).
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
P = int(sys.argv[3]) if len(sys.argv) > 3 else 131_072
KTILE = int(sys.argv[4]) if len(sys.argv) > 4 else 2048
CAP = int(sys.argv[5]) if len(sys.argv) > 5 else 2 ** 20

rng = np.random.default_rng(0)
dirs = rng.normal(size=(P, 3))
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
mean = jnp.asarray(dirs * 20.0, jnp.float32)
quat = jnp.asarray(
    np.concatenate([np.ones((P, 1)), rng.normal(size=(P, 3)) * 0.3], -1),
    jnp.float32)
scales = jnp.full((P, 2), 0.2, jnp.float32)
opac = jnp.asarray(rng.random(P) * 0.9 + 0.05, jnp.float32)
sh = jnp.zeros((P, 3), jnp.float32)
scene = prepare_trace_scene(mean, quat, scales, opac, sh)

o = np.zeros((H, W, 3), np.float32)
gx, gy = np.meshgrid(np.linspace(-0.6, 0.6, W),
                     np.linspace(-0.4, 0.4, H), indexing="xy")
d = np.stack([gx, gy, np.ones((H, W))], -1)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
ray_o, ray_d = jnp.asarray(o), jnp.asarray(d, jnp.float32)

tiles = tr.build_ray_tiles(ray_o, ray_d)
su = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_u, axis=-1), 1e-12, None)
sv = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_v, axis=-1), 1e-12, None)
radius3 = 3.0 * jnp.maximum(su, sv)


def timeit(fn, *a, n=5, name=""):
    # block_until_ready, NOT a fetch: np.asarray pulls the whole buffer
    # through the axon relay and pollutes per-call time by transfer/n
    out = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms",
          flush=True)
    return out


idx = jax.jit(tr.build_chunk_index)(scene, radius3)
NC = idx.cmean.shape[0]
Kc = max(min(KTILE // tr.CHUNK, NC), 1)
C = Kc * tr.CHUNK
print(f"T={tiles.n_tiles} NC={NC} Kc={Kc} C={C}")

timeit(jax.jit(tr.build_chunk_index), scene, radius3, name="build_chunk_index")


def pad_blocks(tile_block=256):
    T = tiles.n_tiles
    Tp = -(-T // tile_block) * tile_block
    pad = Tp - T
    apex = jnp.pad(tiles.apex, ((0, pad), (0, 0)))
    axis = jnp.pad(tiles.axis, ((0, pad), (0, 0)))
    tanh = jnp.pad(tiles.tan_half, (0, pad), constant_values=-1.0)
    sprd = jnp.pad(tiles.spread, (0, pad), constant_values=-1e9)
    tmsk = jnp.pad(jnp.ones((T,), bool), (0, pad), constant_values=False)
    return (apex.reshape(-1, tile_block, 3), axis.reshape(-1, tile_block, 3),
            tanh.reshape(-1, tile_block), sprd.reshape(-1, tile_block),
            tmsk.reshape(-1, tile_block))


blocks = pad_blocks()


def coarse(args):
    apex, axis, tan_half, spread, tmask = args
    cmeanT = idx.cmean.T
    cm2 = jnp.sum(idx.cmean * idx.cmean, axis=-1)
    proj = axis @ cmeanT - jnp.sum(axis * apex, -1, keepdims=True)
    d2 = (cm2[None, :] - 2.0 * (apex @ cmeanT)
          + jnp.sum(apex * apex, -1, keepdims=True))
    d2 = jnp.clip(d2, 0.0, None)
    axis_dist = jnp.sqrt(jnp.clip(d2 - proj * proj, 0.0, None))
    slack = spread[:, None] + idx.crad[None, :] * (1.0 + tan_half[:, None])
    hit = axis_dist <= proj * tan_half[:, None] + slack
    near = d2 <= slack * slack
    keep = (hit | near) & (proj + idx.crad[None, :] > 0)
    keep = keep & idx.cact[None, :] & tmask[:, None]
    return jnp.where(keep, jnp.sqrt(d2), jnp.inf)


def coarse_topk(args):
    radial = coarse(args)
    return jax.lax.top_k(-radial, Kc)


def refine_nosort(args):
    negr, idc = coarse_topk(args)
    apex, axis, tan_half, spread, tmask = args
    B = apex.shape[0]
    cand_mean = idx.mean_s.reshape(NC, tr.CHUNK, 3)
    cand_rad = idx.rad_s.reshape(NC, tr.CHUNK)
    cand_idx = idx.order.reshape(NC, tr.CHUNK)
    cvalid = negr > -jnp.inf
    cm = cand_mean[idc].reshape(B, C, 3)
    cr = jnp.where(cvalid[:, :, None], cand_rad[idc], 0.0).reshape(B, C)
    cid = jnp.where(cvalid[:, :, None], cand_idx[idc], P).reshape(B, C)
    rel = cm - apex[:, None, :]
    proj_s = jnp.sum(rel * axis[:, None, :], axis=-1)
    d2_s = jnp.sum(rel * rel, axis=-1)
    axd_s = jnp.sqrt(jnp.clip(d2_s - proj_s * proj_s, 0.0, None))
    slack_s = spread[:, None] + cr
    hit_s = axd_s <= proj_s * tan_half[:, None] + slack_s
    near_s = d2_s <= slack_s * slack_s
    keep_s = ((hit_s | near_s) & (proj_s + cr > 0) & (cid < P) & (cr > 0))
    rad_key = jnp.where(keep_s, jnp.sqrt(d2_s), jnp.inf)
    return rad_key, cid, keep_s


def refine_sort(args):
    rad_key, cid, keep_s = refine_nosort(args)
    cid_bits = int(P).bit_length()
    qbits = 32 - cid_bits
    qmax = (1 << qbits) - 1
    rmax = jnp.max(jnp.where(keep_s, rad_key, 0.0), -1, keepdims=True)
    rq = jnp.where(
        keep_s,
        jnp.clip(rad_key / jnp.maximum(rmax, 1e-12) * (qmax - 1),
                 0, qmax - 1).astype(jnp.int32), qmax)
    key = ((rq << cid_bits) | cid) ^ jnp.int32(-2147483648)
    key_s = jax.lax.sort(key, dimension=-1, is_stable=False)
    return key_s, keep_s


timeit(jax.jit(lambda b: jax.lax.map(coarse_topk, b)), blocks,
       name="coarse + top_k")
timeit(jax.jit(lambda b: jax.lax.map(refine_nosort, b)), blocks,
       name="+ refine cone test (no sort)")
timeit(jax.jit(lambda b: jax.lax.map(refine_sort, b)), blocks,
       name="+ packed radial sort")
timeit(jax.jit(lambda t, s, r: tr.cull_and_sort(
    t, s, r, per_tile_cap=KTILE, total_pair_cap=CAP)),
    tiles, scene, radius3, name="full cull_and_sort")
