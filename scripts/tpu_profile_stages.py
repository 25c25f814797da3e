"""Stage-by-stage timing of the rasterizer pipeline on the TPU."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.ops import raster_pallas as rp
from envgs_tpu.ops.binning import bin_splats, tile_dims
from envgs_tpu.ops.common import prepare_splats
from envgs_tpu.ops.raster import _pack_pairs
from envgs_tpu.utils.camera import make_camera

H = int(sys.argv[1]) if len(sys.argv) > 1 else 400
W = int(sys.argv[2]) if len(sys.argv) > 2 else 400
P = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
CAP = int(sys.argv[4]) if len(sys.argv) > 4 else 2 ** 21

rng = np.random.default_rng(0)
means = np.concatenate(
    [rng.normal(size=(P, 2)) * 1.2, rng.random((P, 1)) * 6 + 2.0], -1
).astype(np.float32)
quats = rng.normal(size=(P, 4)).astype(np.float32)
scales = (rng.random((P, 2)) * 0.02 + 0.005).astype(np.float32)
opac = (rng.random(P) * 0.9 + 0.05).astype(np.float32)
colors = rng.random((P, 3)).astype(np.float32)
f = 0.8 * W
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(H, W, K, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
args = tuple(map(jnp.asarray, (means, quats, scales, opac, colors)))


def _sync(out):
    # axon block_until_ready caveat: force a data fetch
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])


def timeit(fn, *a, n=5, name=""):
    out = fn(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1000:.2f} ms")
    return out


prep_fn = jax.jit(lambda *a: prepare_splats(*a, cam))
prep = timeit(prep_fn, *args, name="prepare")

bin_fn = jax.jit(lambda p: bin_splats(p, H, W, rp.TILE, CAP, align=rp.CHUNK))
bins = timeit(bin_fn, prep, name=f"bin+sort cap={CAP}")
print("  num_pairs:", int(bins.num_pairs))

from envgs_tpu.ops.raster import _pack_table

table_fn = jax.jit(lambda p: rp.pack_rows(_pack_table(p, None)))
packed16 = timeit(table_fn, prep, name="pack table + bf16 split (P rows)")

gather_fn = jax.jit(lambda t, i: t[i])
pd16 = timeit(gather_fn, packed16, bins.gauss_idx, name="pair gather (bf16)")

tiles_x, _ = tile_dims(H, W, rp.TILE)
blend_fn = jax.jit(
    lambda pdata, b: rp._blend_fwd_call(pdata, b, 3, tiles_x, False)
)
timeit(blend_fn, pd16, bins.tile_bounds, name="blend fwd kernel")

# backward kernel alone
tiles_out, wet = blend_fn(pd16, bins.tile_bounds)
bwd_fn = jax.jit(
    lambda pdata, b, res, gt: rp._blend_bwd(
        3, tiles_x, False, "surfel", (True, True, True),
        (pdata, b, res), (gt, None)
    )[0]
)
timeit(bwd_fn, pd16, bins.tile_bounds, tiles_out, jnp.ones_like(tiles_out),
       name="blend bwd kernel")
