"""Sub-stage dissection of bin_splats at bench scale (finds the scatter)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.ops.binning import bin_splats, tile_dims, _round_up, _ALIGN_N
from envgs_tpu.ops.common import prepare_splats
from envgs_tpu.ops.fill_forward import fill_forward
from envgs_tpu.utils.camera import make_camera

H, W, P = 1040, 1584, 300_000
CAP = 2 ** 21
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


def _sync(out):
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
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return out


prep = jax.jit(lambda *a: prepare_splats(*a, cam))(
    jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
    jnp.asarray(opac), jnp.asarray(colors))
_sync(prep)

tile = 16
tx_n, ty_n = tile_dims(H, W, tile)
num_tiles = tx_n * ty_n
pair_cap = _round_up(CAP, _ALIGN_N)


def upto_scatter(prep):
    order = jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf))
    ext = prep.ext
    rowcull = prep.rowcull
    gcols = [prep.center_pix, ext, prep.valid[:, None].astype(jnp.float32),
             rowcull]
    packed_cols = jnp.concatenate(gcols, axis=1)[order]
    cx = packed_cols[:, 0]
    cy = packed_cols[:, 1]
    rx = packed_cols[:, 2]
    ry = packed_cols[:, 3]
    valid = packed_cols[:, 4] > 0.5
    x0 = jnp.clip(jnp.floor((cx - rx) / tile), 0, tx_n - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((cx + rx) / tile), 0, tx_n - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((cy - ry) / tile), 0, ty_n - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((cy + ry) / tile), 0, ty_n - 1).astype(jnp.int32)
    nx = jnp.where(valid, x1 - x0 + 1, 0)
    ny = jnp.where(valid, y1 - y0 + 1, 0)
    counts = nx * ny
    ends = jnp.cumsum(counts)
    starts = ends - counts
    sel = counts > 0
    pos = jnp.where(sel, starts, pair_cap)
    ids = jnp.arange(P, dtype=jnp.int32)
    t0 = y0 * tx_n + x0
    cols = [ids, starts, t0, nx]
    cols += [jax.lax.bitcast_convert_type(packed_cols[:, i], jnp.int32)
             for i in (0, 1, 5, 6, 7, 8, 9, 10)]
    return pos, jnp.stack(cols, axis=1)


pos, colstack = timeit(jax.jit(upto_scatter), prep, name="argsort+gather+extents")


def scatter_only(pos, colstack):
    markers_rows = jnp.zeros((pair_cap, colstack.shape[1]), jnp.int32).at[
        pos, :].set(colstack, mode="drop")
    mvalid = jnp.zeros((pair_cap,), jnp.int32).at[pos].set(1, mode="drop")
    return markers_rows.T, mvalid


markers, mvalid = timeit(jax.jit(scatter_only), pos, colstack,
                         name="marker row-scatter (+T)")

filled = timeit(jax.jit(lambda m, v: fill_forward(m, v)), markers, mvalid,
                name="fill_forward (12ch, 2M)")

full = timeit(jax.jit(lambda p: bin_splats(p, H, W, tile, CAP)), prep,
              name="bin_splats end-to-end")
print("num_pairs:", int(full.num_pairs))
