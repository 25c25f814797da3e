"""Tile binning for the surfel rasterizer (pure XLA, static shapes).

TPU-native replacement for the CUDA pipeline's duplicate-key radix sort
(tile|depth keys): splat -> tile-rectangle pair expansion with a fixed pair
capacity, a two-key lexicographic `lax.sort` (tile id, then center depth),
and tile range extraction via searchsorted. Everything is shape-static so it
jits once; overflow beyond `pair_cap` is dropped deterministically (the count
is returned for monitoring).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.ops.common import PreparedSplats


class BinnedPairs(NamedTuple):
    gauss_idx: jnp.ndarray  # (cap,) int32 splat index per pair (sorted; P = pad)
    tile_bounds: jnp.ndarray  # (num_tiles + 1,) int32 pair-range offsets
    num_pairs: jnp.ndarray  # () int32 real pair count (pre-drop)
    tiles_x: int
    tiles_y: int
    tile: int  # tile edge in pixels


def tile_dims(H: int, W: int, tile: int):
    return -(-W // tile), -(-H // tile)


def bin_splats(
    prep: PreparedSplats, H: int, W: int, tile: int, pair_cap: int,
    align: int = 1,
) -> BinnedPairs:
    """Expand each splat into (splat, tile) pairs sorted by (tile, depth).

    With `align` > 1, each tile's pair range is padded to a multiple of
    `align` (padding entries point at the sentinel splat index P, which the
    blend kernel treats as inert) so that kernel DMA chunks never straddle a
    tile boundary. The returned arrays then have static length
    pair_cap + num_tiles * align.
    """
    tx_n, ty_n = tile_dims(H, W, tile)
    num_tiles = tx_n * ty_n
    P = prep.depth.shape[0]

    cx = prep.center_pix[:, 0]
    cy = prep.center_pix[:, 1]
    r = prep.radius
    x0 = jnp.clip(jnp.floor((cx - r) / tile), 0, tx_n - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((cx + r) / tile), 0, tx_n - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((cy - r) / tile), 0, ty_n - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((cy + r) / tile), 0, ty_n - 1).astype(jnp.int32)
    nx = jnp.where(prep.valid, x1 - x0 + 1, 0)
    ny = jnp.where(prep.valid, y1 - y0 + 1, 0)
    counts = nx * ny  # (P,)

    ends = jnp.cumsum(counts)  # inclusive
    starts = ends - counts
    total = ends[-1] if P > 0 else jnp.asarray(0, jnp.int32)

    slots = jnp.arange(pair_cap, dtype=jnp.int32)
    # pair slot -> owning splat: first splat whose end > slot
    gauss = jnp.searchsorted(ends, slots, side="right").astype(jnp.int32)
    in_range = slots < jnp.minimum(total, pair_cap)
    gauss_c = jnp.clip(gauss, 0, P - 1)
    k = slots - starts[gauss_c]  # rank within the splat's rectangle
    tx = x0[gauss_c] + k % jnp.maximum(nx[gauss_c], 1)
    ty = y0[gauss_c] + k // jnp.maximum(nx[gauss_c], 1)
    tid = jnp.where(in_range, ty * tx_n + tx, num_tiles)

    depth = jnp.where(in_range, prep.depth[gauss_c], jnp.inf)
    # lexicographic (tile, depth) sort; invalid pairs (tid=num_tiles) go last
    tid_s, _, gauss_s = jax.lax.sort(
        (tid, depth, jnp.where(in_range, gauss_c, 0)), num_keys=2
    )

    bounds = jnp.searchsorted(
        tid_s, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    if align > 1:
        # re-scatter to chunk-aligned per-tile ranges
        counts = bounds[1:] - bounds[:-1]
        padded = -(-counts // align) * align
        poffs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
        )
        cap_aligned = pair_cap + num_tiles * align
        tid_c = jnp.clip(tid_s, 0, num_tiles - 1)
        new_pos = poffs[tid_c] + (
            jnp.arange(pair_cap, dtype=jnp.int32) - bounds[tid_c]
        )
        new_pos = jnp.where(tid_s < num_tiles, new_pos, cap_aligned)  # drop
        gauss_aligned = jnp.full((cap_aligned,), P, jnp.int32)  # P = sentinel
        gauss_aligned = gauss_aligned.at[new_pos].set(gauss_s, mode="drop")
        return BinnedPairs(
            gauss_idx=gauss_aligned,
            tile_bounds=poffs,
            num_pairs=total.astype(jnp.int32),
            tiles_x=tx_n,
            tiles_y=ty_n,
            tile=tile,
        )

    return BinnedPairs(
        gauss_idx=gauss_s,
        tile_bounds=bounds,
        num_pairs=total.astype(jnp.int32),
        tiles_x=tx_n,
        tiles_y=ty_n,
        tile=tile,
    )
