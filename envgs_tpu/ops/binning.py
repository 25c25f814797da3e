"""Tile binning for the surfel rasterizer (XLA + the fill-forward kernel).

TPU-native replacement for the CUDA pipeline's duplicate-key radix sort
(tile|depth keys). Measured v5e costs drive the design: random-index gathers
and XLA scan primitives are slow (28-45ms at 4M pairs), while scatters,
near-identity gathers, one device sort, and the custom Pallas fill-forward
pass are cheap. Pipeline:

1. splats are PRE-SORTED BY DEPTH (one P argsort); splat index order ==
   blend order from here on — per-pair depth keys become unnecessary;
2. per-splat attributes broadcast to pair slots via ONE width-1 scatter of
   the splat id at each run start + a cummax sweep (ids ascend in depth
   order so running max == fill-forward) + ONE consolidated per-slot row
   gather — wide marker row-scatters measured ~100ns/row on v5e, ~2.5x the
   cost of this scatter+cummax+gather decomposition;
3. ONE single-key STABLE sort by tile id orders pairs (stability keeps the
   depth order within each tile);
4. chunk alignment (tile ranges padded to the kernel chunk so blend DMA
   never straddles tiles) reuses the fill-forward kernel + a near-identity
   gather.

gauss_idx indexes the DEPTH-SORTED splat order; `order` maps back to pool
indices (callers pack from permuted tables and scatter per-splat outputs
through it). Shape-static; overflow beyond pair_cap drops deterministically.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.ops.common import PreparedSplats, snug_row_interval
from envgs_tpu.ops.fill_forward import BROWS, LANES, fill_forward

_ALIGN_N = LANES * BROWS  # fill_forward length granularity


class BinnedPairs(NamedTuple):
    gauss_idx: jnp.ndarray  # (cap_aligned,) int32 DEPTH-ORDER splat per pair
    order: jnp.ndarray  # (P,) depth order -> pool index permutation
    tile_bounds: jnp.ndarray  # (num_tiles + 1,) int32 aligned range offsets
    num_pairs: jnp.ndarray  # () int32 real pair count (pre-drop)
    tiles_x: int
    tiles_y: int
    tile: int  # tile edge in pixels
    # training (aligned) layout only — the pair-grad transpose plan
    # (ops/segsum.presort_transpose): pre-sort slot of each aligned slot
    # (sentinel pair_cap), per-splat run starts/counts in pre-sort space
    # (depth order), and the static pre-sort capacity
    pre_idx: jnp.ndarray | None = None  # (cap_aligned,) int32
    seg_starts: jnp.ndarray | None = None  # (P,) int32
    seg_counts: jnp.ndarray | None = None  # (P,) int32
    pre_cap: int = 0


def tile_dims(H: int, W: int, tile: int):
    return -(-W // tile), -(-H // tile)


def _round_up(n, m):
    return -(-n // m) * m


def tile_stable_sort(tid: jnp.ndarray, gid: jnp.ndarray, num_tiles: int,
                     P: int, payload: jnp.ndarray | None = None):
    """Stable (tile-major, gid-order-preserving) sort of (tid, gid)
    [+ an optional int32 payload carried through the permutation].

    When (tile id, depth rank) packs into 32 bits, sort ONE int32 array
    (key = tid << gbits | gid): gid is strictly increasing within a tile
    in the input, so the packed order IS the stable order — and a
    single-array sort moves half the bytes of the (key, value) pair sort
    through the comparator network. All 32 bits are usable: XOR with the
    sign bit maps unsigned key order onto int32 signed order (the classic
    radix trick), which is what buys the 13-tile-bit + 19-rank-bit
    production scale (300K splats at 1600px) the packed path. (tid, gid)
    keys are unique (a splat hits a tile at most once), so the payload
    variants can stay unstable without changing the order."""
    gbits = max(int(P).bit_length(), 1)
    nbits = int(num_tiles).bit_length() + gbits  # num_tiles = sentinel tile
    if nbits <= 32:
        key = (tid << gbits) | gid
        if nbits == 32:  # sign bit in use: flip to keep unsigned order
            key = key ^ jnp.int32(-2147483648)
        if payload is None:
            key_s = jax.lax.sort(key, is_stable=False)
            pay_s = None
        else:
            key_s, pay_s = jax.lax.sort((key, payload), num_keys=1,
                                        is_stable=False)
        if nbits == 32:
            key_s = key_s ^ jnp.int32(-2147483648)
        tid_s = jax.lax.shift_right_logical(key_s, gbits)
        gauss_s = key_s & ((1 << gbits) - 1)
        return (tid_s, gauss_s) if payload is None else (tid_s, gauss_s,
                                                         pay_s)
    if payload is None:
        return jax.lax.sort((tid, gid), num_keys=1, is_stable=True)
    return jax.lax.sort((tid, gid, payload), num_keys=2, is_stable=False)


def bin_splats(
    prep: PreparedSplats, H: int, W: int, tile: int, pair_cap: int,
    align: int = 64, interpret: bool = False, lowpass_r: float = 0.0,
    aligned: bool = True, row_window=None,
) -> BinnedPairs:
    """Expand splats into (splat, tile) pairs sorted by (tile, depth), each
    tile's range padded to a multiple of `align` (padding -> sentinel P).

    When `prep.rowcull` is present, pairs whose tile lies outside the
    splat's per-tile-row footprint interval (the alpha-floor iso-level
    ellipse, union the lowpass circle when lowpass_r > 0) are retargeted to
    the sentinel tile before the sort — they sort past every real tile, so
    blend/gather work drops with NO output change (those pixels are below
    the 1/255 alpha floor by construction).

    row_window = (ty0 traced tile-row offset, n_tile_rows static): bin only
    the tiles of one horizontal image band, with tile ids band-LOCAL (the
    band-parallel row-crop path: `prep` comes from the FULL camera so every
    float is bit-identical to single-chip; the banding is integer tile
    arithmetic only)."""
    tx_n, ty_full = tile_dims(H, W, tile)
    if row_window is None:
        ty0, ty_n = None, ty_full
    else:
        ty0, ty_n = row_window
    num_tiles = tx_n * ty_n
    P = prep.depth.shape[0]
    pair_cap = _round_up(pair_cap, _ALIGN_N)

    # ---- depth-sort the splats (index order becomes blend order) ----
    order = jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf))
    # ONE consolidated row-gather for every per-splat column: row gathers
    # are row-RATE bound on v5e (~10ns/row regardless of width), so k
    # separate per-column gathers cost k times this single (P, k) gather
    ext = getattr(prep, "ext", None)
    rowcull = getattr(prep, "rowcull", None)
    gcols = [prep.center_pix,
             ext if ext is not None
             else jnp.stack([prep.radius, prep.radius], -1),
             prep.valid[:, None].astype(jnp.float32)]
    if rowcull is not None:
        gcols.append(rowcull)
    packed_cols = jnp.concatenate(gcols, axis=1)[order]
    cx = packed_cols[:, 0]
    cy = packed_cols[:, 1]
    # snug per-axis extents when available (exact ellipse AABB rect vs the
    # square of the max extent — ~2x fewer pairs for anisotropic splats)
    rx = packed_cols[:, 2]
    ry = packed_cols[:, 3]
    valid = packed_cols[:, 4] > 0.5

    x0 = jnp.clip(jnp.floor((cx - rx) / tile), 0, tx_n - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((cx + rx) / tile), 0, tx_n - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((cy - ry) / tile), 0, ty_full - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((cy + ry) / tile), 0, ty_full - 1).astype(jnp.int32)
    if ty0 is not None:
        # clip the tile-row span to the band window (band-local rows)
        y0 = jnp.maximum(y0, ty0) - ty0
        y1 = jnp.minimum(y1, ty0 + ty_n - 1) - ty0
    nx = jnp.where(valid, x1 - x0 + 1, 0)
    ny = jnp.where(valid & (y1 >= y0), y1 - y0 + 1, 0)
    counts = nx * ny
    ends = jnp.cumsum(counts)
    starts = ends - counts
    total = ends[-1] if P > 0 else jnp.asarray(0, jnp.int32)

    # ---- broadcast per-splat values to pair slots ----
    # A (cap, 12) marker row-scatter + 12-channel fill-forward measured
    # 37.7 + 10.2 ms at a 2M cap on v5e (scatter cost scales with scattered
    # row width). Instead: ONE width-1 scatter of the depth-order splat id
    # at each selected start (3 ms), a cummax sweep (ids ascend in depth
    # order, so running max == fill-forward; 2 ms), then ONE consolidated
    # per-slot row gather of the per-splat columns (~15 ms, row-rate bound).
    sel = counts > 0
    pos = jnp.where(sel, starts, pair_cap)  # unique ascending per selection
    ids = jnp.arange(P, dtype=jnp.int32)
    t0 = y0 * tx_n + x0  # base tile id
    sid = jnp.zeros((pair_cap,), jnp.int32).at[pos].set(ids, mode="drop")
    gid = jax.lax.cummax(sid)  # per-slot source splat (depth order)
    # barrier: keep the row gather below on XLA's fast gather path — fusing
    # computed indices into a gather lowers it to a pathological loop
    # (measured 18 ms vs 0.05 ms at a 2M cap, scripts/tpu_micro_culltail.py)
    gid = jax.lax.optimization_barrier(gid)
    cols = [starts, t0, jnp.maximum(nx, 1)]
    if rowcull is not None:
        # float params ride the int32 table via bitcast (nothing does
        # arithmetic on them before the bitcast back); center (for the
        # lowpass circle) + packed_cols[:, 5:11] = rowcull, all already
        # permuted by the single consolidated gather above
        cols += [
            jax.lax.bitcast_convert_type(packed_cols[:, i], jnp.int32)
            for i in (0, 1, 5, 6, 7, 8, 9, 10)
        ]
    table = jnp.stack(cols, axis=1)  # (P, 3 or 11) int32
    filled_rows = jax.lax.optimization_barrier(table[gid])  # (cap, k)
    start_s, t0_s, nx_s = (filled_rows[:, 0], filled_rows[:, 1],
                           filled_rows[:, 2])

    slots = jnp.arange(pair_cap, dtype=jnp.int32)
    in_range = slots < jnp.minimum(total, pair_cap)
    k = slots - start_s
    ty_s = jax.lax.div(t0_s, tx_n) + jax.lax.div(k, nx_s)
    xt_s = jax.lax.rem(t0_s, tx_n) + jax.lax.rem(k, nx_s)
    tid = jnp.where(in_range, ty_s * tx_n + xt_s, num_tiles)
    if rowcull is not None:
        f32 = lambda i: jax.lax.bitcast_convert_type(
            filled_rows[:, i], jnp.float32)
        ctr = jnp.stack([f32(3), f32(4)], axis=-1)
        rc = jnp.stack([f32(5 + i) for i in range(6)], axis=-1)
        ty_glob = ty_s if ty0 is None else ty_s + ty0
        yb0 = (ty_glob * tile).astype(jnp.float32)
        yb1 = yb0 + (tile - 1)
        x_lo, x_hi = snug_row_interval(ctr, rc, yb0, yb1, lowpass_r)
        xt_f = xt_s.astype(jnp.float32) * tile
        keep = (xt_f + (tile - 1) >= x_lo) & (xt_f <= x_hi)
        tid = jnp.where(keep, tid, num_tiles)

    # ---- stable single-key sort: tile-major, depth order preserved ----
    if aligned:
        # training layout: carry pre-sort slot ids through the permutation
        # so the pair-grad transpose can scatter straight back into the
        # contiguous per-splat runs (segsum.presort_transpose)
        tid_s, gauss_s, pre_s = tile_stable_sort(
            tid, gid, num_tiles, P, payload=slots)
    else:
        tid_s, gauss_s = tile_stable_sort(tid, gid, num_tiles, P)

    # ---- per-tile bounds via binary search on the sorted keys. NOTE:
    # method="sort" (a win for segsum's 131K-query boundary pass) LOSES
    # here — ~6K tile queries over a 2M key array make the extra full-array
    # merge sort cost far more than the vectorized binary search (measured
    # -12% render fps when this used method="sort") ----
    bounds = jnp.searchsorted(
        tid_s, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    if not aligned:
        # Render-only fast path: raw (unaligned) bounds straight to the
        # blend kernel, which masks the tail rows of each tile's last chunk
        # (no wet rows in this layout). Skips the whole alignment stage —
        # fill-forward + a cap-sized near-identity gather, ~20 ms at a 2M
        # cap on v5e. One sentinel chunk of padding absorbs the last tile's
        # chunk-DMA overrun.
        gauss_pad = jnp.concatenate(
            [gauss_s, jnp.full((align,), P, jnp.int32)])
        return BinnedPairs(
            gauss_idx=gauss_pad,
            order=order,
            tile_bounds=bounds,
            num_pairs=total.astype(jnp.int32),
            tiles_x=tx_n,
            tiles_y=ty_n,
            tile=tile,
        )
    counts_t = bounds[1:] - bounds[:-1]
    padded = -(-counts_t // align) * align
    poffs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )

    # ---- aligned layout: fill-forward sweeps + near-identity gather ----
    cap_aligned = _round_up(pair_cap + num_tiles * align, _ALIGN_N)
    am = jnp.zeros((cap_aligned, 3), jnp.int32).at[poffs[:-1], :].max(
        jnp.stack([bounds[:-1], poffs[:-1], bounds[1:]], axis=1), mode="drop"
    ).T
    avalid = jnp.zeros((cap_aligned,), jnp.int32).at[poffs[:-1]].set(
        1, mode="drop"
    )
    tstart, pstart, limit = fill_forward(am, avalid, interpret=interpret)
    j = jnp.arange(cap_aligned, dtype=jnp.int32)
    src = tstart + (j - pstart)
    valid_dst = src < limit
    src = jnp.where(valid_dst, jnp.clip(src, 0, pair_cap - 1), 0)
    # one consolidated 2-col near-identity gather (row-rate bound: a second
    # separate (cap,) gather would double the cost); barriers keep it on the
    # fast gather path (no index/select fusion — see gid note above)
    src = jax.lax.optimization_barrier(src)
    both = jax.lax.optimization_barrier(
        jnp.stack([gauss_s, pre_s], axis=1)[src])
    gauss_aligned = jnp.where(valid_dst, both[:, 0], P)
    pre_aligned = jnp.where(valid_dst, both[:, 1], pair_cap)

    return BinnedPairs(
        gauss_idx=gauss_aligned,
        order=order,
        tile_bounds=poffs,
        num_pairs=total.astype(jnp.int32),
        tiles_x=tx_n,
        tiles_y=ty_n,
        tile=tile,
        pre_idx=pre_aligned,
        seg_starts=starts,
        seg_counts=counts,
        pre_cap=pair_cap,
    )
