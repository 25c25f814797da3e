"""Segmented row-sum: the scatter-free transpose of the pair gather.

`pair_data = packed[gauss_idx]` is the hot gather feeding the blend kernels.
Its autodiff transpose is a duplicate-index scatter-add — measured MINUTES
at 4M x 128 on v5e (XLA serializes colliding updates). `gather_rows` wraps
the gather in a custom VJP whose backward instead:

1. permutes the cotangent rows into segment-sorted order (row gather,
   row-rate bound ~50ms — the permutation is precomputed once per frame in
   the binning stage, where the ids are already being sorted);
2. runs a SEGMENTED INCLUSIVE SUM Pallas scan along rows (reset at segment
   starts; log-step sublane roll-adds with a cross-block carry);
3. gathers the per-segment totals at each segment's LAST row (P unique rows).

No scatter with duplicates anywhere, exact per-segment summation order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SROWS = 1024  # rows per grid step
SLANES = 128


def _segscan_kernel(rows_ref, flags_ref, out_ref, carry_v, carry_f):
    """Inclusive segmented sum along rows of a (SROWS, 128) block.

    flags: 1 at segment STARTS (reset accumulation). Carry persists across
    sequential grid steps in VMEM scratch.
    """
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry_v[...] = jnp.zeros_like(carry_v)
        carry_f[0] = 0

    v = rows_ref[...]  # (SROWS, 128) f32
    f = flags_ref[...]  # (SROWS, 1) i32, 1 = segment start
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    s = 1
    # segmented Hillis-Steele: (v, f) with combine
    #   out.v = f_hi ? v_hi : v_lo + v_hi ; out.f = f_lo | f_hi
    fi = (f != 0).astype(jnp.int32)
    while s < SROWS:
        pv = pltpu.roll(v, shift=s, axis=0)
        pf = pltpu.roll(fi, shift=s, axis=0)
        ok = idx >= s
        okf = (jax.lax.broadcasted_iota(jnp.int32, fi.shape, 0) >= s)
        v = jnp.where(jnp.logical_and(ok, jnp.logical_not(
            jnp.broadcast_to(fi != 0, v.shape))), v + pv, v)
        fi = jnp.where(okf, jnp.maximum(fi, pf), fi)
        s *= 2
    # rows whose segment started before this block add the carry
    no_start = jnp.broadcast_to(fi == 0, v.shape)
    v = jnp.where(no_start, v + carry_v[...], v)
    out_ref[...] = v
    # carry for the next block = value of the last row (its segment may
    # continue); if the last row's segment started in-block the carry resets
    carry_v[...] = v[SROWS - 1:SROWS, :]
    carry_f[0] = jnp.max(fi)


@functools.partial(jax.jit, static_argnames=("interpret",))
def segmented_inclusive_sum(rows, seg_start, interpret: bool = False):
    """rows (N, 128) f32, seg_start (N,) int32 -> inclusive segmented sums."""
    N = rows.shape[0]
    assert N % SROWS == 0 and rows.shape[1] == SLANES
    out = pl.pallas_call(
        _segscan_kernel,
        grid=(N // SROWS,),
        in_specs=[
            pl.BlockSpec((SROWS, SLANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SROWS, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SROWS, SLANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, SLANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, SLANES), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(rows, seg_start.reshape(N, 1))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows(packed, gauss_idx, n_segments: int, interpret: bool = False):
    """packed (S, 128), gauss_idx (N,) -> (N, 128).

    The backward plan (segment-sorted permutation, run starts, run ends)
    is built inside the VJP, so pure rendering pays nothing extra."""
    return packed[gauss_idx]


def _gr_fwd(packed, gauss_idx, n_segments, interpret):
    return packed[gauss_idx], (packed.shape[0], gauss_idx)


def contiguous_run_sums(rows, starts, counts, S: int, width: int):
    """Per-run sums over CONTIGUOUS row ranges [starts[p], starts[p] +
    counts[p]) of rows (N, >=width) -> (S, width); runs beyond len(starts)
    and empty runs give zero rows.

    Blocked triangular-matmul inclusive prefix (MXU) + boundary gathers:
    run total = P(end) - P(start-1) with P(i) = blockpre[i // B] +
    inblock_prefix[i]. The blockpre terms cancel EXACTLY for runs inside a
    single block (the common case — runs average a handful of rows), so the
    difference is precision-safe; runs spanning blocks are large, keeping
    the global block-prefix difference's relative error small."""
    B = 512
    N = rows.shape[0]
    cap = -(-N // B) * B
    g = rows[:, :width]
    if cap != N:
        g = jnp.pad(g, ((0, cap - N), (0, 0)))
    blocks = g.reshape(cap // B, B, width)
    tril = jnp.tril(jnp.ones((B, B), g.dtype))
    inpre = jnp.einsum("ij,njw->niw", tril, blocks,
                       precision=jax.lax.Precision.HIGHEST)
    blocktot = inpre[:, B - 1, :]  # (NB, width)
    blockpre = jnp.cumsum(blocktot, axis=0) - blocktot  # exclusive
    flat = inpre.reshape(cap, width)

    def P_at(idx):  # global inclusive prefix at row idx (row-rate gathers)
        # barriers: keep both gathers on the fast path (index/consumer
        # fusion into a gather is pathological — tpu_micro_culltail.py)
        idx = jax.lax.optimization_barrier(idx)
        return (jax.lax.optimization_barrier(blockpre[idx // B])
                + jax.lax.optimization_barrier(flat[idx]))

    ends = jnp.clip(starts + counts - 1, 0, cap - 1)
    st = jnp.clip(starts, 0, cap - 1)
    hi = P_at(ends)
    lo = jnp.where((st > 0)[:, None], P_at(jnp.maximum(st - 1, 0)), 0.0)
    nonempty = (counts > 0) & (starts < cap)
    totals = jnp.where(nonempty[:, None], hi - lo, 0.0)
    if totals.shape[0] < S:
        totals = jnp.pad(totals, ((0, S - totals.shape[0]), (0, 0)))
    return totals[:S]


def gather_transpose(g, gauss_idx, n_segments: int, S: int,
                     interpret: bool = False, width: int | None = None,
                     drop_last_segment: bool = False):
    """Scatter-free transpose of `packed[gauss_idx]`: per-segment sums of the
    pair-row cotangents g (N, >=width) -> (S, width) without duplicate-index
    scatter-adds (sort + contiguous-run reduction + boundary gathers).

    Run boundaries come from MARKER ROWS folded into the main sort instead
    of a separate searchsorted: one marker key per segment (2*s) interleaves
    with the data keys (2*id + 1), so after ONE pair sort the marker
    positions ARE the segment bounds — recovered by a width-1 unique-index
    scatter (marker keys are distinct; data rows scatter out of range and
    drop). This replaces the searchsorted(method="sort") pass (~19 ms at a
    2M cap / 131K segments on v5e — itself a concat+sort) with ~6% more
    rows through the one sort that was already being paid. Marker rows are
    EXCLUDED from the runs (starts = bounds[:-1] + 1, counts subtract 1);
    their payload N points at an appended zero row only so the gather stays
    in range and no garbage/NaN enters the triangular-matmul block prefix.

    drop_last_segment: zero the rows of segment n_segments-1 before the
    reduction — for callers whose last table row is the sentinel/padding
    convention, where blend kernels may leave those cotangent rows as
    GARBAGE (even NaN): 0 * NaN = NaN would poison every block of the
    triangular-matmul prefix. Keep False for a mathematically faithful
    transpose (e.g. gather_rows' VJP)."""
    del interpret  # pure XLA now (no Pallas segscan on this path)
    N = gauss_idx.shape[0]
    width = g.shape[1] if width is None else width
    S_q = n_segments + 1  # markers 0..n_segments (right edge included)
    keys = jnp.concatenate([gauss_idx * 2 + 1,
                            jnp.arange(S_q, dtype=jnp.int32) * 2])
    payload = jnp.concatenate([jnp.arange(N, dtype=jnp.int32),
                               jnp.full((S_q,), N, jnp.int32)])
    keys_s, pay_s = jax.lax.sort(
        (keys, payload), num_keys=1,
        is_stable=False,  # within-segment order is irrelevant for a sum
    )
    M = N + S_q
    posm = jnp.arange(M, dtype=jnp.int32)
    # marker j sits at bounds[j]; data rows target distinct out-of-range
    # slots (>= S_q) so the scatter stays unique-index and drops them
    dst = jnp.where((keys_s & 1) == 0, keys_s >> 1, S_q + posm)
    bounds = jnp.zeros((S_q,), jnp.int32).at[dst].set(
        posm, mode="drop", unique_indices=True)
    # NOTE: this concatenate materializes one extra copy of the (N, width)
    # cotangent matrix purely so payload N has a zero row to gather. If
    # profiles ever show it hot, clamp pay_s to N-1 for the gather and zero
    # marker rows with a where on (keys_s & 1) == 0 instead.
    gpad = jax.lax.optimization_barrier(
        jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)]))
    # row gather into segment-sorted order (barriered: fast gather path)
    g_sorted = jax.lax.optimization_barrier(gpad[pay_s])
    if drop_last_segment:
        sentinel = ((keys_s >> 1) >= n_segments - 1)[:, None]
        g_sorted = jnp.where(sentinel, 0.0, g_sorted)
    # data-only runs (skip the marker row): empty segments keep count 0 so
    # their totals stay EXACT zeros (sparse Adam's grad==0 skip depends on
    # untouched splats having exactly-zero gradients, not prefix-difference
    # rounding noise)
    return contiguous_run_sums(g_sorted, bounds[:-1] + 1,
                               bounds[1:] - bounds[:-1] - 1, S, width)


def _gr_bwd(n_segments, interpret, res, g):
    S, gauss_idx = res
    return gather_transpose(g, gauss_idx, n_segments, S, interpret), None


gather_rows.defvjp(_gr_fwd, _gr_bwd)


@jax.custom_vjp
def permute_rows(x, perm, inv_perm):
    """`x[perm]` for a PERMUTATION `perm`, with the transpose expressed as a
    gather by the inverse permutation instead of XLA's generic scatter-add
    (which doesn't exploit uniqueness: measured 36 ms vs ~3 ms for the
    (500K, 20) pack-table permutation in the train step on v5e)."""
    del inv_perm
    return x[perm]


def _pr_fwd(x, perm, inv_perm):
    return x[perm], inv_perm


def _pr_bwd(inv_perm, g):
    return g[inv_perm], None, None


permute_rows.defvjp(_pr_fwd, _pr_bwd)


def invert_permutation(perm):
    """Inverse of a permutation via a unique-index scatter of iota."""
    n = perm.shape[0]
    return (
        jnp.zeros((n,), jnp.int32)
        .at[perm]
        .set(jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    )


# ---------------------------------------------------------------------------
# Pre-sort-run transpose (the production raster path)
# ---------------------------------------------------------------------------

def presort_transpose(g, pre_idx, seg_starts, seg_counts, pre_cap: int,
                      S: int, width: int):
    """Transpose of the aligned-pair gather when pairs were GENERATED as
    contiguous per-splat runs (ops/binning.bin_splats: slot range
    [seg_starts[p], seg_starts[p] + seg_counts[p]) of the pre-sort layout
    belongs to depth-rank p).

    Unlike `gather_transpose` (sort + segmented scan: ~229 ms at a 4M cap
    on v5e), this needs NO sort: scatter the cotangent rows back to their
    pre-sort slots (unique indices — a permutation), then per-splat sums
    via a blocked triangular-matmul prefix (MXU) and boundary gathers.
    Block-prefix terms cancel EXACTLY for runs inside one block (the
    common case — runs average a handful of rows), so the prefix
    difference is precision-safe; runs spanning blocks are large, so the
    relative error of the global block-prefix difference stays small.

    g (N, >=width) f32, pre_idx (N,) int32 (sentinel >= pre_cap drops),
    seg_starts/seg_counts (P,) int32 in depth order -> (S, width) sums,
    rows P..S-1 zero.
    """
    # scatter FULL 128-lane rows: narrow-row scatters are pathological on
    # v5e (w32 measured 579 ms vs 50 ms at w128 — per-row relayout), while
    # the triangular-matmul reduction slices to `width` afterwards for free
    gpre = jnp.zeros((pre_cap, g.shape[1]), g.dtype).at[pre_idx].set(
        g, mode="drop", unique_indices=True)
    return contiguous_run_sums(gpre, seg_starts, seg_counts, S, width)
