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


def gather_transpose(g, gauss_idx, n_segments: int, S: int,
                     interpret: bool = False):
    """Scatter-free transpose of `packed[gauss_idx]`: per-segment sums of the
    pair-row cotangents g (N, 128) -> (S, 128) without duplicate-index
    scatter-adds (sort + segmented-scan + unique-row gather)."""
    N = gauss_idx.shape[0]
    ids_sorted, perm = jax.lax.sort(
        (gauss_idx, jnp.arange(N, dtype=jnp.int32)), num_keys=1,
        is_stable=True,
    )
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), ids_sorted[:-1]])
    seg_start = (ids_sorted != prev).astype(jnp.int32)
    q = jnp.arange(n_segments, dtype=jnp.int32)
    left = jnp.searchsorted(ids_sorted, q, side="left").astype(jnp.int32)
    right = jnp.searchsorted(ids_sorted, q, side="right").astype(jnp.int32)
    ends = jnp.where(right > left, right - 1, -1)

    g_sorted = g[perm]  # row gather into segment-sorted order
    sums = segmented_inclusive_sum(g_sorted, seg_start, interpret=interpret)
    valid = (ends >= 0)[:, None]
    g_packed = jnp.where(valid, sums[jnp.clip(ends, 0, None)], 0.0)
    if g_packed.shape[0] < S:
        g_packed = jnp.pad(g_packed, ((0, S - g_packed.shape[0]), (0, 0)))
    else:
        g_packed = g_packed[:S]
    return g_packed


def _gr_bwd(n_segments, interpret, res, g):
    S, gauss_idx = res
    return gather_transpose(g, gauss_idx, n_segments, S, interpret), None


gather_rows.defvjp(_gr_fwd, _gr_bwd)
