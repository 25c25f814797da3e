"""Multi-channel fill-forward ("last marker wins") Pallas kernel.

The workhorse primitive of pair expansion: given sparse markers scattered
into a length-N array (value channels + a validity flag), produce for every
position the channel values of the LAST marker at-or-before it. This is the
"segment broadcast" that turns per-splat attributes into per-pair
attributes without random gathers (row-rate bound at ~10ns/row on v5e) or
XLA cummax sweeps (~7ms per channel at 4M).

One linear pass: values live as (C, N/128, 128) row-major; each grid step
scans a block with a lane-level last-valid scan (log2(128) roll-selects),
a sublane-level row scan, and a cross-block carry in VMEM scratch (TPU grid
steps execute sequentially on a core, so scratch persists).

Unlike the int32-composite cummax trick this imposes NO bit-width limits on
the channel values, and all C channels ride one pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BROWS = 256  # rows per grid step (block = BROWS * 128 elements)


def _last_valid_scan(val, has, axis, size, exclusive=False):
    """Parallel last-valid scan along `axis` (Hillis-Steele roll-selects).

    `has` is int32 0/1 (Mosaic scalar ops want 32-bit types)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, val.shape, axis)
    s = 1
    while s < size:
        pv = pltpu.roll(val, shift=s, axis=axis)
        ph = pltpu.roll(has, shift=s, axis=axis)
        ok = (idx >= s).astype(jnp.int32)
        incoming = ph * ok
        take = (1 - has) * incoming
        val = jnp.where(take != 0, pv, val)
        has = jnp.maximum(has, incoming)
        s *= 2
    if exclusive:
        pv = pltpu.roll(val, shift=1, axis=axis)
        ph = pltpu.roll(has, shift=1, axis=axis)
        ok = (idx >= 1).astype(jnp.int32)
        val = jnp.where(ok != 0, pv, 0)
        has = ph * ok
    return val, has


def _ff_kernel(C, vals_ref, valid_ref, out_ref, carry_val, carry_has):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        for c in range(C):
            carry_val[c] = 0
        carry_has[0] = 0

    has0 = valid_ref[0]  # (BROWS, LANES) int32 0/1
    # 1) lane-level scan within each row (shared `has` for all channels)
    has_l = None
    vals_l = []
    for c in range(C):
        v, h = _last_valid_scan(vals_ref[c], has0, axis=1, size=LANES)
        vals_l.append(v)
        has_l = h
    # 2) row summaries -> exclusive row-level scan (value at lane 127)
    row_val = [v[:, LANES - 1:LANES] for v in vals_l]  # (BROWS, 1)
    row_has = has_l[:, LANES - 1:LANES]
    row_pref = []
    pref_has = None
    for c in range(C):
        pv, ph = _last_valid_scan(row_val[c], row_has, axis=0, size=BROWS,
                                  exclusive=True)
        row_pref.append(pv)
        pref_has = ph
    # 3) combine: positions with no in-row marker take the row prefix,
    #    else (no prefix either) the cross-block carry
    for c in range(C):
        fallback = jnp.where(pref_has != 0, row_pref[c], carry_val[c])
        out_ref[c] = jnp.where(has_l != 0, vals_l[c], fallback)
    # 4) update carry with this block's last value (scalar reductions keep
    #    everything int32 for Mosaic)
    last_row_has = jnp.max(row_has[BROWS - 1:BROWS, :])
    last_pref_has = jnp.max(pref_has[BROWS - 1:BROWS, :])
    for c in range(C):
        v_in_row = jnp.max(
            jnp.where(jnp.ones((1, 1), jnp.int32) != 0,
                      vals_l[c][BROWS - 1:BROWS, LANES - 1:LANES], 0)
        )
        v_pref = jnp.max(row_pref[c][BROWS - 1:BROWS, :])
        carry_val[c] = jnp.where(
            last_row_has != 0, v_in_row,
            jnp.where(last_pref_has != 0, v_pref, carry_val[c]),
        )
    any_has = jnp.maximum(jnp.max(has_l), carry_has[0])
    carry_has[0] = any_has


@functools.partial(jax.jit, static_argnames=("interpret",))
def fill_forward(vals: jnp.ndarray, valid: jnp.ndarray, interpret: bool = False):
    """vals (C, N) int32, valid (N,) bool/int32 -> filled (C, N) int32.

    Positions before the first marker get 0. N must be a multiple of
    LANES * BROWS (pad inputs; markers never live in padding).
    """
    C, N = vals.shape
    assert N % (LANES * BROWS) == 0, f"N={N} must be multiple of {LANES*BROWS}"
    rows = N // LANES
    v3 = vals.reshape(C, rows, LANES)
    m3 = valid.astype(jnp.int32).reshape(1, rows, LANES)
    grid = rows // BROWS

    out = pl.pallas_call(
        functools.partial(_ff_kernel, C),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((C, BROWS, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BROWS, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, BROWS, LANES), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, rows, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((C,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(v3, m3)
    return out.reshape(C, N)
