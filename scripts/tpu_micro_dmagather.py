"""Microbench: Pallas DMA-gather vs the XLA row gather.

Round-3 measured the XLA row gather at a ~8.4 ns/row RATE bound (width and
dtype free) — a property of XLA's gather loop, not of HBM. This probes
whether a Pallas kernel issuing per-row indexed async copies (scalar-read
indices from SMEM, deep in-flight pipeline) beats that rate. Variants:

  xla        — t[i] baseline (the production gather today)
  dma1       — (1, 128) bf16 row DMA per index, NSEM-deep pipeline
  dma8       — (8, 128) aligned-down window DMA per index (if dma1's
               arbitrary row offsets fail Mosaic's tiling rules)
  dma1_f32   — (1, 128) f32 rows (sublane tile 8 vs 16)

Usage: python scripts/tpu_micro_dmagather.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 500_000
CAP = 2 ** 21
BLOCK = 2048   # rows gathered per grid step
NSEM = 16      # in-flight DMA depth

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, S, CAP), jnp.int32)


def timeit(fn, *a, n=10, name=""):
    try:
        out = fn(*a)
        _ = float(jnp.asarray(out).astype(jnp.float32).ravel()[0])
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:200]})")
        return
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    _ = float(jnp.asarray(out).astype(jnp.float32).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1000:.2f} ms  ({dt / CAP * 1e9:.2f} ns/row)")


def _gather_kernel_rows(idx_ref, tab_ref, out_ref, sems):
    def body(j, _):
        dma = pltpu.make_async_copy(
            tab_ref.at[pl.ds(idx_ref[j], 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[jax.lax.rem(j, NSEM)],
        )
        dma.start()

        @pl.when(j >= NSEM - 1)
        def _():
            jw = j - (NSEM - 1)
            pltpu.make_async_copy(
                tab_ref.at[pl.ds(idx_ref[jw], 1), :],
                out_ref.at[pl.ds(jw, 1), :],
                sems.at[jax.lax.rem(jw, NSEM)],
            ).wait()

        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)

    def drain(j, _):
        pltpu.make_async_copy(
            tab_ref.at[pl.ds(idx_ref[j], 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[jax.lax.rem(j, NSEM)],
        ).wait()
        return 0

    jax.lax.fori_loop(BLOCK - NSEM + 1, BLOCK, drain, 0)


def dma_gather_rows(table, idx, block_rows=1):
    # indices stream through SMEM one BLOCK at a time (the full 2M-row
    # index array is 8 MB — far beyond the 1 MB SMEM budget that a
    # scalar-prefetch operand must fit in)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(CAP // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda g: (g,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
    )

    def kernel(idx_ref, tab_ref, out_ref, sems):
        g = pl.program_id(0)
        _gather_kernel_rows(idx_ref,
                            tab_ref, out_ref.at[pl.ds(g * BLOCK, BLOCK), :],
                            sems)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CAP, 128), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


def _gather_kernel_win8(idx_ref, tab_ref, out_ref, win, sems):
    """(8, 128) aligned-down window per index; row selected on the VPU."""
    def start(j):
        base = (idx_ref[j] // 8) * 8
        return pltpu.make_async_copy(
            tab_ref.at[pl.ds(pl.multiple_of(base, 8), 8), :],
            win.at[jax.lax.rem(j, NSEM)],
            sems.at[jax.lax.rem(j, NSEM)],
        )

    def pick(jw):
        # dynamic-sublane reads of bf16 VMEM don't lower; select the row
        # with an iota mask + sublane reduce instead
        r = idx_ref[jw] - (idx_ref[jw] // 8) * 8
        w = win[jax.lax.rem(jw, NSEM)].astype(jnp.float32)  # (8, 128)
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        sel = jnp.where(rows == r, w, 0.0)
        out_ref[pl.ds(jw, 1), :] = jnp.sum(
            sel, axis=0, keepdims=True).astype(out_ref.dtype)

    def body(j, _):
        start(j).start()

        @pl.when(j >= NSEM - 1)
        def _():
            jw = j - (NSEM - 1)
            start(jw).wait()
            pick(jw)

        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)

    def drain(j, _):
        start(j).wait()
        pick(j)
        return 0

    jax.lax.fori_loop(BLOCK - NSEM + 1, BLOCK, drain, 0)


def dma_gather_win8(table, idx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(CAP // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda g: (g,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NSEM, 8, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
    )

    def kernel(idx_ref, tab_ref, out_ref, win, sems):
        _gather_kernel_win8(idx_ref, tab_ref, out_ref, win, sems)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CAP, 128), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


if __name__ == "__main__":
    table = jnp.asarray(rng.standard_normal((S, 128)), jnp.bfloat16)
    timeit(jax.jit(lambda t, i: t[i]), table, idx, name="xla bf16")
    timeit(jax.jit(functools.partial(dma_gather_rows)), table, idx,
           name="dma1 bf16")
    timeit(jax.jit(dma_gather_win8), table, idx, name="dma8 bf16")
    t32 = table.astype(jnp.float32)
    timeit(jax.jit(lambda t, i: t[i]), t32, idx, name="xla f32")
    timeit(jax.jit(functools.partial(dma_gather_rows)), t32, idx,
           name="dma1 f32")
    # correctness spot check (first block)
    ref = np.asarray(table[idx[:BLOCK]])
    try:
        got = np.asarray(dma_gather_rows(table, idx)[:BLOCK])
        print("dma1 match:", np.array_equal(ref, got))
    except Exception as e:  # noqa: BLE001
        print("dma1 check failed:", str(e)[:160])
    try:
        got8 = np.asarray(dma_gather_win8(table, idx)[:BLOCK])
        print("dma8 match:", np.array_equal(ref, got8))
    except Exception as e:  # noqa: BLE001
        print("dma8 check failed:", str(e)[:160])
