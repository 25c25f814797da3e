"""Production tile rasterizer: fused Pallas TPU blend kernels + custom VJP.

TPU-native replacement for the reference's diff-surfel-rasterization CUDA
kernels (contract at /root/reference/easyvolcap/utils/gaussian2d_utils.py:
1090-1144). Architecture:

- projection/culling (prepare_splats) and tile binning (bin_splats) run as
  vectorized XLA; the per-tile blend runs as a Pallas kernel over a
  grid of 16x16-pixel tiles, pipelining chunk DMA of the (tile,depth)-sorted
  pair list from HBM.
- The per-chunk blend is fully data-parallel: the CUDA pipeline's sequential
  per-pixel front-to-back loop is replaced by a closed form — candidate
  transmittances T~_i = T_chunk * exp(prefix_sum(log(1-a))) are monotone, so
  the 1e-4 early-termination cutoff and the contributing set can be decided
  without any sequential dependency; prefix sums run as log2(S) sublane
  roll-adds on the VPU.
- The backward kernel walks chunks in reverse, reconstructing T by division
  (alpha <= 0.99 bounds it) and maintaining suffix accumulators — emitting
  per-PAIR gradients w.r.t. the packed splat data; the gather from per-splat
  data to pairs is plain XLA, so its transpose (scatter-add to splats) and
  the whole prepare-phase backward come from JAX autodiff for free.

Known deviation from the CUDA reference: median depth is treated as
non-differentiable (EnvGS trains with depth_ratio=0, where only expected
depth carries gradient).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from envgs_tpu.ops.common import (
    ALPHA_MAX,
    ALPHA_MIN,
    FAR_PLANE,
    FILTER_INV_SQUARE,
    NEAR_PLANE,
    T_CUTOFF,
)

TILE = 16
NPIX = TILE * TILE  # 256
CHUNK = 64  # pairs per inner step (sublane dim; 128 measured neutral fwd, more pad waste)
DPAD = 128  # packed per-pair feature width (lane dim; HBM DMA slices must
#   be 128-lane aligned, and ANY-space arrays are physically 128-wide anyway)
LO = 32  # logical pair-row width cap (<= 32 feature columns)
WET_COL = LO - 1  # backward grad-row lane carrying the per-pair blend
#   weight ("wet"): the bwd kernel recomputes w anyway, so riding it through
#   the existing pair-grad transpose delivers per-splat wet sums for free —
#   the forward's per-pair wet writes + the 19 ms duplicate-index
#   segment_sum they fed are both stripped from the training path.

# pair_data LOGICAL column layout (shared by the packed table, the DMA'd
# pair rows, and the gradient rows — all f32, one logical column per lane.
# An earlier design stored pair rows as a 3-term bf16 split on the belief
# that row gathers were bytes-bound; measurement says they are issue-RATE
# bound (~12 ns/row, width and dtype free — scripts/tpu_micro_gather.py,
# tpu_micro_dmagather.py), so f32 rows gather at the SAME cost while
# stripping the split's ~8-VPU-slot per-column decode from the blend
# kernels' hot loop. Chunk DMA stays hidden at 2x bytes.)
_C_TMAT = 0  # 9 floats, row-major (x-row, y-row, w-row over (u,v,1))
_C_CX = 9
_C_CY = 10
_C_OPAC = 11
_C_NRM = 12  # 3 floats
_C_COLOR = 15  # C floats (C <= 7)


def pack_rows(x: jnp.ndarray, width: int = DPAD) -> jnp.ndarray:
    """(N, <=LO) f32 -> (N, width) f32 zero-padded physical pair rows."""
    k = x.shape[-1]
    assert k <= width
    return jnp.pad(x, ((0, 0), (0, width - k)))


def _fout(C: int) -> int:
    """Output rows: C colors, depth_e, alpha, n0..n2, med, dist, T, D1, D2, last."""
    return C + 11


def _fpad(C: int) -> int:
    return -(-_fout(C) // 8) * 8


# row indices within the per-tile output block
def _rows(C: int):
    return dict(
        color=0, depth=C, alpha=C + 1, normal=C + 2, med=C + 5, dist=C + 6,
        trans=C + 7, d1=C + 8, d2=C + 9, last=C + 10,
    )


def _cumsum_sublane(x, S, exclusive, reverse=False):
    """Prefix/suffix sum along axis 0 of (S, NPIX) via roll-adds.

    (A triangular-matmul MXU variant was measured SLOWER on v5e — f32
    matmul emulation costs more than log2(S) VPU roll-add sweeps.)"""
    total = x
    sh = 1
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    while sh < S:
        if reverse:
            r = pltpu.roll(total, shift=S - sh, axis=0)  # pull from i+sh
            total = total + jnp.where(row < S - sh, r, 0.0)
        else:
            r = pltpu.roll(total, shift=sh, axis=0)  # pull from i-sh
            total = total + jnp.where(row >= sh, r, 0.0)
        sh *= 2
    return total - x if exclusive else total


def _cumprod_ex_sublane(x, S):
    """EXCLUSIVE prefix product along axis 0 of (S, NPIX) via roll-mults.

    Replaces exp(cumsum(log1p(-a))) in the forward transmittance chain —
    same log2(S) sweep count but no transcendentals (~17% of the forward
    blend's VPU slots at CHUNK=64). Underflow to 0 only happens below the
    T_CUTOFF early-termination threshold, where contributions are already
    discarded, so the semantics match the log-domain path."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    # shift down by one with identity fill: inclusive scan of the shifted
    # array == exclusive scan of x
    total = jnp.where(row >= 1, pltpu.roll(x, shift=1, axis=0), 1.0)
    sh = 1
    while sh < S:
        r = pltpu.roll(total, shift=sh, axis=0)
        total = total * jnp.where(row >= sh, r, 1.0)
        sh *= 2
    return total


def _prod_sublane(x, S):
    """Product along axis 0 of (S, NPIX) -> (1, NPIX) by halving folds
    (Mosaic has no reduce_prod lowering; log2(S) multiplies on shrinking
    shapes beat a full scan sweep)."""
    while S > 1:
        S //= 2
        x = x[:S] * x[S:]
    return x


def _pixel_coords(t, tiles_x, py_off=0):
    """Pixel centers of tile t as (1, NPIX) rows (integer-coord convention).

    py_off: global pixel-row offset of tile row 0 (band-parallel row-crop
    rendering: the band blends its own tiles but at GLOBAL pixel coords so
    every float product is bit-identical to the single-chip render)."""
    tx = jax.lax.rem(t, tiles_x)
    ty = jax.lax.div(t, tiles_x)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
    px = (tx * TILE + jax.lax.rem(lane, TILE)).astype(jnp.float32)
    py = (ty * TILE + py_off + jax.lax.div(lane, TILE)).astype(jnp.float32)
    return px, py


def _col32(d, i):
    """Logical column i of an f32 pair chunk -> (CHUNK, 1) f32."""
    return d[:, i:i + 1]


def _splat_pixel_terms(d, px, py, mode="surfel"):
    """Shared forward geometry: returns (a, amask, clampm, G, u, v, qz, z, b3).

    d: (CHUNK, DPAD) f32 packed pair chunk; px/py: (1, NPIX).

    mode="surfel": 2DGS ray-plane intersection through the tmat columns.
    mode="gauss3d": 3DGS EWA conic evaluation (the diff_gauss pipeline,
    see ops/raster3d_ref.py). Pair layout: conic(a,b,c) @ cols 0-2, view
    depth @ col 3, center @ _C_CX/_C_CY, opacity @ _C_OPAC, colors @
    _C_COLOR (normal cols packed zero).
    """
    col = lambda i: _col32(d, i)  # (S, 1) f32
    if mode == "gauss3d":
        ca, cb, cc = col(0), col(1), col(2)
        z = col(3)
        cx, cy, opac = col(_C_CX), col(_C_CY), col(_C_OPAC)
        dx = cx - px
        dy = cy - py
        rho = ca * dx * dx + cc * dy * dy + 2.0 * cb * dx * dy
        G = jnp.exp(-0.5 * jnp.maximum(rho, 0.0))
        oG = opac * G
        clampm = oG < ALPHA_MAX
        a_raw = jnp.minimum(ALPHA_MAX, oG)
        amask = (a_raw >= ALPHA_MIN) & (rho >= 0.0) & (z >= NEAR_PLANE)
        a = jnp.where(amask, a_raw, 0.0)
        zero = jnp.zeros_like(a)
        return (a, amask, clampm, G, zero, zero, zero, z,
                jnp.zeros_like(amask), dx, dy, zero, zero)
    t00, t01, t02 = col(0), col(1), col(2)
    t10, t11, t12 = col(3), col(4), col(5)
    t20, t21, t22 = col(6), col(7), col(8)
    cx, cy, opac = col(_C_CX), col(_C_CY), col(_C_OPAC)

    kx = t00 - px * t20
    ky = t01 - px * t21
    kz = t02 - px * t22
    lx = t10 - py * t20
    ly = t11 - py * t21
    lz = t12 - py * t22
    qx = ky * lz - kz * ly
    qy = kz * lx - kx * lz
    qz = kx * ly - ky * lx
    qz = jnp.where(jnp.abs(qz) < 1e-12, 1e-12, qz)
    u = qx / qz
    v = qy / qz
    rho3d = u * u + v * v
    dx = cx - px
    dy = cy - py
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    b3 = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    z = jnp.where(b3, u * t20 + v * t21 + t22, t22)
    G = jnp.exp(-0.5 * rho)
    oG = opac * G
    clampm = oG < ALPHA_MAX
    a_raw = jnp.minimum(ALPHA_MAX, oG)
    amask = (a_raw >= ALPHA_MIN) & (z >= NEAR_PLANE)
    a = jnp.where(amask, a_raw, 0.0)
    return a, amask, clampm, G, u, v, qz, z, b3, dx, dy, t20, t21


def _map_depth(z):
    zc = jnp.maximum(z, 1e-6)
    return (FAR_PLANE * (zc - NEAR_PLANE)) / ((FAR_PLANE - NEAR_PLANE) * zc)


def _dmap_dz(z):
    zc = jnp.maximum(z, 1e-6)
    return FAR_PLANE * NEAR_PLANE / ((FAR_PLANE - NEAR_PLANE) * zc * zc)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(C, tiles_x, bounds_ref, roff_ref, pair_ref, acc_ref,
                wet_ref, pair_vmem, wet_vmem, tcur, sem_p, sem_w, issued,
                mode="surfel", need_dist=True, need_med=True, need_wet=True,
                aligned=True, skip_dma=True):
    r = _rows(C)
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    if aligned:
        nchunks = jax.lax.div(end - start, CHUNK)
    else:
        # unaligned (render-only) layout: tile ranges are raw pair offsets.
        # Mosaic requires DMA offsets divisible by the sublane tiling (8),
        # so each chunk window is rounded DOWN to a multiple of 8 (a
        # constant shift of start%8 per tile, since CHUNK % 8 == 0) and
        # rows outside [start, end) are masked below. The first window may
        # include up to 7 rows of the previous tile and the last straddles
        # into the next tile's data.
        s8 = jax.lax.rem(start, 8)
        nchunks = jax.lax.div(end - start + s8 + (CHUNK - 1), CHUNK)
    px, py = _pixel_coords(t, tiles_x, roff_ref[0])

    acc_ref[...] = jnp.zeros_like(acc_ref)
    acc_ref[r["last"]:r["last"] + 1, :] = jnp.full((1, NPIX), -1.0)
    tcur[...] = jnp.ones_like(tcur)

    # double-buffered pair DMA: prefetch chunk c+1 while blending chunk c
    def pair_dma(slot, c):
        off = start + c * CHUNK
        if aligned:
            off = pl.multiple_of(off, CHUNK)
        else:
            off = pl.multiple_of(off - s8, 8)
        return pltpu.make_async_copy(
            pair_ref.at[pl.ds(off, CHUNK), :],
            pair_vmem.at[slot],
            sem_p.at[slot],
        )

    # saturation DMA skipping: once every pixel's transmittance is below
    # the cutoff, remaining chunks contribute nothing — skip their HBM
    # traffic, not just their compute (the kernels are DMA-bound).
    # `issued[0:2]` tracks which double-buffer slots hold an in-flight copy
    # so starts/waits stay balanced. The prefetch gate reads `issued[2]`,
    # the ONE-ITERATION-STALE aliveness stored at the end of the previous
    # body — gating on the current chunk's max(tcur) reduction would chain
    # each DMA start behind the previous chunk's compute and kill the double
    # buffer's overlap (measured -12% render fps). Staleness is safe:
    # aliveness only ever falls within a tile, so a chunk whose compute
    # runs always had its DMA issued; a dead tile merely prefetches up to
    # two extra chunks before stopping.
    if skip_dma:
        issued[0] = 0
        issued[1] = 0
        issued[2] = 1

    @pl.when(nchunks > 0)
    def _():
        pair_dma(0, 0).start()
        if skip_dma:
            issued[0] = 1

    def chunk_body(c, _):
        cur = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        if skip_dma:
            @pl.when((issued[2] == 1) & (c + 1 < nchunks))
            def _():
                pair_dma(nxt, c + 1).start()
                issued[nxt] = 1

            @pl.when(issued[cur] == 1)
            def _():
                pair_dma(cur, c).wait()

            issued[cur] = 0
        else:
            @pl.when(c + 1 < nchunks)
            def _():
                pair_dma(nxt, c + 1).start()

            pair_dma(cur, c).wait()
        alive = jnp.max(tcur[...]) >= T_CUTOFF
        if skip_dma:
            issued[2] = alive.astype(jnp.int32)

        @pl.when(alive)
        def _():
            off = start + c * CHUNK
            d = pair_vmem[jax.lax.rem(c, 2)]
            (a, amask, _clampm, _G, _u, _v, _qz, z, _b3, _dx, _dy, _t20,
             _t21) = _splat_pixel_terms(d, px, py, mode)
            if not aligned:
                # mask rows outside [start, end) — the 8-aligned window can
                # carry up to 7 rows of the previous tile in front and the
                # next tile's rows behind; their alpha must not touch
                # transmittance
                idx = (off - s8) + jax.lax.broadcasted_iota(
                    jnp.int32, a.shape, 0)
                inb = (idx >= start) & (idx < end)
                a = jnp.where(inb, a, 0.0)
                amask = amask & inb

            om = 1.0 - a
            Ttil = tcur[...] * _cumprod_ex_sublane(om, CHUNK)
            contrib = amask & (Ttil * om >= T_CUTOFF)
            w = jnp.where(contrib, a * Ttil, 0.0)

            if need_dist:  # distortion loss terms: training only
                m = _map_depth(z)
                wm = w * m
                wm2 = wm * m
                A_pre = acc_ref[r["alpha"]:r["alpha"] + 1, :] + _cumsum_sublane(
                    w, CHUNK, exclusive=True
                )
                D1_pre = acc_ref[r["d1"]:r["d1"] + 1, :] + _cumsum_sublane(
                    wm, CHUNK, exclusive=True
                )
                D2_pre = acc_ref[r["d2"]:r["d2"] + 1, :] + _cumsum_sublane(
                    wm2, CHUNK, exclusive=True
                )
                dist_c = w * (m * m * A_pre + D2_pre - 2.0 * m * D1_pre)

            # NOTE: accumulating the per-splat coefficient rows as one
            # lhs-contracted MXU matmul was measured SLOWER than these VPU
            # multiply+reduce passes (18.2 vs 16.2 ms at bench scale) — the
            # per-chunk coef relayout + MXU latency serialize against the
            # VPU pipeline. Keep the loops.
            for i in range(C):
                ci = _col32(d, _C_COLOR + i)
                acc_ref[i:i + 1, :] += jnp.sum(w * ci, axis=0, keepdims=True)
            for i in range(3):
                ni = _col32(d, _C_NRM + i)
                acc_ref[r["normal"] + i:r["normal"] + i + 1, :] += jnp.sum(
                    w * ni, axis=0, keepdims=True
                )
            acc_ref[r["depth"]:r["depth"] + 1, :] += jnp.sum(
                w * z, axis=0, keepdims=True
            )
            acc_ref[r["alpha"]:r["alpha"] + 1, :] += jnp.sum(
                w, axis=0, keepdims=True
            )
            if need_dist:
                acc_ref[r["d1"]:r["d1"] + 1, :] += jnp.sum(
                    wm, axis=0, keepdims=True)
                acc_ref[r["d2"]:r["d2"] + 1, :] += jnp.sum(
                    wm2, axis=0, keepdims=True)
                acc_ref[r["dist"]:r["dist"] + 1, :] += jnp.sum(
                    dist_c, axis=0, keepdims=True
                )
            if need_dist or need_med:
                rank = (
                    (c * CHUNK).astype(jnp.float32)
                    + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, NPIX), 0).astype(jnp.float32)
                )
            if need_med:
                # median depth: z of the LAST contributor with pre-blend T > 0.5
                c2 = contrib & (Ttil > 0.5)
                maxr = jnp.max(jnp.where(c2, rank, -1.0), axis=0, keepdims=True)
                zmed = jnp.sum(
                    jnp.where(c2 & (rank == maxr), z, 0.0), axis=0, keepdims=True
                )
                acc_ref[r["med"]:r["med"] + 1, :] = jnp.where(
                    maxr >= 0, zmed, acc_ref[r["med"]:r["med"] + 1, :]
                )
            if need_dist:  # the bwd kernel's chunk cutoff reads `last`
                acc_ref[r["last"]:r["last"] + 1, :] = jnp.maximum(
                    acc_ref[r["last"]:r["last"] + 1, :],
                    jnp.max(jnp.where(contrib, rank, -1.0), axis=0, keepdims=True),
                )
            tcur[...] = tcur[...] * _prod_sublane(
                jnp.where(contrib, om, 1.0), CHUNK
            )

            if need_wet:
                # per-pair accumulated blend weight ("wet") for this chunk.
                # (CHUNK,1) -> (1,128) without a relayout: ones @ (wsum * eye)
                wsum = jnp.sum(w, axis=1, keepdims=True)  # (CHUNK, 1)
                eye = (
                    jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 128), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 128), 1)
                ).astype(jnp.float32)
                wet_vmem[...] = jnp.dot(
                    jnp.ones((1, CHUNK), jnp.float32), wsum * eye,
                    preferred_element_type=jnp.float32,
                )
                wr = pltpu.make_async_copy(
                    wet_vmem, wet_ref.at[pl.ds(jax.lax.div(off, CHUNK), 1), :], sem_w
                )
                wr.start()
                wr.wait()

        if need_wet:
            # dead chunks still need their wet rows zeroed
            @pl.when(jnp.logical_not(alive))
            def _():
                off = start + c * CHUNK
                wet_vmem[...] = jnp.zeros_like(wet_vmem)
                wr = pltpu.make_async_copy(
                    wet_vmem, wet_ref.at[pl.ds(jax.lax.div(off, CHUNK), 1), :], sem_w
                )
                wr.start()
                wr.wait()

        return 0

    jax.lax.fori_loop(0, nchunks, chunk_body, 0)
    acc_ref[r["trans"]:r["trans"] + 1, :] = tcur[...]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(C, tiles_x, bounds_ref, roff_ref, pair_ref, res_ref, g_ref,
                gpair_ref, pair_vmem, gp_vmem, tcur, suf, sem_p, sem_g,
                mode="surfel", emit_wet=False):
    """Reverse walk emitting per-pair gradients.

    res_ref: (FPAD, NPIX) forward outputs (residuals).
    g_ref:   (FPAD, NPIX) upstream cotangents (med/d1/d2/last rows unused,
             trans row = full cotangent for final transmittance incl. bg).
    suf:     (4, NPIX) scratch [sufA, sufD1, sufD2, suf_gw] (suffix sums
             over already-processed = later splats).
    """
    r = _rows(C)
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    px, py = _pixel_coords(t, tiles_x, roff_ref[0])

    A_tot = res_ref[r["alpha"]:r["alpha"] + 1, :]
    D1_tot = res_ref[r["d1"]:r["d1"] + 1, :]
    D2_tot = res_ref[r["d2"]:r["d2"] + 1, :]
    T_fin = res_ref[r["trans"]:r["trans"] + 1, :]
    last = res_ref[r["last"]:r["last"] + 1, :]

    g_trans = g_ref[r["trans"]:r["trans"] + 1, :]
    g_depth = g_ref[r["depth"]:r["depth"] + 1, :]
    g_alpha = g_ref[r["alpha"]:r["alpha"] + 1, :]
    g_dist = g_ref[r["dist"]:r["dist"] + 1, :]
    # distortion-moment outputs D1 = Σ w·m, D2 = Σ w·m² are consumed by
    # splat-slab composition (cross-slab distortion term) — honor their
    # cotangents like the depth row's (zero and fused away otherwise)
    g_d1 = g_ref[r["d1"]:r["d1"] + 1, :]
    g_d2 = g_ref[r["d2"]:r["d2"] + 1, :]

    tcur[...] = T_fin
    suf[...] = jnp.zeros_like(suf)

    # only chunks up to the last contributor carry gradient
    lastmax = jnp.max(last)
    nchunks = jax.lax.div(end - start, CHUNK)
    nchunks_eff = jnp.minimum(
        nchunks,
        jax.lax.div(lastmax.astype(jnp.int32) + CHUNK, CHUNK),
    )
    nchunks_eff = jnp.maximum(nchunks_eff, 0)

    # double-buffered pair DMA (reverse order: prefetch chunk c-1)
    def pair_dma(slot, c):
        return pltpu.make_async_copy(
            pair_ref.at[pl.ds(pl.multiple_of(start + c * CHUNK, CHUNK), CHUNK), :],
            pair_vmem.at[slot],
            sem_p.at[slot],
        )

    @pl.when(nchunks_eff > 0)
    def _():
        pair_dma(jax.lax.rem(nchunks_eff - 1, 2), nchunks_eff - 1).start()

    def chunk_body(i, _):
        c = nchunks_eff - 1 - i
        off = start + c * CHUNK

        @pl.when(c - 1 >= 0)
        def _():
            pair_dma(jax.lax.rem(c - 1, 2), c - 1).start()

        pair_dma(jax.lax.rem(c, 2), c).wait()
        d = pair_vmem[jax.lax.rem(c, 2)]
        (a, amask, clampm, G, u, v, qz, z, b3, dx, dy, t20, t21) = (
            _splat_pixel_terms(d, px, py, mode)
        )
        rank = (
            (c * CHUNK).astype(jnp.float32)
            + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, NPIX), 0).astype(jnp.float32)
        )
        contrib = amask & (rank <= last)
        a = jnp.where(contrib, a, 0.0)
        om = 1.0 - a  # >= 0.01 by the alpha clamp

        log_om = jnp.where(contrib, jnp.log1p(-a), 0.0)
        # T before splat i = T_cur(after chunk) * exp(-sum_{j>=i} log(1-a_j))
        s_inc = _cumsum_sublane(log_om, CHUNK, exclusive=False, reverse=True)
        T_bef = tcur[...] * jnp.exp(-s_inc)

        w = jnp.where(contrib, a * T_bef, 0.0)
        m = _map_depth(z)
        wm = w * m
        wm2 = wm * m

        # suffix (strictly later splats, global) of w, wm, wm2
        sw_inc = _cumsum_sublane(w, CHUNK, exclusive=False, reverse=True)
        sm_inc = _cumsum_sublane(wm, CHUNK, exclusive=False, reverse=True)
        sm2_inc = _cumsum_sublane(wm2, CHUNK, exclusive=False, reverse=True)
        A_suf = suf[0:1, :] + sw_inc - w
        D1_suf = suf[1:2, :] + sm_inc - wm
        D2_suf = suf[2:3, :] + sm2_inc - wm2
        A_pre = A_tot - suf[0:1, :] - sw_inc
        D1_pre = D1_tot - suf[1:2, :] - sm_inc
        D2_pre = D2_tot - suf[2:3, :] - sm2_inc

        # dL/dw
        g_w = g_alpha + g_depth * z + g_d1 * m + g_d2 * m * m
        for i_ in range(C):
            ci = _col32(d, _C_COLOR + i_)
            g_w += g_ref[i_:i_ + 1, :] * ci
        for i_ in range(3):
            ni = _col32(d, _C_NRM + i_)
            g_w += g_ref[r["normal"] + i_:r["normal"] + i_ + 1, :] * ni
        g_w += g_dist * (
            m * m * (A_pre + A_suf) + (D2_pre + D2_suf)
            - 2.0 * m * (D1_pre + D1_suf)
        )

        gww = g_w * w
        sgw_inc = _cumsum_sublane(gww, CHUNK, exclusive=False, reverse=True)
        S_gw = suf[3:4, :] + sgw_inc - gww

        g_a = jnp.where(
            contrib,
            g_w * T_bef - (S_gw + g_trans * T_fin) / om,
            0.0,
        )

        # dL/dz (expected depth + distortion/moments through m)
        g_m = (g_dist * 2.0 * (m * (A_pre + A_suf) - (D1_pre + D1_suf)) * w
               + (g_d1 + 2.0 * g_d2 * m) * w)
        g_z = w * g_depth + g_m * _dmap_dz(z)

        # chain into splat geometry
        opac = _col32(d, _C_OPAC)
        g_G = g_a * opac * clampm
        g_opac_px = g_a * G * clampm
        g_rho = -0.5 * G * g_G
        if mode == "gauss3d":
            # conic/center/depth chain (rho = a dx^2 + c dy^2 + 2b dx dy,
            # dx = cx - px); z is the constant per-splat view depth @ col 3
            ca, cb, cc = _col32(d, 0), _col32(d, 1), _col32(d, 2)
            red = lambda x_: jnp.sum(x_, axis=1, keepdims=True)  # (S, 1)
            cols = [
                red(g_rho * dx * dx),          # d/d conic_a
                red(2.0 * g_rho * dx * dy),    # d/d conic_b
                red(g_rho * dy * dy),          # d/d conic_c
                red(g_z),                      # d/d depth (col 3)
                jnp.zeros((CHUNK, 5), jnp.float32),
                red(g_rho * (2.0 * ca * dx + 2.0 * cb * dy)),  # d/d cx
                red(g_rho * (2.0 * cc * dy + 2.0 * cb * dx)),  # d/d cy
                red(g_opac_px),
                jnp.zeros((CHUNK, 3), jnp.float32),            # normal cols
            ]
            cols += [red(g_ref[i_:i_ + 1, :] * w) for i_ in range(C)]
            ncols = 15 + C
            if emit_wet:
                # forward-exact per-pair wet at WET_COL (w already carries
                # the bwd rank gate; add the forward's per-pixel cutoff)
                wet_p = red(jnp.where(T_bef * om >= T_CUTOFF, w, 0.0))
                cols.append(jnp.zeros((CHUNK, WET_COL - ncols), jnp.float32))
                cols.append(wet_p)
                cols.append(jnp.zeros((CHUNK, DPAD - WET_COL - 1),
                                      jnp.float32))
            else:
                cols.append(jnp.zeros((CHUNK, DPAD - ncols), jnp.float32))
            gp_vmem[...] = jnp.concatenate(cols, axis=1)

            gw_dma = pltpu.make_async_copy(
                gp_vmem, gpair_ref.at[pl.ds(off, CHUNK), :], sem_g
            )
            gw_dma.start()
            gw_dma.wait()

            # update carries
            suf[0:1, :] += jnp.sum(w, axis=0, keepdims=True)
            suf[1:2, :] += jnp.sum(wm, axis=0, keepdims=True)
            suf[2:3, :] += jnp.sum(wm2, axis=0, keepdims=True)
            suf[3:4, :] += jnp.sum(gww, axis=0, keepdims=True)
            tcur[...] = tcur[...] * jnp.exp(
                -jnp.sum(log_om, axis=0, keepdims=True))
            return 0
        b3f = b3.astype(jnp.float32) * contrib.astype(jnp.float32)
        b2f = (1.0 - b3.astype(jnp.float32)) * contrib.astype(jnp.float32)
        g_u = b3f * (2.0 * u * g_rho + g_z * t20)
        g_v = b3f * (2.0 * v * g_rho + g_z * t21)
        g_t20 = g_z * u * b3f
        g_t21 = g_z * v * b3f
        g_t22 = g_z * contrib.astype(jnp.float32)
        g_qx = g_u / qz
        g_qy = g_v / qz
        g_qzz = -(u * g_u + v * g_v) / qz
        # q = k x l  =>  g_k = l x g_q ; g_l = g_q x k
        col = lambda i_: _col32(d, i_)
        t00, t01, t02 = col(0), col(1), col(2)
        t10, t11, t12 = col(3), col(4), col(5)
        t20c, t21c, t22c = col(6), col(7), col(8)
        kx = t00 - px * t20c
        ky = t01 - px * t21c
        kz = t02 - px * t22c
        lx = t10 - py * t20c
        ly = t11 - py * t21c
        lz = t12 - py * t22c
        g_kx = ly * g_qzz - lz * g_qy
        g_ky = lz * g_qx - lx * g_qzz
        g_kz = lx * g_qy - ly * g_qx
        g_lx = g_qy * kz - g_qzz * ky
        g_ly = g_qzz * kx - g_qx * kz
        g_lz = g_qx * ky - g_qy * kx

        g_T0 = (g_kx, g_ky, g_kz)
        g_T1 = (g_lx, g_ly, g_lz)
        g_T2 = (
            -px * g_kx - py * g_lx + g_t20,
            -px * g_ky - py * g_ly + g_t21,
            -px * g_kz - py * g_lz + g_t22,
        )
        g_cx = g_rho * b2f * 2.0 * FILTER_INV_SQUARE * dx
        g_cy = g_rho * b2f * 2.0 * FILTER_INV_SQUARE * dy

        # reduce over pixels -> per-pair grads, pack into DPAD layout
        red = lambda x_: jnp.sum(x_, axis=1, keepdims=True)  # (S, 1)
        cols = [red(gt) for gt in g_T0 + g_T1 + g_T2]  # 9 tmat grads
        cols += [red(g_cx), red(g_cy), red(g_opac_px)]
        cols += [
            red(g_ref[r["normal"] + i_:r["normal"] + i_ + 1, :] * w)
            for i_ in range(3)
        ]
        cols += [red(g_ref[i_:i_ + 1, :] * w) for i_ in range(C)]
        if emit_wet:
            wet_p = red(jnp.where(T_bef * om >= T_CUTOFF, w, 0.0))
            cols.append(jnp.zeros((CHUNK, WET_COL - len(cols)), jnp.float32))
            cols.append(wet_p)
            cols.append(jnp.zeros((CHUNK, DPAD - WET_COL - 1), jnp.float32))
        else:
            cols.append(jnp.zeros((CHUNK, DPAD - len(cols)), jnp.float32))
        gp_vmem[...] = jnp.concatenate(cols, axis=1)

        gw_dma = pltpu.make_async_copy(
            gp_vmem, gpair_ref.at[pl.ds(off, CHUNK), :], sem_g
        )
        gw_dma.start()
        gw_dma.wait()

        # update carries
        suf[0:1, :] += jnp.sum(w, axis=0, keepdims=True)
        suf[1:2, :] += jnp.sum(wm, axis=0, keepdims=True)
        suf[2:3, :] += jnp.sum(wm2, axis=0, keepdims=True)
        suf[3:4, :] += jnp.sum(gww, axis=0, keepdims=True)
        tcur[...] = tcur[...] * jnp.exp(-jnp.sum(log_om, axis=0, keepdims=True))
        return 0

    jax.lax.fori_loop(0, nchunks_eff, chunk_body, 0)

    # zero the gradient rows of chunks beyond the last contributor
    def zero_body(c, _):
        @pl.when(c >= nchunks_eff)
        def _():
            off = start + c * CHUNK
            gp_vmem[...] = jnp.zeros_like(gp_vmem)
            gz = pltpu.make_async_copy(
                gp_vmem, gpair_ref.at[pl.ds(off, CHUNK), :], sem_g
            )
            gz.start()
            gz.wait()
        return 0

    nchunks = jax.lax.div(end - start, CHUNK)
    jax.lax.fori_loop(0, nchunks, zero_body, 0)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _to_rows(pair_data):
    """Accept either a logical-width f32 pair table or a pre-padded one."""
    assert pair_data.dtype == jnp.float32, pair_data.dtype
    if pair_data.shape[-1] == DPAD:
        return pair_data
    return pack_rows(pair_data[:, :LO])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def blend_tiles(pair_data, tile_bounds, C, tiles_x, interpret,
                mode="surfel", needs=(True, True, True), row_off=None):
    """pair_data (CAP, DPAD) f32 logical, tile_bounds (T+1,) ->
    (tiles (T, FPAD, NPIX), wet (CAP,)). The kernels consume f32 pair rows;
    gradients come back f32 in the same logical layout.

    needs = (need_dist, need_med, need_wet): static switches that strip the
    distortion prefix sums / median-depth tracking / per-pair wet writes
    from the forward kernel for pure-render calls (~25% of the kernel's VPU
    work). Under autodiff the VJP forward forces all three on, so training
    is unaffected; with wet off the wet output is exact zeros."""
    return _blend_fwd_call(_to_rows(pair_data), tile_bounds, C, tiles_x,
                           interpret, mode, needs)


def _blend_fwd_call(pair_data, tile_bounds, C, tiles_x, interpret,
                    mode="surfel", needs=(True, True, True), aligned=True,
                    skip_dma=True, row_off=None):
    need_dist, need_med, need_wet = needs
    assert aligned or not need_wet, (
        "wet rows require the chunk-aligned pair layout")
    if row_off is None:
        row_off = jnp.zeros((), jnp.int32)
    roff = jnp.asarray(row_off, jnp.int32).reshape(1)
    cap = pair_data.shape[0]
    num_tiles = tile_bounds.shape[0] - 1
    FPAD = _fpad(C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(
                (1, FPAD, NPIX), lambda t, b, r: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, DPAD), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((1, NPIX), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((3,), jnp.int32),
        ],
    )

    def kernel(bounds_ref, roff_ref, pair_ref, out_ref, wet_ref, pair_vmem,
               wet_vmem, tcur, sem_p, sem_w, issued):
        _fwd_kernel(C, tiles_x, bounds_ref, roff_ref, pair_ref,
                    out_ref.at[0], wet_ref, pair_vmem, wet_vmem, tcur,
                    sem_p, sem_w, issued, mode,
                    need_dist, need_med, need_wet, aligned,
                    skip_dma=skip_dma)

    tiles_out, wet = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, FPAD, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((-(-cap // CHUNK), 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_bounds, roff, pair_data)
    if not need_wet:  # buffer never written; replace with exact zeros
        return tiles_out, jnp.zeros((cap,), jnp.float32)
    return tiles_out, wet[:, :CHUNK].reshape(cap)


def _blend_fwd(pair_data, tile_bounds, C, tiles_x, interpret,
               mode="surfel", needs=(True, True, True)):
    del needs  # training path computes everything (bwd reads d1/d2/last/wet)
    pairs = _to_rows(pair_data)
    out = _blend_fwd_call(pairs, tile_bounds, C, tiles_x, interpret, mode)
    return out, (pairs, tile_bounds, out[0])


def _blend_bwd(C, tiles_x, interpret, mode, needs, residuals, cotangents,
               emit_wet=False):
    del needs  # forward-for-vjp ran with everything on
    pair_data, tile_bounds, row_off, tiles_out = residuals
    pair_data = _to_rows(pair_data)
    g_tiles, _g_wet = cotangents  # wet is treated as non-differentiable
    if row_off is None:
        row_off = jnp.zeros((), jnp.int32)
    roff = jnp.asarray(row_off, jnp.int32).reshape(1)
    cap = pair_data.shape[0]
    num_tiles = tile_bounds.shape[0] - 1
    FPAD = _fpad(C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, FPAD, NPIX), lambda t, b, r: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, FPAD, NPIX), lambda t, b, r: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, DPAD), jnp.float32),
            pltpu.VMEM((CHUNK, DPAD), jnp.float32),
            pltpu.VMEM((1, NPIX), jnp.float32),
            pltpu.VMEM((4, NPIX), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def kernel(bounds_ref, roff_ref, pair_ref, res_ref, g_ref, gpair_ref,
               pair_vmem, gp_vmem, tcur, suf, sem_p, sem_g):
        _bwd_kernel(C, tiles_x, bounds_ref, roff_ref, pair_ref,
                    res_ref.at[0], g_ref.at[0], gpair_ref, pair_vmem,
                    gp_vmem, tcur, suf, sem_p, sem_g, mode,
                    emit_wet=emit_wet)

    g_pair = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((cap, DPAD), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_bounds, roff, pair_data, tiles_out, g_tiles)[0]
    return g_pair, None, None


blend_tiles.defvjp(_blend_fwd, _blend_bwd)


# ---------------------------------------------------------------------------
# Fused pair gather + blend (the production path)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def gather_blend_tiles(packed, gauss_idx, tile_bounds, pre_idx, seg_starts,
                       seg_counts, wet_zero, row_off, C, tiles_x, interpret,
                       mode="surfel", needs=(True, True, True), aligned=True,
                       pre_cap=0):
    """packed (S, <=LO) f32 logical table, gauss_idx (CAP,) with sentinel
    S-1 -> (tiles (T, FPAD, NPIX), wet (CAP,)).

    pre_idx/seg_starts/seg_counts/pre_cap: the binning pre-sort run layout
    (BinnedPairs) consumed ONLY by the backward's sort-free pair-grad
    transpose (segsum.presort_transpose); pure-render callers pass dummies.

    wet_zero (S,) zeros: the means2d_zero trick applied to per-splat wet —
    its COTANGENT is the per-splat accumulated blend weight, recomputed by
    the backward kernel into grad lane WET_COL and summed by the same
    presort transpose as every other pair gradient. Training reads wet from
    d(loss)/d(wet_zero) instead of a forward output, stripping the forward
    kernel's per-pair wet writes and the duplicate-index segment_sum they
    fed (~22 ms/step at sedan scale). The primal ignores it.

    Fusing the per-pair row gather with the blend keeps the gather on
    XLA's fast row-gather path (issue-rate bound, so the f32 rows are
    free); the backward runs the blend's reverse kernel to per-pair f32
    logical gradients and transposes the gather with the segmented-sum
    scan (ops/segsum.gather_transpose)."""
    del wet_zero
    # barriers: keep the pair-row gather on the fast gather path (fusing
    # the row-pad producer or downstream consumers into the gather
    # lowers it to a pathological loop — scripts/tpu_micro_culltail.py)
    packedp = jax.lax.optimization_barrier(pack_rows(packed))
    pairs = jax.lax.optimization_barrier(packedp[gauss_idx])
    return _blend_fwd_call(pairs, tile_bounds, C, tiles_x, interpret, mode,
                           needs, aligned, skip_dma=True, row_off=row_off)


def _gbt_fwd(packed, gauss_idx, tile_bounds, pre_idx, seg_starts, seg_counts,
             wet_zero, row_off, C, tiles_x, interpret,
             mode="surfel", needs=(True, True, True), aligned=True,
             pre_cap=0):
    del wet_zero
    # the backward reads d1/d2/last (need_dist) but not med; wet arrives
    # through the gradient lane, so honor the caller's med/wet strips
    needs = (True, needs[1], needs[2])
    assert aligned, "autodiff requires the chunk-aligned (training) layout"
    packedp = jax.lax.optimization_barrier(pack_rows(packed))
    pairs = jax.lax.optimization_barrier(packedp[gauss_idx])
    out = _blend_fwd_call(pairs, tile_bounds, C, tiles_x, interpret, mode,
                          needs, row_off=row_off)
    return out, (pairs, tile_bounds, row_off, pre_idx, seg_starts,
                 seg_counts, out[0], packed.shape)


def _gbt_bwd(C, tiles_x, interpret, mode, needs, aligned, pre_cap, residuals,
             cotangents):
    del aligned  # asserted True in _gbt_fwd
    (pairs, tile_bounds, row_off, pre_idx, seg_starts, seg_counts,
     tiles_out, pshape) = residuals
    g_pair = _blend_bwd(C, tiles_x, interpret, mode, needs,
                        (pairs, tile_bounds, row_off, tiles_out),
                        cotangents, emit_wet=True)[0]
    from envgs_tpu.ops.segsum import presort_transpose

    g_packed = presort_transpose(g_pair, pre_idx, seg_starts, seg_counts,
                                 pre_cap, pshape[0], pshape[1])
    # per-splat wet rides lane WET_COL of the transposed grads; the packed
    # table's pad-VJP slices it off the packed cotangent downstream
    g_wet = g_packed[:, WET_COL]
    return g_packed, None, None, None, None, None, g_wet, None


gather_blend_tiles.defvjp(_gbt_fwd, _gbt_bwd)
