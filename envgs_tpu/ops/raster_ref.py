"""Reference 2D-Gaussian-surfel rasterizer in pure JAX (slow, exact).

Semantics ground truth for the production Pallas rasterizer — a depth-sorted
scan over all splats with full-image accumulators, replicating the reference
CUDA pipeline's per-pixel blend loop and `allmap` channel contract
(/root/reference/easyvolcap/utils/gaussian2d_utils.py:1090-1144):

  rgb      = sum_i w_i c_i + T_final * bg          (C channels, C in {3,5,7})
  depth_e  = sum_i w_i z_i                         (expected depth, premult.)
  alpha    = sum_i w_i
  normal   = sum_i w_i n_i                         (view space, unnormalized)
  depth_m  = z of last contributor with T > 0.5    (median depth)
  dist     = 2DGS per-pixel depth distortion accumulator
  wet      = per-splat sum over pixels of w_i      ("weight_accumulate")

with w_i = alpha_i * T_i, T_{i+1} = T_i (1 - alpha_i), alpha_i =
min(0.99, o_i G_i), skipping alpha < 1/255 and stopping at T < 1e-4.

Autodiff works end-to-end (used for grad parity checks of the Pallas VJP).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.ops.common import (
    ALPHA_MAX,
    ALPHA_MIN,
    T_CUTOFF,
    NEAR_PLANE,
    PreparedSplats,
    map_depth,
    splat_response,
)
from envgs_tpu.utils.camera import Camera


class RasterOutput(NamedTuple):
    rgb: jnp.ndarray  # (H, W, C) includes bg blend
    depth_expected: jnp.ndarray  # (H, W) premultiplied by alpha
    alpha: jnp.ndarray  # (H, W)
    normal: jnp.ndarray  # (H, W, 3) view space, unnormalized
    depth_median: jnp.ndarray  # (H, W)
    distortion: jnp.ndarray  # (H, W)
    wet: jnp.ndarray  # (P,) per-splat accumulated blend weight
    radii: jnp.ndarray  # (P,) screen radii (0 = culled)
    trans: jnp.ndarray  # (H, W) final transmittance
    num_pairs: jnp.ndarray | None = None  # () requested (splat, tile) pairs
    #   BEFORE the pair_cap clamp — overflow (num_pairs > pair_cap) means
    #   deterministic far-splat drops; surfaced in train stats (None on the
    #   oracle path, which has no pair budget)
    # distortion accumulators Σ w·m and Σ w·m² (m = mapped depth): consumed
    # by splat-slab model parallelism, whose cross-slab distortion term is
    # the closed form T_lo·(α_lo·D2_hi + D2_lo·α_hi − 2·D1_lo·D1_hi)
    # (parallel/splat_sharding.py); None on paths that never compose
    d1: jnp.ndarray | None = None  # (H, W)
    d2: jnp.ndarray | None = None  # (H, W)


def rasterize_reference(
    prep: PreparedSplats, cam: Camera, bg_color: jnp.ndarray
) -> RasterOutput:
    """Rasterize prepared splats. O(P * H * W) — use on small scenes only."""
    P = prep.depth.shape[0]
    H, W = cam.H, cam.W
    C = prep.color.shape[-1]

    # Global depth sort (the CUDA pipeline sorts per tile by center depth;
    # a global order gives the identical per-pixel sequence).
    order = jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf))
    tmat = prep.tmat[order]
    center = prep.center_pix[order]
    normal = prep.normal[order]
    color = prep.color[order]
    opac = prep.opacity[order]
    valid = prep.valid[order]
    ext = prep.ext[order]

    jj, ii = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32)
    )
    px, py = jj, ii  # pixel sample positions on integer coords

    tile = 16  # tile-membership culling granularity (matches the tile kernel:
    # a splat is evaluated at every pixel of every tile its AABB overlaps,
    # and rejected only by the alpha floor — CUDA-pipeline semantics)
    tpx = jnp.floor(px / tile)
    tpy = jnp.floor(py / tile)
    ntx = -(-W // tile)
    nty = -(-H // tile)

    def body(carry, xs):
        T, done, acc_rgb, acc_d, acc_a, acc_n, med, dist, d1, d2 = carry
        tm, ce, nr, co, op, va, ex = xs
        G, z = splat_response(tm, ce, px, py)
        x0 = jnp.clip(jnp.floor((ce[0] - ex[0]) / tile), 0, ntx - 1)
        x1 = jnp.clip(jnp.floor((ce[0] + ex[0]) / tile), 0, ntx - 1)
        y0 = jnp.clip(jnp.floor((ce[1] - ex[1]) / tile), 0, nty - 1)
        y1 = jnp.clip(jnp.floor((ce[1] + ex[1]) / tile), 0, nty - 1)
        inside = (tpx >= x0) & (tpx <= x1) & (tpy >= y0) & (tpy <= y1)
        alpha = jnp.minimum(ALPHA_MAX, op * G)
        live = va & inside & (alpha >= ALPHA_MIN) & (z >= NEAR_PLANE) & (~done)
        test_T = T * (1.0 - alpha)
        kill = live & (test_T < T_CUTOFF)
        done = done | kill
        contrib = live & (~kill)
        w = jnp.where(contrib, alpha * T, 0.0)
        m = map_depth(z)
        # 2DGS distortion: error_i = m_i^2 A + D2 - 2 m_i D1 before update
        dist = dist + w * (m * m * acc_a + d2 - 2.0 * m * d1)
        d1 = d1 + w * m
        d2 = d2 + w * m * m
        acc_rgb = acc_rgb + w[..., None] * co
        acc_d = acc_d + w * z
        acc_a = acc_a + w
        acc_n = acc_n + w[..., None] * nr
        med = jnp.where(contrib & (T > 0.5), z, med)
        T = jnp.where(contrib, test_T, T)
        return (T, done, acc_rgb, acc_d, acc_a, acc_n, med, dist, d1, d2), jnp.sum(w)

    init = (
        jnp.ones((H, W), jnp.float32),
        jnp.zeros((H, W), bool),
        jnp.zeros((H, W, C), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
        jnp.zeros((H, W, 3), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
    )
    xs = (tmat, center, normal, color, opac, valid, ext)
    (T, done, acc_rgb, acc_d, acc_a, acc_n, med, dist, d1, d2), wet_sorted = (
        jax.lax.scan(body, init, xs)
    )

    # Un-sort the per-splat weights back to pool order
    wet = jnp.zeros((P,), jnp.float32).at[order].set(wet_sorted)

    bg = jnp.zeros((C,), jnp.float32).at[: bg_color.shape[0]].set(bg_color)
    rgb = acc_rgb + T[..., None] * bg[None, None, :]
    return RasterOutput(
        rgb=rgb,
        depth_expected=acc_d,
        alpha=acc_a,
        normal=acc_n,
        depth_median=med,
        distortion=dist,
        wet=wet,
        radii=prep.radius,
        trans=T,
        d1=d1,
        d2=d2,
    )
