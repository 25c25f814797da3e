"""Splat-slab model parallelism: shard the PAIR PIPELINE over a mesh axis.

Band parallelism (parallel/sharding.py) splits pixels; this splits the
SPLATS. Each frame, the pool is partitioned into depth-rank SLABS by the
exact key the rasterizer's binning sorts by (front-to-back splat depth,
ties by index), each device rasterizes only its slab over the FULL image,
and the per-slab accumulators are composed across the axis in slab order.

Why this is exact: front-to-back alpha blending is associative in the
premultiplied form — for any contiguous split of the blend order into
(lo, hi):

    rgb  = rgb_lo + T_lo * rgb_hi          (likewise depth_e, normal, α)
    T    = T_lo * T_hi
    dist = dist_lo + T_lo² * dist_hi
         + T_lo * (α_lo * D2_hi + D2_lo * α_hi − 2 * D1_lo * D1_hi)

where D1/D2 are the blend kernels' running Σw·m / Σw·m² distortion
moments (RasterOutput.d1/d2) — the cross-slab distortion term is closed
form, so even the 2DGS distortion loss composes exactly. Two outputs are
approximate under slabs:

- median depth (a threshold crossing, non-associative): approximated by
  the expected depth — the same stand-in the traced base path uses;
  exact for every shipped EnvGS config (depth_ratio == 0).
- per-splat wet (densification stat): slab k's kernel runs with local
  transmittance starting at 1, so its splats' wet ignores occlusion by
  nearer slabs — an UPPER BOUND on the true wet, exact for slab 0 and
  for any pixel nearer slabs leave transparent. Image outputs and all
  parameter gradients are unaffected (the composition chain rule scales
  each slab's cotangents by the per-pixel T_prefix automatically). An
  exact-wet variant exists if ever needed: blend wet_zero as a fictitious
  emission channel and read Σ(probe map)'s gradient — the probe composes
  like rgb, so its cotangent carries T_prefix per pixel.

What this buys at scale (SURVEY §5.7 big-axis scaling): the pair pipeline
— binning sort, 256-byte pair rows, blend kernels, pair-grad transpose,
the actual HBM hog at ~2 GB for a 2M-pair cap — shrinks by the axis size
per device (each slab runs at pair_cap / D), while parameter gradients
come back through shard_map's transpose psum exactly like band
parallelism. Composing with a ('band', 'splat') 2-D mesh splits pixels AND
splats. Pool parameters stay replicated (they are ~100 MB; the pair
buffers are what outgrows a chip).

Reference contract being scaled: the single-GPU CUDA rasterizer feeding
DDP (easyvolcap/utils/gaussian2d_utils.py:1090-1144) — the reference has
no model-parallel axis at all.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from envgs_tpu.models import gaussians as G
from envgs_tpu.models.envgs import (
    EnvGSConfig,
    EnvGSOutput,
    _pool_colors,
    _pool_colors_at,
    reflect_rays,
)
from envgs_tpu.ops import tracer
from envgs_tpu.ops.common import prepare_splats
from envgs_tpu.ops.raster import RasterOutput, rasterize, render_decode
from envgs_tpu.ops.tracer_ref import TraceOutput, prepare_trace_scene
from envgs_tpu.utils.camera import Camera


def slab_assignment(depth: jnp.ndarray, valid: jnp.ndarray,
                    n_slabs: int) -> jnp.ndarray:
    """(P,) slab index per splat by GLOBAL depth rank.

    Uses the binning sort's exact key (depth, invalid→inf; argsort ties by
    index), so the union of slab-local blend orders IS the single-chip
    blend order — composition is order-exact, not approximate."""
    P_ = depth.shape[0]
    key = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(key)  # rank -> splat
    quota = -(-P_ // n_slabs)
    slab_of_rank = jnp.arange(P_, dtype=jnp.int32) // quota
    return (
        jnp.zeros((P_,), jnp.int32).at[order].set(
            slab_of_rank, unique_indices=True)
    )


def compose_slabs(parts: RasterOutput, bg_color: jnp.ndarray,
                  C: int) -> RasterOutput:
    """Fold (D, ...) stacked per-slab raster outputs in slab order.

    parts must come from rasterize() calls with bg=0 (premultiplied rgb).
    Per-splat fields (wet/radii) are disjoint across slabs -> summed."""
    D = parts.trans.shape[0]
    rgb, dpt, alpha = parts.rgb[0], parts.depth_expected[0], parts.alpha[0]
    nrm, dist, T = parts.normal[0], parts.distortion[0], parts.trans[0]
    d1, d2 = parts.d1[0], parts.d2[0]
    for k in range(1, D):
        rgb = rgb + T[..., None] * parts.rgb[k]
        dpt = dpt + T * parts.depth_expected[k]
        nrm = nrm + T[..., None] * parts.normal[k]
        dist = (dist + T * T * parts.distortion[k]
                + T * (alpha * parts.d2[k] + d2 * parts.alpha[k]
                       - 2.0 * d1 * parts.d1[k]))
        d1 = d1 + T * parts.d1[k]
        d2 = d2 + T * parts.d2[k]
        alpha = alpha + T * parts.alpha[k]
        T = T * parts.trans[k]
    rgb = rgb + T[..., None] * jnp.zeros((C,)).at[: bg_color.shape[0]].set(
        bg_color)[None, None, :]
    return RasterOutput(
        rgb=rgb,
        depth_expected=dpt,
        alpha=alpha,
        normal=nrm,
        # median depth is a threshold crossing (non-associative); use the
        # expected-depth stand-in like the traced base path — exact for
        # depth_ratio == 0 (every shipped EnvGS config)
        depth_median=jax.lax.stop_gradient(
            jnp.where(alpha > 1e-8, dpt / jnp.maximum(alpha, 1e-8), 0.0)),
        distortion=dist,
        wet=jnp.sum(parts.wet, axis=0),
        radii=jnp.max(parts.radii, axis=0),
        trans=T,
        num_pairs=(jnp.sum(parts.num_pairs, axis=0)
                   if parts.num_pairs is not None else None),
        d1=d1,
        d2=d2,
    )


def make_splat_sharded_render_base(
    mesh: Mesh,
    cam: Camera,
    cfg: EnvGSConfig,
    axis: str = "splat",
    slab_pair_cap: int | None = None,
):
    """Jitted base-pass render with the pair pipeline sharded over `axis`.

    Returns fn(pool) -> decoded RenderOutput identical (to blend-order
    float tolerance) to models.envgs.render_base on one device. Each
    device's rasterize runs at slab_pair_cap (default pair_cap / D)."""
    D = mesh.shape[axis]
    cap = slab_pair_cap or max(cfg.pair_cap // D, 1 << 12)
    train = not cfg.render_mode
    needs = (train, False, train)

    def device_fn(params, stats, slab, max_sh):
        idx = jax.lax.axis_index(axis)
        pool = G.GaussianPool(params, stats, max_sh)
        colors = _pool_colors(pool, cam.center)
        if cfg.render_reflection:
            colors = jnp.concatenate(
                [colors, pool.get_specular, pool.get_roughness], axis=-1)
        prep = prepare_splats(
            pool.params.xyz, pool.params.rotation, pool.get_scaling,
            pool.get_opacity[:, 0], colors, cam,
            scale_modifier=cfg.scale_modifier,
            active=pool.stats.active & (slab == idx),
        )
        out = rasterize(prep, cam, jnp.zeros(3),
                        backend=cfg.raster_backend, pair_cap=cap,
                        needs=needs)
        # radii: slab-masked prep zeroes foreign splats' radii, and slabs
        # partition the active set, so the max-compose over slabs
        # reconstructs the full pool's radii exactly
        return jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, axis), out)

    def render(pool: G.GaussianPool):
        # slab partition uses the binning sort's key: view depth of valid
        # in-frustum splats (computed once, replicated)
        pre = prepare_splats(
            pool.params.xyz, pool.params.rotation, pool.get_scaling,
            pool.get_opacity[:, 0],
            jnp.zeros((pool.cap, 3)), cam,
            scale_modifier=cfg.scale_modifier, active=pool.stats.active,
        )
        slab = slab_assignment(pre.depth, pre.valid, D)

        def dev(params, stats, slab_):
            return device_fn(params, stats, slab_, pool.max_sh_degree)

        parts = jax.shard_map(
            dev, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
            check_vma=False,
        )(pool.params, pool.stats, slab)
        bg = jnp.full((3,), cfg.bg_brightness, jnp.float32)
        C = 3 + (cfg.specular_channels + 1 if cfg.render_reflection else 0)
        composed = compose_slabs(parts, bg, C)
        return render_decode(
            composed, cam,
            specular_channels=(cfg.specular_channels
                               if cfg.render_reflection else 0),
            depth_ratio=cfg.depth_ratio,
        )

    return jax.jit(render)
