"""Public differentiable 3DGS (EWA) rasterizer API.

The 3DGS counterpart of `ops/raster.py` — the model family served by
`diff_gauss` in the reference (`GaussianTSampler.render_gaussians`,
/root/reference/easyvolcap/models/samplers/gaussiant_sampler.py:173-280).
Backends:

- 'ref': pure-JAX O(P*HW) oracle (`ops/raster3d_ref.py`);
- 'pallas': the shared binning + tile blend kernels in mode="gauss3d"
  (`ops/raster_pallas.py`) — conic evaluation instead of ray-plane
  intersection, same front-to-back blend/cutoff semantics;
- 'pallas_interp': interpreter mode (CPU tests).

Screen-space position gradients for densification (the reference's
screenspace_points trick) come back through `means2d_zero`, which shifts
the projected center.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from envgs_tpu.ops import raster_pallas as rp
from envgs_tpu.ops.binning import bin_splats, tile_dims
from envgs_tpu.ops.raster3d_ref import (
    Prepared3DSplats,
    Raster3DOutput,
    prepare_splats3d,
    rasterize3d_reference,
)
from envgs_tpu.utils.camera import Camera


def _pack_table3d(prep: Prepared3DSplats,
                  order: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-splat logical packed table (P+1, LO) f32; last row = sentinel 0.

    gauss3d pair layout (raster_pallas._splat_pixel_terms mode="gauss3d"):
    conic(a,b,c) @ 0-2, view depth @ 3, zeros @ 4-8, center @ 9-10,
    opacity @ 11, zeros (normal cols) @ 12-14, colors @ 15+.
    """
    P = prep.depth.shape[0]
    zeros5 = jnp.zeros((P, 5), jnp.float32)
    zeros3 = jnp.zeros((P, 3), jnp.float32)
    packed = jnp.concatenate(
        [
            prep.conic,
            prep.depth[:, None],
            zeros5,
            prep.center_pix,
            prep.opacity[:, None] * prep.valid[:, None],
            zeros3,
            prep.color,
        ],
        axis=1,
    )
    if order is not None:
        packed = packed[order]
    return jnp.pad(packed, ((0, 1), (0, rp.LO - packed.shape[1])))


def rasterize3d(
    prep: Prepared3DSplats,
    cam: Camera,
    bg_color: jnp.ndarray,
    backend: str = "pallas",
    pair_cap: int = 2 ** 21,
    means2d_zero: jnp.ndarray | None = None,
) -> Raster3DOutput:
    """Rasterize prepared 3D Gaussians (diff_gauss output contract:
    rgb / expected depth / alpha / per-splat wet / radii)."""
    if means2d_zero is not None:
        prep = prep._replace(center_pix=prep.center_pix + means2d_zero)
    if backend == "ref":
        return rasterize3d_reference(prep, cam, bg_color)
    interpret = backend == "pallas_interp"

    C = prep.color.shape[-1]
    H, W = cam.H, cam.W
    Hp = -(-H // rp.TILE) * rp.TILE
    Wp = -(-W // rp.TILE) * rp.TILE
    tiles_x, tiles_y = tile_dims(Hp, Wp, rp.TILE)

    # bin_splats consumes (center_pix, depth, radius, valid) — shared with
    # the surfel pipeline by structural typing
    bins = bin_splats(prep, H, W, rp.TILE, pair_cap, align=rp.CHUNK,
                      interpret=interpret)
    packed = _pack_table3d(prep, bins.order)
    tiles_out, wet_pairs = rp.gather_blend_tiles(
        packed, bins.gauss_idx, bins.tile_bounds, bins.pre_idx,
        bins.seg_starts, bins.seg_counts,
        jnp.zeros((packed.shape[0],), jnp.float32),
        jnp.zeros((), jnp.int32), C, tiles_x, interpret,
        "gauss3d", (True, True, True), True, bins.pre_cap,
    )

    r = rp._rows(C)
    FPAD = tiles_out.shape[1]
    img = tiles_out.reshape(tiles_y, tiles_x, FPAD, rp.TILE, rp.TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(FPAD, Hp, Wp)[:, :H, :W]

    trans = img[r["trans"]]
    bg = jnp.zeros((C,), jnp.float32).at[: bg_color.shape[0]].set(bg_color)
    rgb = img[:C].transpose(1, 2, 0) + trans[..., None] * bg[None, None, :]

    P = prep.depth.shape[0]
    wet_sorted = jax.ops.segment_sum(
        jax.lax.stop_gradient(wet_pairs),
        bins.gauss_idx,
        num_segments=P + 1,
    )[:P]
    wet = jnp.zeros((P,), jnp.float32).at[bins.order].set(wet_sorted)

    return Raster3DOutput(
        rgb=rgb,
        depth=img[r["depth"]],
        alpha=img[r["alpha"]],
        wet=wet,
        radii=prep.radius,
        trans=trans,
    )


def render_gaussians3d(
    means3d: jnp.ndarray,
    quats: jnp.ndarray,
    scales3: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    cam: Camera,
    bg_color: jnp.ndarray | float = 0.0,
    backend: str = "pallas",
    pair_cap: int = 2 ** 21,
    scale_modifier: float = 1.0,
    active: jnp.ndarray | None = None,
    means2d_zero: jnp.ndarray | None = None,
    filter3d: jnp.ndarray | None = None,
    mip: bool = False,
) -> Raster3DOutput:
    """One-call 3DGS render (prepare + rasterize).

    mip=True enables the mip-splatting anti-aliasing pipeline
    (diff_mip_rasterization parity): the 3D smoothing filter (pass
    `filter3d` from `compute_filter3d`) plus the 0.1-dilation 2D mip
    filter with opacity compensation."""
    prep = prepare_splats3d(
        means3d, quats, scales3, opacities, colors, cam, scale_modifier,
        active, filter3d=filter3d,
        lowpass2d=0.1 if mip else 0.3, compensate2d=mip,
    )
    bg = jnp.broadcast_to(jnp.asarray(bg_color, jnp.float32),
                          (colors.shape[-1],))
    return rasterize3d(prep, cam, bg, backend, pair_cap, means2d_zero)
