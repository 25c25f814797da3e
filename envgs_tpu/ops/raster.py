"""Public differentiable rasterizer API.

`rasterize()` mirrors the reference render() wrapper's channel semantics
(/root/reference/easyvolcap/utils/gaussian2d_utils.py:1003-1155) with three
backends:

- 'ref': the pure-JAX O(P*HW) scan rasterizer (ground truth, small scenes);
- 'pallas': binning + fused Pallas tile kernels (production TPU path);
- 'pallas_interp': same kernels in interpreter mode (CPU tests).

Screen-space position gradients for densification (the reference's
screenspace_points zero-tensor trick, gaussian2d_utils.py:1017-1020) are
exposed by the `means2d_zero` argument: a (P, 2) zeros array whose cotangent
is the exact d(loss)/d(pixel-space splat translation). Internally it shifts
the splat's screen transform rows: T0 += zx*T2, T1 += zy*T2.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.ops import raster_pallas as rp
from envgs_tpu.ops.binning import bin_splats, tile_dims
from envgs_tpu.ops.common import (
    ROWCULL_LOWPASS_R,
    PreparedSplats,
    prepare_splats,
)
from envgs_tpu.ops.raster_ref import RasterOutput, rasterize_reference
from envgs_tpu.ops.segsum import gather_rows
from envgs_tpu.utils.camera import Camera


def _shift_tmat(prep: PreparedSplats, means2d_zero: jnp.ndarray) -> PreparedSplats:
    """Shift splats on screen by means2d_zero pixels (zero in practice)."""
    if means2d_zero is None:
        return prep
    z = means2d_zero
    t = prep.tmat
    row2 = t[:, 2, :]
    t = t.at[:, 0, :].add(z[:, 0:1] * row2)
    t = t.at[:, 1, :].add(z[:, 1:2] * row2)
    c = prep.center_pix + z
    return prep._replace(tmat=t, center_pix=c)


def _pack_table(prep: PreparedSplats,
                order: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-splat logical packed table (P+1, LO) f32; last row = sentinel 0.

    With `order`, the table is permuted once to the depth-sorted splat order
    (binning contract) so the per-pair gather needs no extra indirection."""
    P = prep.depth.shape[0]
    packed = jnp.concatenate(
        [
            prep.tmat.reshape(P, 9),
            prep.center_pix,
            prep.opacity[:, None] * prep.valid[:, None],
            prep.normal,
            prep.color,
        ],
        axis=1,
    )
    if order is not None:
        # permutation-aware gather: the VJP transposes via the inverse
        # permutation (a row gather) instead of a generic scatter-add
        from envgs_tpu.ops.segsum import invert_permutation, permute_rows

        packed = permute_rows(packed, order, invert_permutation(order))
    return jnp.pad(packed, ((0, 1), (0, rp.LO - packed.shape[1])))


def _pack_pairs(prep: PreparedSplats, gauss_idx: jnp.ndarray,
                order: jnp.ndarray | None = None) -> jnp.ndarray:
    """Gather per-pair packed rows (CAP, LO) f32; sentinel index P -> zeros.

    Test/profiling helper — the production path fuses this gather into
    rp.gather_blend_tiles (split-bf16 rows, f32 gradients)."""
    P = prep.depth.shape[0]
    packed = _pack_table(prep, order)
    # custom-VJP gather: the transpose is a segmented-sum scan, NOT a
    # duplicate-index scatter-add (minutes-slow on v5e)
    interp = bool(jax.default_backend() == "cpu")
    return jnp.pad(gather_rows(packed, gauss_idx, P + 1, interp),
                   ((0, 0), (0, rp.DPAD - rp.LO)))


def rasterize(
    prep: PreparedSplats,
    cam: Camera,
    bg_color: jnp.ndarray,
    backend: str = "pallas",
    pair_cap: int = 2 ** 21,
    means2d_zero: jnp.ndarray | None = None,
    needs: tuple = (True, True, True),
    wet_zero: jnp.ndarray | None = None,
    row_window: tuple | None = None,
) -> RasterOutput:
    """Rasterize prepared splats into the reference's raw output maps.

    needs = (need_dist, need_med, need_wet) strips training-only work
    (distortion sums, median depth, per-pair wet + its segment reduction)
    from pure-render calls; autodiff always computes everything.

    wet_zero (P,) zeros: when given, per-splat wet is delivered as
    d(loss)/d(wet_zero) by the blend backward (the means2d_zero trick —
    see rp.gather_blend_tiles) and the forward's wet pipeline is stripped;
    RasterOutput.wet is then exact zeros.

    row_window = (row0 traced pixel-row offset, band_h static): rasterize
    only the horizontal band [row0, row0+band_h) of cam's FULL pixel grid —
    prep/binning floats are the full-camera values and the band selection
    is integer tile arithmetic, so the band output is bit-identical to the
    matching rows of a full render (band-parallel row-crop contract)."""
    if backend == "ref":
        prep = _shift_tmat(prep, means2d_zero)
        return rasterize_reference(prep, cam, bg_color)
    interpret = backend == "pallas_interp"

    prep = _shift_tmat(prep, means2d_zero)
    C = prep.color.shape[-1]
    H, W = cam.H, cam.W
    Hp = -(-H // rp.TILE) * rp.TILE
    Wp = -(-W // rp.TILE) * rp.TILE
    tiles_x, tiles_y = tile_dims(Hp, Wp, rp.TILE)
    if row_window is not None:
        row0, band_h = row_window
        assert band_h % rp.TILE == 0 and Hp == H, (row_window, H)
        ty0 = row0 // rp.TILE
        tiles_y = band_h // rp.TILE
        H_out = band_h
        bin_window = (ty0, tiles_y)
        row_off = row0
    else:
        H_out = H
        bin_window = None
        row_off = jnp.zeros((), jnp.int32)

    # wet rows need the chunk-aligned pair layout; pure-render calls skip
    # the alignment stage entirely (unaligned bounds + kernel tail masking).
    # With wet_zero the gradient lane carries wet, so the forward kernel's
    # wet writes are stripped but the aligned layout stays (the presort
    # transpose requires it).
    grad_wet = wet_zero is not None
    aligned = needs[2] or grad_wet
    fwd_needs = (needs[0], needs[1], needs[2] and not grad_wet)
    bins = bin_splats(prep, H, W, rp.TILE, pair_cap, align=rp.CHUNK,
                      interpret=interpret, lowpass_r=ROWCULL_LOWPASS_R,
                      aligned=aligned, row_window=bin_window)
    packed = _pack_table(prep, bins.order)
    dummy = jnp.zeros((1,), jnp.int32)
    P = prep.depth.shape[0]
    if grad_wet:
        # table rows are depth-permuted; permute the zeros hook the same way
        # so its cotangent lands back in pool order through the same VJP
        # (permute_rows: the transpose is a gather, not a scatter-add)
        from envgs_tpu.ops.segsum import invert_permutation, permute_rows

        wz = jnp.pad(
            permute_rows(wet_zero, bins.order,
                         invert_permutation(bins.order)), (0, 1))
    else:
        wz = jnp.zeros((P + 1,), jnp.float32)
    tiles_out, wet_pairs = rp.gather_blend_tiles(
        packed, bins.gauss_idx, bins.tile_bounds,
        bins.pre_idx if aligned else dummy,
        bins.seg_starts if aligned else dummy,
        bins.seg_counts if aligned else dummy, wz, row_off,
        C, tiles_x, interpret, "surfel", fwd_needs, aligned, bins.pre_cap,
    )

    # decode tile blocks -> images
    r = rp._rows(C)
    FPAD = tiles_out.shape[1]
    img = tiles_out.reshape(tiles_y, tiles_x, FPAD, rp.TILE, rp.TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(
        FPAD, tiles_y * rp.TILE, Wp)[:, :H_out, :W]

    trans = img[r["trans"]]
    bg = jnp.zeros((C,), jnp.float32).at[: bg_color.shape[0]].set(bg_color)
    rgb = img[:C].transpose(1, 2, 0) + trans[..., None] * bg[None, None, :]

    # per-splat accumulated weights (sentinel row dropped); the segment ids
    # are in depth order, so scatter back through the permutation. With
    # wet_zero the gradient lane delivers wet instead (fwd output zeros).
    if fwd_needs[2]:
        wet_sorted = jax.ops.segment_sum(
            jax.lax.stop_gradient(wet_pairs),
            bins.gauss_idx,
            num_segments=P + 1,
        )[:P]
        wet = jnp.zeros((P,), jnp.float32).at[bins.order].set(wet_sorted)
    else:
        wet = jnp.zeros((P,), jnp.float32)

    return RasterOutput(
        rgb=rgb,
        depth_expected=img[r["depth"]],
        alpha=img[r["alpha"]],
        normal=img[r["normal"]:r["normal"] + 3].transpose(1, 2, 0),
        depth_median=jax.lax.stop_gradient(img[r["med"]]),
        distortion=img[r["dist"]],
        wet=wet,
        radii=prep.radius,
        trans=trans,
        num_pairs=bins.num_pairs,
        d1=img[r["d1"]],
        d2=img[r["d2"]],
    )


class RenderOutput(NamedTuple):
    """Decoded render products (reference render() output contract)."""

    rgb: jnp.ndarray  # (H, W, 3)
    specular: jnp.ndarray | None  # (H, W, S)
    roughness: jnp.ndarray | None  # (H, W, 1)
    alpha: jnp.ndarray  # (H, W, 1)
    normal_world: jnp.ndarray  # (H, W, 3) unnormalized, alpha-weighted
    depth_expected: jnp.ndarray  # (H, W, 1) alpha-normalized
    depth_median: jnp.ndarray  # (H, W, 1)
    surf_depth: jnp.ndarray  # (H, W, 1) expected/median blend
    surf_normal: jnp.ndarray  # (H, W, 3) from depth finite differences
    distortion: jnp.ndarray  # (H, W, 1)
    wet: jnp.ndarray  # (P,)
    radii: jnp.ndarray  # (P,)
    visibility: jnp.ndarray  # (P,) bool
    num_pairs: jnp.ndarray | None = None  # () pre-clamp pair count (raster)


def depth_to_normal(cam: Camera, depth: jnp.ndarray,
                    i0=None) -> jnp.ndarray:
    """Pseudo surface normal from a z-depth map (dpt2norm semantics,
    gaussian2d_utils.py:1190-1206): cross of central differences of the
    backprojected point map, zero on the 1px border.

    i0: global row index of depth row 0 (band-parallel halo recompute —
    pass the UNSHIFTED full-image K in `cam` and the band's global row
    offset here, so every pixel ray is bit-identical to the single-chip
    computation; a band-shifted K changes inv(K) rounding and the
    normalized cross product amplifies that noise)."""
    H, W = cam.H, cam.W
    i = jnp.arange(H, dtype=jnp.float32)
    if i0 is not None:
        i = i + i0
    j = jnp.arange(W, dtype=jnp.float32)
    jj, ii = jnp.meshgrid(j, i)
    pix = jnp.stack([jj, ii, jnp.ones_like(ii)], -1)
    Kinv = jnp.linalg.inv(cam.K)
    d_world = (pix @ Kinv.T) @ cam.R  # (H, W, 3)
    xyz = cam.center[None, None] + depth[..., None] * d_world

    dx = xyz[2:, 1:-1] - xyz[:-2, 1:-1]
    dy = xyz[1:-1, 2:] - xyz[1:-1, :-2]
    n = jnp.cross(dx, dy)
    # smooth normalization: flat/empty regions have n=0 and jnp.linalg.norm
    # would emit NaN cotangents there
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-16)
    out = jnp.zeros_like(xyz)
    return out.at[1:-1, 1:-1].set(n)


def render_decode(
    out: RasterOutput,
    cam: Camera,
    specular_channels: int = 0,
    depth_ratio: float = 0.0,
    i0=None,
) -> RenderOutput:
    """Decode raw maps into the reference's post-processed products.

    i0: global pixel-row offset (band row-crop: cam holds the full-image K
    with H = the band height; the depth-derived surface normal then uses
    global pixel rows — band-boundary rows still read the local zero
    border and are replaced by the haloed recompute in the band loss)."""
    C = out.rgb.shape[-1]
    rgb = out.rgb[..., :3]
    spec = rough = None
    if specular_channels:
        spec = out.rgb[..., 3:3 + specular_channels]
        rough = out.rgb[..., 3 + specular_channels:3 + specular_channels + 1]
    alpha = out.alpha[..., None]
    normal_world = out.normal @ cam.R  # view -> world (R^T applied row-form)
    depth_e = jnp.nan_to_num(out.depth_expected / jnp.where(
        out.alpha == 0, 1.0, out.alpha
    ))[..., None]
    depth_m = jnp.nan_to_num(out.depth_median)[..., None]
    surf_depth = depth_e * (1.0 - depth_ratio) + depth_m * depth_ratio
    surf_normal = depth_to_normal(cam, surf_depth[..., 0], i0=i0)
    surf_normal = surf_normal * jax.lax.stop_gradient(alpha)
    return RenderOutput(
        rgb=rgb,
        specular=spec,
        roughness=rough,
        alpha=alpha,
        normal_world=normal_world,
        depth_expected=depth_e,
        depth_median=depth_m,
        surf_depth=surf_depth,
        surf_normal=surf_normal,
        distortion=out.distortion[..., None],
        wet=out.wet,
        radii=out.radii,
        visibility=out.radii > 0,
        num_pairs=out.num_pairs,
    )
