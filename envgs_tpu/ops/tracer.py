"""Production surfel ray tracer: ray-tile cone culling + Pallas blend kernels.

TPU-native replacement for the diff-surfel-tracing OptiX backend
(/root/reference/easyvolcap/utils/optix_utils.py:87-267). Instead of a BVH
with stack-based traversal (hostile to the TPU's vector units), the design
exploits RAY COHERENCE: reflected rays from neighboring pixels share smooth
normals, so 16x16 ray tiles form tight cones. Per frame:

1. (XLA) per-tile cone statistics (apex, axis, angular spread, origin spread);
2. (XLA) cone-vs-splat-bounding-sphere culling -> (tile, splat) pairs, sorted
   by the splat center's projection along the cone axis (front-to-back) with
   the same capacity-padded lexicographic sort as the rasterizer;
3. (Pallas) per-tile chunked blend with exact per-ray plane intersection,
   using the monotone-transmittance trick for cutoff decisions.

Deviation from the reference: blending order is the per-TILE front-to-back
order (cone-axis projection of splat centers), not each ray's exact hit
order. For the far-field environment sets EnvGS traces this ordering is
near-exact; the reference tracer_ref (exact per-ray sort) quantifies the
gap in tests. Gradients flow to all splat parameters AND to ray origins/
directions (the reflected-ray chain into the base pass; detach=False
semantics of envgs_sampler.py:454).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from envgs_tpu.ops.common import ALPHA_MAX, ALPHA_MIN, T_CUTOFF
from envgs_tpu.ops.raster_pallas import (
    LO,
    _col32,
    _cumprod_ex_sublane,
    _cumsum_sublane,
    _prod_sublane,
    pack_rows,
)
from envgs_tpu.ops.segsum import gather_rows, gather_transpose
from envgs_tpu.ops.tracer_ref import (
    TraceOutput,
    TraceScene,
    trace_rays_reference,
)

# ray tile shape: RTW x RTH rays per tile. 16x8 was tried and REJECTED:
# the probed candidate fill ROSE 0.71M -> 1.4M slots (each tile's kept set
# carries a ~rc/w-wide footprint halo that does not shrink with tile size,
# every splat is tested in twice as many tiles, and the CHUNK=64 per-tile
# alignment waste doubles) while the cull cost doubled with the tile
# count. 16x16 stands.
RTH = 16  # tile height in rays
RTW = 16  # tile width in rays
NRAY = RTH * RTW
CHUNK = 64
DPAD = 128  # 128-lane alignment for HBM DMA slices
T_MIN = 1e-4  # minimum ray parameter (self-hit guard)

# pair_data columns
_C_MEAN = 0  # 3
_C_TU = 3  # 3 (tangent / scale_u)
_C_TV = 6  # 3
_C_N = 9  # 3
_C_OPAC = 12
_C_COLOR = 13  # 3
_C_AUX = 16  # A <= 2


def _fout(A: int) -> int:
    # rgb(3), dptw, acc, norm(3), dist, aux(A), T, D1, D2, last
    return 12 + A


def _rows(A: int):
    return dict(color=0, dpt=3, acc=4, normal=5, dist=8, aux=9,
                trans=9 + A, d1=10 + A, d2=11 + A, last=12 + A)


def _fpad(A: int) -> int:
    return -(-(_fout(A) + 1) // 8) * 8


NQUAD = 4  # probe boxes per tile (2x2 spatial quadrants of the ray grid)


class RayTiles(NamedTuple):
    rays: jnp.ndarray  # (T, 8, NRAY): rows ox oy oz dx dy dz 0 0
    apex: jnp.ndarray  # (T, 3)
    axis: jnp.ndarray  # (T, 3) unit mean direction
    tan_half: jnp.ndarray  # (T,) cone tangent (with slack)
    spread: jnp.ndarray  # (T,) origin spread radius
    n_tiles: int
    # direction-space probe (None -> refine footprint test disabled):
    # an orthonormal frame perpendicular to `axis` plus, per ray
    # quadrant (RTH/2 x RTW/2 rays), gnomonic center/half-width boxes of the ACTUAL ray
    # directions and of the ray-origin offsets from the apex
    probe_frame: jnp.ndarray | None = None  # (T, 2, 3): ex, ey rows
    probe_box: jnp.ndarray | None = None
    # ^ (T, NQUAD, 10): u_c u_a v_c v_a ox_c ox_a oy_c oy_a oz_c oz_a
    probe_ok: jnp.ndarray | None = None  # (T,) bool


def build_ray_tiles(ray_o: jnp.ndarray, ray_d: jnp.ndarray) -> RayTiles:
    """Group an (H, W) ray grid into RTW x RTH cones (H, W padded).

    All per-ray math runs on (T, NRAY) component planes (NRAY = 256 on the
    lane axis) — the (T, NRAY, 3) layout puts the 3-vector on the lane
    axis at 3/128 utilisation and measured ~3x slower for the same pass
    count."""
    H, W = ray_o.shape[:2]
    Hp = -(-H // RTH) * RTH
    Wp = -(-W // RTW) * RTW
    od_stack = jnp.concatenate([ray_o, ray_d], axis=-1)  # (H, W, 6)
    od_stack = jnp.pad(od_stack, ((0, Hp - H), (0, Wp - W), (0, 0)),
                       mode="edge")
    ty, tx = Hp // RTH, Wp // RTW
    T = ty * tx
    # one transpose: (H, W, 6) -> (T, 6, NRAY), also the kernel ray layout
    planes = (
        od_stack.reshape(ty, RTH, tx, RTW, 6)
        .transpose(0, 2, 4, 1, 3)
        .reshape(T, 6, NRAY)
    )
    rays = jnp.concatenate([planes, jnp.zeros((T, 2, NRAY))], axis=1)
    ox, oy, oz = planes[:, 0], planes[:, 1], planes[:, 2]  # (T, NRAY)
    dx, dy, dz = planes[:, 3], planes[:, 4], planes[:, 5]
    dinv = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-18))
    dnx, dny, dnz = dx * dinv, dy * dinv, dz * dinv

    def mean1(x):
        return jnp.mean(x, axis=-1)

    apx, apy, apz = mean1(ox), mean1(oy), mean1(oz)
    axx, axy, axz = mean1(dnx), mean1(dny), mean1(dnz)
    ainv = jax.lax.rsqrt(
        jnp.maximum(axx * axx + axy * axy + axz * axz, 1e-18))
    axx, axy, axz = axx * ainv, axy * ainv, axz * ainv
    apex = jnp.stack([apx, apy, apz], axis=-1)
    axis = jnp.stack([axx, axy, axz], axis=-1)
    cosang = jnp.clip(
        dnx * axx[:, None] + dny * axy[:, None] + dnz * axz[:, None],
        -1.0, 1.0)
    min_cos = jnp.min(cosang, axis=-1)
    sin_half = jnp.sqrt(jnp.clip(1.0 - min_cos * min_cos, 0.0, 1.0))
    tan_half = sin_half / jnp.clip(min_cos, 1e-3, None)
    rox = ox - apx[:, None]
    roy = oy - apy[:, None]
    roz = oz - apz[:, None]
    o_dist2 = rox * rox + roy * roy + roz * roz
    spread = jnp.sqrt(jnp.max(o_dist2, axis=-1))

    # ---- direction-space probe tables ----
    # Gnomonic projection of every ray direction onto the plane
    # perpendicular to `axis` (u = d.ex / d.axis, v = d.ey / d.axis), then
    # a bounding box of the ACTUAL projected directions per spatial ray
    # quadrant (RTH/2 x RTW/2 rays), plus the matching boxes of the ray ORIGIN offsets from
    # the apex in the same frame (the candidate test shifts/widens the
    # direction box by the first-order origin terms). The refine-stage
    # test rejects a candidate when its projected-footprint ellipse misses
    # all four boxes — the boxes are the support of the real rays, so the
    # test needs no smoothness/affine assumption and noisy reflected-ray
    # bundles only widen the boxes (stays conservative). Tiles with rays
    # beyond ~78 deg of the axis (cos < 0.2: gnomonic blowup) opt out via
    # probe_ok.
    up = jnp.where(jnp.abs(axis[:, 2:3]) < 0.9,
                   jnp.asarray([0.0, 0.0, 1.0]),
                   jnp.asarray([1.0, 0.0, 0.0]))
    ex = jnp.cross(up, axis)
    ex = ex / jnp.clip(jnp.linalg.norm(ex, axis=-1, keepdims=True),
                       1e-9, None)
    ey = jnp.cross(axis, ex)
    wr = (dnx * axx[:, None] + dny * axy[:, None] + dnz * axz[:, None])
    probe_ok = jnp.min(wr, axis=-1) > 0.2
    inv_wr = 1.0 / jnp.maximum(wr, 0.2)
    exx, exy, exz = ex[:, 0, None], ex[:, 1, None], ex[:, 2, None]
    eyx, eyy, eyz = ey[:, 0, None], ey[:, 1, None], ey[:, 2, None]
    u = (dnx * exx + dny * exy + dnz * exz) * inv_wr
    v = (dnx * eyx + dny * eyy + dnz * eyz) * inv_wr
    odx = rox * exx + roy * exy + roz * exz
    ody = rox * eyx + roy * eyy + roz * eyz
    odz = rox * axx[:, None] + roy * axy[:, None] + roz * axz[:, None]

    def quadrant(x, red):  # (T, NRAY) -> (T, NQUAD) per 2x2 spatial quadrant
        return red(x.reshape(T, 2, RTH // 2, 2, RTW // 2), axis=(2, 4)
                   ).reshape(T, NQUAD)

    def cbox(x):  # center/half-width boxes per quadrant
        hi, lo = quadrant(x, jnp.max), quadrant(x, jnp.min)
        return 0.5 * (hi + lo), 0.5 * (hi - lo)

    u_c, u_a = cbox(u)
    v_c, v_a = cbox(v)
    ox_c, ox_a = cbox(odx)
    oy_c, oy_a = cbox(ody)
    oz_c, oz_a = cbox(odz)
    probe_box = jnp.stack(
        [u_c, u_a, v_c, v_a, ox_c, ox_a, oy_c, oy_a, oz_c, oz_a], axis=-1)
    probe_frame = jnp.stack([ex, ey], axis=1)

    return RayTiles(rays, apex, axis, tan_half, spread, T,
                    probe_frame, probe_box, probe_ok)


def _morton3(u: jnp.ndarray, bits: int = 10) -> jnp.ndarray:
    """(P, 3) coords in [0, 1] -> 30-bit Morton codes (int32)."""
    xi = jnp.clip((u * (1 << bits)).astype(jnp.int32), 0, (1 << bits) - 1)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (
        (spread(xi[:, 0]) << 2) | (spread(xi[:, 1]) << 1) | spread(xi[:, 2])
    )


class ChunkIndex(NamedTuple):
    """Spatially-coherent splat chunking (built once per scene per frame)."""

    order: jnp.ndarray  # (Pp,) sorted position -> pool index (sentinel P)
    mean_s: jnp.ndarray  # (Pp, 3) means in Morton order
    rad_s: jnp.ndarray  # (Pp,) 3-sigma radii in Morton order (0 if inactive)
    cmean: jnp.ndarray  # (NC, 3) chunk sphere centers
    crad: jnp.ndarray  # (NC,) chunk sphere radii
    cact: jnp.ndarray  # (NC,) any active member


def build_chunk_index(scene: TraceScene, radius3: jnp.ndarray,
                      chunk: int = CHUNK) -> ChunkIndex:
    """Morton-sort splats and build per-chunk bounding spheres."""
    P = scene.mean.shape[0]
    act = scene.valid
    actf = act[:, None]
    big = jnp.asarray(3.4e38, jnp.float32)
    mlo = jnp.min(jnp.where(actf, scene.mean, big), axis=0)
    mhi = jnp.max(jnp.where(actf, scene.mean, -big), axis=0)
    u = (scene.mean - mlo) / jnp.maximum(mhi - mlo, 1e-6)
    key = jnp.where(act, _morton3(jnp.clip(u, 0.0, 1.0)),
                    jnp.asarray(2 ** 30, jnp.int32))
    order = jnp.argsort(key).astype(jnp.int32)
    Pp = -(-P // chunk) * chunk
    pad = Pp - P
    mean_s = jnp.pad(scene.mean[order], ((0, pad), (0, 0)))
    rad_s = jnp.pad((radius3 * act)[order], (0, pad))
    act_s = jnp.pad(act[order], (0, pad))
    order = jnp.pad(order, (0, pad), constant_values=P)
    order = jnp.where(act_s, order, P)  # inactive -> sentinel row
    NC = Pp // chunk
    mm = mean_s.reshape(NC, chunk, 3)
    aa = act_s.reshape(NC, chunk)
    cnt = jnp.maximum(jnp.sum(aa, axis=1), 1)[:, None]
    cmean = jnp.sum(mm * aa[..., None], axis=1) / cnt
    dist = jnp.linalg.norm(mm - cmean[:, None, :], axis=-1)
    crad = jnp.max(
        jnp.where(aa, dist + rad_s.reshape(NC, chunk), 0.0), axis=1
    )
    return ChunkIndex(order, mean_s, rad_s, cmean, crad, jnp.any(aa, axis=1))


def cull_and_sort(
    tiles: RayTiles, scene: TraceScene, radius3: jnp.ndarray,
    per_tile_cap: int = 4096, tile_block: int = 256,
    total_pair_cap: int | None = None,
    tile_mask: jnp.ndarray | None = None,
    probe: bool = True,
):
    """Hierarchical cone culling -> chunk-aligned radially-sorted pairs.

    Per-tile sort over all P splats is the classic bottleneck (a (tiles, P)
    `top_k` is a full 8M-element sort per tile block — measured ~8 ms/block
    on v5e regardless of K). Instead:

    1. splats are Morton-sorted once (spatially coherent chunks of CHUNK);
    2. per tile, cone-vs-CHUNK-SPHERE culling over NC = P/CHUNK chunks and a
       small `top_k` picks the Kc nearest chunks (front-to-back);
    3. the <= Kc*CHUNK candidates are refined with the exact per-splat cone
       test and sorted by radial distance from the tile apex — the same
       per-splat front-to-back order as the flat algorithm, two orders of
       magnitude less sort work.

    The chunk sphere test is conservative (slack includes crad*(1+tan) so a
    chunk is kept whenever any member splat passes the per-splat test);
    dropped-beyond-Kc chunks are the farthest, the same truncation semantics
    as the rasterizer's pair_cap.

    Returns (gauss_idx (cap_aligned,) POOL indices with sentinel P,
    tile_bounds (T+1,)).
    """
    P = scene.mean.shape[0]
    T = tiles.n_tiles
    idx = build_chunk_index(scene, radius3)
    NC = idx.cmean.shape[0]
    Kc = max(min(per_tile_cap // CHUNK, NC), 1)
    C = Kc * CHUNK
    K = C  # per-tile candidate width (downstream machinery)
    cmeanT = idx.cmean.T  # (3, NC)
    cm2 = jnp.sum(idx.cmean * idx.cmean, axis=-1)
    # chunk-expanded candidate index table (whole-chunk gather rows)
    cand_idx = idx.order.reshape(NC, CHUNK)
    # plane-footprint tables (sentinel row P -> zeros): splat normal and the
    # per-opacity contribution radius rc = sigma_max * sqrt(2 ln(op/ALPHA_MIN))
    # — the world-space in-plane distance beyond which NO ray can receive
    # alpha >= ALPHA_MIN from this splat (conservative: uses sigma_max for
    # both ellipse axes). Both kernels and the oracle skip alpha < ALPHA_MIN
    # (tracer.py _fwd_kernel amask, tracer_ref.py), so plane-footprint
    # rejection is exactly lossless.
    nrm1 = jnp.concatenate([scene.normal, jnp.zeros((1, 3))], axis=0)
    rc = (radius3 / 3.0) * jnp.sqrt(
        2.0 * jnp.clip(jnp.log(jnp.clip(scene.opacity, 1e-12, None)
                               / ALPHA_MIN), 0.0, None))
    rc1 = jnp.concatenate([rc, jnp.zeros((1,))], axis=0)
    nrm_s = nrm1[idx.order]  # (Pp, 3)
    rc_s = rc1[idx.order]  # (Pp,)
    # ONE packed float candidate table (NC, 8, CHUNK): mx my mz rad nx ny nz
    # rc — a single chunk-row gather feeds the whole refine, and the
    # component planes come out in SoA layout so every refine op is a pure
    # (B, C) elementwise op (XLA fuses the full test chain into one loop;
    # (B, C, 3) dot/norm reductions measured ~10 ms/frame of HBM-bound
    # fusions at bench scale).
    packed_cand = jnp.stack(
        [idx.mean_s[:, 0].reshape(NC, CHUNK),
         idx.mean_s[:, 1].reshape(NC, CHUNK),
         idx.mean_s[:, 2].reshape(NC, CHUNK),
         idx.rad_s.reshape(NC, CHUNK),
         nrm_s[:, 0].reshape(NC, CHUNK),
         nrm_s[:, 1].reshape(NC, CHUNK),
         nrm_s[:, 2].reshape(NC, CHUNK),
         rc_s.reshape(NC, CHUNK)], axis=1)

    use_probe = probe and tiles.probe_frame is not None

    def block_cull(args):
        (apex, axis, tan_half, spread, tmask, pframe, pbox, pok) = args
        B = apex.shape[0]
        # ---- coarse: cone vs chunk spheres ----
        proj = axis @ cmeanT - jnp.sum(axis * apex, -1, keepdims=True)
        d2 = (
            cm2[None, :] - 2.0 * (apex @ cmeanT)
            + jnp.sum(apex * apex, -1, keepdims=True)
        )
        d2 = jnp.clip(d2, 0.0, None)
        axis_dist = jnp.sqrt(jnp.clip(d2 - proj * proj, 0.0, None))
        slack = (spread[:, None]
                 + idx.crad[None, :] * (1.0 + tan_half[:, None]))
        hit = axis_dist <= proj * tan_half[:, None] + slack
        near = d2 <= slack * slack
        keep = (hit | near) & (proj + idx.crad[None, :] > 0)
        keep = keep & idx.cact[None, :] & tmask[:, None]
        radial = jnp.where(keep, jnp.sqrt(d2), jnp.inf)
        # exact nearest-Kc chunks. (approx_max_k was measured to give NO
        # speedup here — the refine stage dominates — and its recall<1 can
        # drop NEAR chunks, i.e. visible foreground splats, not just the
        # far-truncation semantics of the cap.)
        negr, idc = jax.lax.top_k(-radial, Kc)
        cvalid = negr > -jnp.inf
        # ---- refine: exact per-splat cone test on the candidates ----
        # (SoA: component planes of the one packed gather; all (B, C) ops)
        pc = packed_cand[idc]  # (B, Kc, 8, CHUNK)

        def comp(i):
            return pc[:, :, i, :].reshape(B, C)

        cmx, cmy, cmz = comp(0), comp(1), comp(2)
        cvC = jnp.broadcast_to(
            cvalid[:, :, None], (B, Kc, CHUNK)).reshape(B, C)
        cr = jnp.where(cvC, comp(3), 0.0)
        cnx, cny, cnz = comp(4), comp(5), comp(6)
        crc = jnp.where(cvC, comp(7), 0.0)
        cid = jnp.where(cvalid[:, :, None], cand_idx[idc],
                        P).reshape(B, C)
        relx = cmx - apex[:, 0:1]
        rely = cmy - apex[:, 1:2]
        relz = cmz - apex[:, 2:3]
        proj_s = (relx * axis[:, 0:1] + rely * axis[:, 1:2]
                  + relz * axis[:, 2:3])
        d2_s = relx * relx + rely * rely + relz * relz
        axd_s = jnp.sqrt(jnp.clip(d2_s - proj_s * proj_s, 0.0, None))
        slack_s = spread[:, None] + cr
        hit_s = axd_s <= proj_s * tan_half[:, None] + slack_s
        near_s = d2_s <= slack_s * slack_s
        keep_s = ((hit_s | near_s) & (proj_s + cr > 0) & (cid < P)
                  & (cr > 0))
        # ---- direction-space footprint rejection ----
        # The sphere test keeps any splat whose 3-sigma BALL meets the cone,
        # but at env distance the cone's cross-section is many sigma wide
        # (measured: only 24% of sphere-kept candidates shade any ray).
        # A contributing ray must pass within R = rc + origin-spread of the
        # splat center, i.e. its DIRECTION must land within the angular disk
        # of radius ~R/dist around the candidate's direction. Per tile,
        # build_ray_tiles stored gnomonic bounding boxes of the ACTUAL ray
        # directions (one per 8x8 ray quadrant): reject a candidate whose
        # disk misses all four boxes. The boxes are the support of the real
        # rays — no smoothness assumption, noisy bundles just widen them —
        # and a |d x rel| line-distance bound makes the disk radius exactly
        # conservative up to the 1.05 margin. One dense elementwise pass;
        # rejected rows vanish in the radial sort below, so blend/gather
        # fill shrinks at zero extra compaction cost.
        if use_probe:
            exx = pframe[:, 0, 0:1]
            exy = pframe[:, 0, 1:2]
            exz = pframe[:, 0, 2:3]
            eyx = pframe[:, 1, 0:1]
            eyy = pframe[:, 1, 1:2]
            eyz = pframe[:, 1, 2:3]
            ax0 = axis[:, 0:1]
            ax1 = axis[:, 1:2]
            ax2 = axis[:, 2:3]
            w = relx * ax0 + rely * ax1 + relz * ax2  # depth along axis
            invw = 1.0 / jnp.maximum(w, 1e-6)
            u0 = (relx * exx + rely * exy + relz * exz) * invw
            v0 = (relx * eyx + rely * eyy + relz * eyz) * invw
            # exact first-order gnomonic extents of the projected rc-disk
            # (normal n): u-extent = rc*|P_{perp n}(ex - u0*axis)|/w with
            # |ex - u0*axis|^2 = 1 + u0^2 (ex perp axis); 1.10 covers the
            # second-order perspective terms
            npx = cnx * exx + cny * exy + cnz * exz
            npy = cnx * eyx + cny * eyy + cnz * eyz
            npz = cnx * ax0 + cny * ax1 + cnz * ax2
            bnu = npx - u0 * npz
            bnv = npy - v0 * npz
            scl = invw * 1.10
            slu = crc * jnp.sqrt(
                jnp.clip(1.0 + u0 * u0 - bnu * bnu, 0.0, None)) * scl
            slv = crc * jnp.sqrt(
                jnp.clip(1.0 + v0 * v0 - bnv * bnv, 0.0, None)) * scl
            au0 = jnp.abs(u0)
            av0 = jnp.abs(v0)
            inside = jnp.zeros(keep_s.shape, bool)
            for qd in range(NQUAD):
                cu = pbox[:, qd, 0:1]
                au = pbox[:, qd, 1:2]
                cv = pbox[:, qd, 2:3]
                av = pbox[:, qd, 3:4]
                ocu = pbox[:, qd, 4:5]
                oau = pbox[:, qd, 5:6]
                ocv = pbox[:, qd, 6:7]
                oav = pbox[:, qd, 7:8]
                ocz = pbox[:, qd, 8:9]
                oaz = pbox[:, qd, 9:10]
                # first-order origin shift of the candidate direction seen
                # from o_r: delta_u = (-odx + u0*odz)/w -> shifts the box
                # center by (ocu - u0*ocz)/w and widens it by
                # (oau + |u0|*oaz)/w (1.10 covers second order at the far
                # gate's oz/w <= 0.25)
                du = (jnp.abs(u0 - cu - (ocu - u0 * ocz) * invw)
                      - (au + (oau + au0 * oaz) * invw * 1.10))
                dv = (jnp.abs(v0 - cv - (ocv - v0 * ocz) * invw)
                      - (av + (oav + av0 * oaz) * invw * 1.10))
                inside = inside | ((du <= slu) & (dv <= slv))
            far = w > 4.0 * (crc + spread[:, None])
            applies = far & pok[:, None]
            keep_s = keep_s & (inside | ~applies)
        rad_key = jnp.where(keep_s, jnp.sqrt(d2_s), jnp.inf)
        # culled candidates become sentinel P: they sort past every kept
        # pair AND the slots of a tile's last partial CHUNK read as empty
        # (the compaction below copies whole chunks, so the tail past
        # `counts` IS read by the blend gather)
        cid = jnp.where(keep_s, cid, P)
        cid_bits = int(P).bit_length()  # cid sentinel == P fits
        qbits = 32 - cid_bits
        if qbits >= 14:
            # pack (quantized radial, cid) into ONE int32 row key: half the
            # comparator traffic of the (f32 key, i32 val) pair sort. The
            # sign bit is usable via the unsigned-order XOR trick. Radial
            # quantizes per tile to rmax/(2^qbits-1) buckets (>= 16K); order
            # inside one bucket falls to cid — the same
            # arbitrary-tie-resolution class as the CUDA depth-bits sort
            # (gaussian2d_utils.py tile pipeline). Culled candidates carry
            # the max bucket (and sentinel cid, above).
            qmax = (1 << qbits) - 1
            rmax = jnp.max(jnp.where(keep_s, rad_key, 0.0), -1, keepdims=True)
            rq = jnp.where(
                keep_s,
                jnp.clip(rad_key / jnp.maximum(rmax, 1e-12) * (qmax - 1),
                         0, qmax - 1).astype(jnp.int32),
                qmax)
            key = ((rq << cid_bits) | cid) ^ jnp.int32(-2147483648)
            key_s = jax.lax.sort(key, dimension=-1, is_stable=False)
            cid_sorted = (key_s ^ jnp.int32(-2147483648)) & ((1 << cid_bits) - 1)
        else:
            _, cid_sorted = jax.lax.sort_key_val(rad_key, cid, dimension=-1)
        return cid_sorted.astype(jnp.int32), keep_s

    # pad tile count to a block multiple
    Tp = -(-T // tile_block) * tile_block
    pad = Tp - T
    apex = jnp.pad(tiles.apex, ((0, pad), (0, 0)))
    axis = jnp.pad(tiles.axis, ((0, pad), (0, 0)), constant_values=0)
    tanh = jnp.pad(tiles.tan_half, (0, pad), constant_values=-1.0)
    sprd = jnp.pad(tiles.spread, (0, pad), constant_values=-1e9)
    if tile_mask is None:
        tile_mask = jnp.ones((T,), bool)
    tmsk = jnp.pad(tile_mask, (0, pad), constant_values=False)
    if use_probe:
        pfr = jnp.pad(tiles.probe_frame, ((0, pad), (0, 0), (0, 0)))
        pbx = jnp.pad(tiles.probe_box, ((0, pad), (0, 0), (0, 0)))
        pokm = jnp.pad(tiles.probe_ok, (0, pad), constant_values=False)
    else:  # manually-constructed RayTiles: no probe data
        pfr = jnp.zeros((Tp, 2, 3))
        pbx = jnp.zeros((Tp, NQUAD, 10))
        pokm = jnp.zeros((Tp,), bool)
    blocks = (
        apex.reshape(-1, tile_block, 3),
        axis.reshape(-1, tile_block, 3),
        tanh.reshape(-1, tile_block),
        sprd.reshape(-1, tile_block),
        tmsk.reshape(-1, tile_block),
        pfr.reshape(-1, tile_block, 2, 3),
        pbx.reshape(-1, tile_block, NQUAD, 10),
        pokm.reshape(-1, tile_block),
    )
    idmat, keepmat = jax.lax.map(block_cull, blocks)
    # keep idmat/keepmat PADDED to Tp rows: a [:T] slice copies the whole
    # (Tp, K) matrix (~2.4 ms at sedan scale); padded tiles have
    # tmask=False so their counts are 0 and they never contribute slots.
    # Only the tiny (T+1,) bounds vector is sliced at the end.
    idmat = idmat.reshape(Tp, K)
    keepmat = keepmat.reshape(Tp, K)

    counts = jnp.sum(keepmat.astype(jnp.int32), axis=-1)[:T]  # (T,)
    padded = -(-counts // CHUNK) * CHUNK
    poffs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )
    cap_aligned = -(-(T * K + T * CHUNK) // 1024) * 1024  # segsum granularity
    dropped = jnp.asarray(0, jnp.int32)
    if total_pair_cap is not None:
        cap_aligned = min(cap_aligned, -(-total_pair_cap // 1024) * 1024)
        # tiles overflowing the global budget are dropped whole (their
        # clamped range collapses to start == end); count the dropped slots
        # so truncation is observable in training stats
        dropped = jnp.maximum(poffs[-1] - cap_aligned, 0)
        poffs = jnp.where(poffs > cap_aligned, cap_aligned, poffs)
        poffs = jax.lax.cummax(poffs)

    # aligned slot -> idmat entry, at CHUNK granularity: kept candidates are
    # packed to the FRONT of each idmat row by the in-tile sort (rejected
    # slots carry rad_key=inf and sort to the back as sentinel P), and both
    # poffs and K are CHUNK-multiples — so the compaction is a per-CHUNK
    # row copy, ~cap/64 row gathers instead of cap element gathers (the
    # element-granular version measured 7.0 ms at a 1M cap on v5e — 7 ns per
    # int32 — vs ~0.2 ms for the row form; same cummax sweeps, 64x shorter)
    NCH = cap_aligned // CHUNK
    Krows = K // CHUNK
    coffs = poffs // CHUNK  # (T+1,) chunk-granular offsets
    ccnts = (poffs[1:] - poffs[:-1]) // CHUNK  # respects the cap clamp
    bchunk = jnp.full((NCH,), 0, jnp.int32)
    tile_of = jax.lax.cummax(
        bchunk.at[coffs[:-1]].max(jnp.arange(T, dtype=jnp.int32),
                                  mode="drop")
    )
    pstart = jax.lax.cummax(
        bchunk.at[coffs[:-1]].max(coffs[:-1], mode="drop")
    )
    climit = jax.lax.cummax(
        bchunk.at[coffs[:-1]].max(ccnts, mode="drop")
    )
    i = jnp.arange(NCH, dtype=jnp.int32)
    k = i - pstart
    valid_dst = k < climit
    src_row = jnp.clip(tile_of, 0, T - 1) * Krows + jnp.clip(k, 0, Krows - 1)
    # barriers force the index and the gather to materialize as standalone
    # ops: XLA fusing the index computation / the select into the gather
    # loop drops it off the fast gather path (measured 18 ms -> 0.05 ms for
    # this compaction at a 2M cap on v5e — scripts/tpu_micro_culltail.py)
    src_row = jax.lax.optimization_barrier(src_row)
    gathered = jax.lax.optimization_barrier(
        idmat.reshape(-1, CHUNK)[src_row])  # (NCH, CHUNK)
    gauss_aligned = jnp.where(valid_dst[:, None], gathered, P).reshape(-1)
    return gauss_aligned, poffs, dropped


def _pack_scene_table(scene: TraceScene) -> jnp.ndarray:
    """Per-splat logical packed table (P+1, LO) f32; last row = sentinel 0."""
    packed = jnp.concatenate(
        [
            scene.mean,
            scene.t_u,
            scene.t_v,
            scene.normal,
            (scene.opacity * scene.valid)[:, None],
            scene.color,
            scene.aux,
        ],
        axis=1,
    )
    return jnp.pad(packed, ((0, 1), (0, LO - packed.shape[1])))


def _pack_scene(scene: TraceScene, gauss_idx: jnp.ndarray) -> jnp.ndarray:
    """Test/profiling helper — production fuses the gather (f32 rows)."""
    P = scene.mean.shape[0]
    packed = _pack_scene_table(scene)
    interp = bool(jax.default_backend() == "cpu")
    return jnp.pad(gather_rows(packed, gauss_idx, P + 1, interp),
                   ((0, 0), (0, DPAD - LO)))


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _ray_splat_terms(d, rays):
    """Intersection terms for a (CHUNK, DPAD) split-bf16 pair chunk vs
    (8, NRAY) rays.

    Returns (a, amask, clampm, G, t, u, v, dn, delta-free aux) — all
    (CHUNK, NRAY)."""
    col = lambda i: _col32(d, i)  # (S, 1) f32
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]  # (1, NRAY)
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    cx, cy, cz = col(_C_MEAN), col(_C_MEAN + 1), col(_C_MEAN + 2)
    nx, ny, nz = col(_C_N), col(_C_N + 1), col(_C_N + 2)
    opac = col(_C_OPAC)

    dn = dx * nx + dy * ny + dz * nz
    dn_s = jnp.where(jnp.abs(dn) < 1e-9, 1e-9, dn)
    num = (cx - ox) * nx + (cy - oy) * ny + (cz - oz) * nz
    t = num / dn_s
    ex = ox + t * dx - cx
    ey = oy + t * dy - cy
    ez = oz + t * dz - cz
    tux, tuy, tuz = col(_C_TU), col(_C_TU + 1), col(_C_TU + 2)
    tvx, tvy, tvz = col(_C_TV), col(_C_TV + 1), col(_C_TV + 2)
    u = ex * tux + ey * tuy + ez * tuz
    v = ex * tvx + ey * tvy + ez * tvz
    rho = u * u + v * v
    G = jnp.exp(-0.5 * rho)
    oG = opac * G
    clampm = oG < ALPHA_MAX
    a_raw = jnp.minimum(ALPHA_MAX, oG)
    amask = (a_raw >= ALPHA_MIN) & (t > T_MIN) & (jnp.abs(dn) >= 1e-9)
    a = jnp.where(amask, a_raw, 0.0)
    flip = jnp.where(dn > 0, -1.0, 1.0)
    return a, amask, clampm, G, t, u, v, dn_s, flip, (ex, ey, ez)


def _fwd_kernel(A, bounds_ref, pair_ref, rays_ref, acc_ref, wet_ref,
                pair_vmem, wet_vmem, tcur, sem_p, sem_w, issued,
                need_dist=True, need_wet=True, skip_dma=True,
                need_geo=True):
    r = _rows(A)
    t_id = pl.program_id(0)
    start = bounds_ref[t_id]
    end = bounds_ref[t_id + 1]
    nchunks = jax.lax.div(end - start, CHUNK)
    rays = rays_ref[0]

    acc_ref[...] = jnp.zeros_like(acc_ref)
    acc_ref[r["last"]:r["last"] + 1, :] = jnp.full((1, NRAY), -1.0)
    tcur[...] = jnp.ones_like(tcur)

    def pair_dma(slot, c):
        return pltpu.make_async_copy(
            pair_ref.at[pl.ds(pl.multiple_of(start + c * CHUNK, CHUNK), CHUNK), :],
            pair_vmem.at[slot],
            sem_p.at[slot],
        )

    # saturation DMA skipping (see raster_pallas._fwd_kernel): the prefetch
    # gate reads the ONE-ITERATION-STALE aliveness in issued[2] so DMA
    # starts don't chain behind the previous chunk's compute; issued[0:2]
    # keeps start/wait balanced across the double buffer. Staleness is safe
    # because aliveness only falls within a tile.
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
            a, amask, _cm, _G, t, _u, _v, _dn, flip, _e = _ray_splat_terms(
                d, rays
            )
            om = 1.0 - a
            Ttil = tcur[...] * _cumprod_ex_sublane(om, CHUNK)
            contrib = amask & (Ttil * om >= T_CUTOFF)
            w = jnp.where(contrib, a * Ttil, 0.0)

            if need_dist:  # distortion loss terms: training only
                m = t / (1.0 + jnp.abs(t))  # bounded mapping (t>0: t/(1+t))
                wm = w * m
                wm2 = wm * m
                A_pre = acc_ref[r["acc"]:r["acc"] + 1, :] + _cumsum_sublane(
                    w, CHUNK, exclusive=True)
                D1_pre = acc_ref[r["d1"]:r["d1"] + 1, :] + _cumsum_sublane(
                    wm, CHUNK, exclusive=True)
                D2_pre = acc_ref[r["d2"]:r["d2"] + 1, :] + _cumsum_sublane(
                    wm2, CHUNK, exclusive=True)
                dist_c = w * (m * m * A_pre + D2_pre - 2.0 * m * D1_pre)

            # (MXU-matmul accumulation of these rows measured slower — see
            # raster_pallas._fwd_kernel note); need_geo=False strips the
            # normal/aux/depth rows for pure-render callers
            for i in range(3):
                ci = _col32(d, _C_COLOR + i)
                acc_ref[i:i + 1, :] += jnp.sum(w * ci, axis=0, keepdims=True)
            acc_ref[r["acc"]:r["acc"] + 1, :] += jnp.sum(
                w, axis=0, keepdims=True)
            if need_geo:
                for i in range(3):
                    ni = _col32(d, _C_N + i) * flip
                    acc_ref[r["normal"] + i:r["normal"] + i + 1, :] += (
                        jnp.sum(w * ni, axis=0, keepdims=True))
                for i in range(A):
                    xi = _col32(d, _C_AUX + i)
                    acc_ref[r["aux"] + i:r["aux"] + i + 1, :] += jnp.sum(
                        w * xi, axis=0, keepdims=True)
                acc_ref[r["dpt"]:r["dpt"] + 1, :] += jnp.sum(
                    w * t, axis=0, keepdims=True)
            if need_dist:
                acc_ref[r["d1"]:r["d1"] + 1, :] += jnp.sum(
                    wm, axis=0, keepdims=True)
                acc_ref[r["d2"]:r["d2"] + 1, :] += jnp.sum(
                    wm2, axis=0, keepdims=True)
                acc_ref[r["dist"]:r["dist"] + 1, :] += jnp.sum(
                    dist_c, axis=0, keepdims=True)
                # the bwd kernel's chunk cutoff reads `last`
                rank = ((c * CHUNK).astype(jnp.float32)
                        + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, NRAY), 0).astype(jnp.float32))
                acc_ref[r["last"]:r["last"] + 1, :] = jnp.maximum(
                    acc_ref[r["last"]:r["last"] + 1, :],
                    jnp.max(jnp.where(contrib, rank, -1.0), axis=0,
                            keepdims=True))
            tcur[...] = tcur[...] * _prod_sublane(
                jnp.where(contrib, om, 1.0), CHUNK)

            if need_wet:
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
                    wet_vmem, wet_ref.at[pl.ds(jax.lax.div(off, CHUNK), 1), :], sem_w)
                wr.start()
                wr.wait()

        if need_wet:
            @pl.when(jnp.logical_not(alive))
            def _():
                off = start + c * CHUNK
                wet_vmem[...] = jnp.zeros_like(wet_vmem)
                wr = pltpu.make_async_copy(
                    wet_vmem, wet_ref.at[pl.ds(jax.lax.div(off, CHUNK), 1), :], sem_w)
                wr.start()
                wr.wait()

        return 0

    jax.lax.fori_loop(0, nchunks, chunk_body, 0)
    acc_ref[r["trans"]:r["trans"] + 1, :] = tcur[...]


def _bwd_kernel(A, bounds_ref, pair_ref, rays_ref, res_ref, g_ref,
                gpair_ref, grays_ref, pair_vmem, gp_vmem, tcur, suf,
                sem_p, sem_g, emit_wet=False):
    r = _rows(A)
    t_id = pl.program_id(0)
    start = bounds_ref[t_id]
    end = bounds_ref[t_id + 1]
    rays = rays_ref[0]

    A_tot = res_ref[r["acc"]:r["acc"] + 1, :]
    D1_tot = res_ref[r["d1"]:r["d1"] + 1, :]
    D2_tot = res_ref[r["d2"]:r["d2"] + 1, :]
    T_fin = res_ref[r["trans"]:r["trans"] + 1, :]
    last = res_ref[r["last"]:r["last"] + 1, :]

    g_trans = g_ref[r["trans"]:r["trans"] + 1, :]
    g_dpt = g_ref[r["dpt"]:r["dpt"] + 1, :]
    g_acc = g_ref[r["acc"]:r["acc"] + 1, :]
    g_dist = g_ref[r["dist"]:r["dist"] + 1, :]

    tcur[...] = T_fin
    suf[...] = jnp.zeros_like(suf)
    grays_ref[...] = jnp.zeros_like(grays_ref)

    lastmax = jnp.max(last)
    nchunks = jax.lax.div(end - start, CHUNK)
    nchunks_eff = jnp.maximum(
        jnp.minimum(nchunks, jax.lax.div(lastmax.astype(jnp.int32) + CHUNK,
                                         CHUNK)), 0)

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
        a, amask, clampm, G, t, u, v, dn, flip, (ex, ey, ez) = (
            _ray_splat_terms(d, rays))
        rank = ((c * CHUNK).astype(jnp.float32)
                + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, NRAY), 0).astype(jnp.float32))
        contrib = amask & (rank <= last)
        a = jnp.where(contrib, a, 0.0)
        om = 1.0 - a

        log_om = jnp.where(contrib, jnp.log1p(-a), 0.0)
        s_inc = _cumsum_sublane(log_om, CHUNK, exclusive=False, reverse=True)
        T_bef = tcur[...] * jnp.exp(-s_inc)
        w = jnp.where(contrib, a * T_bef, 0.0)
        m = t / (1.0 + jnp.abs(t))
        wm = w * m
        wm2 = wm * m

        sw_inc = _cumsum_sublane(w, CHUNK, exclusive=False, reverse=True)
        sm_inc = _cumsum_sublane(wm, CHUNK, exclusive=False, reverse=True)
        sm2_inc = _cumsum_sublane(wm2, CHUNK, exclusive=False, reverse=True)
        A_suf = suf[0:1, :] + sw_inc - w
        D1_suf = suf[1:2, :] + sm_inc - wm
        D2_suf = suf[2:3, :] + sm2_inc - wm2
        A_pre = A_tot - suf[0:1, :] - sw_inc
        D1_pre = D1_tot - suf[1:2, :] - sm_inc
        D2_pre = D2_tot - suf[2:3, :] - sm2_inc

        g_w = g_acc + g_dpt * t
        for i_ in range(3):
            ci = _col32(d, _C_COLOR + i_)
            g_w += g_ref[i_:i_ + 1, :] * ci
            ni = _col32(d, _C_N + i_) * flip
            g_w += g_ref[r["normal"] + i_:r["normal"] + i_ + 1, :] * ni
        for i_ in range(A):
            xi = _col32(d, _C_AUX + i_)
            g_w += g_ref[r["aux"] + i_:r["aux"] + i_ + 1, :] * xi
        g_w += g_dist * (m * m * (A_pre + A_suf) + (D2_pre + D2_suf)
                         - 2.0 * m * (D1_pre + D1_suf))

        gww = g_w * w
        sgw_inc = _cumsum_sublane(gww, CHUNK, exclusive=False, reverse=True)
        S_gw = suf[3:4, :] + sgw_inc - gww
        g_a = jnp.where(contrib,
                        g_w * T_bef - (S_gw + g_trans * T_fin) / om, 0.0)

        g_m = g_dist * 2.0 * (m * (A_pre + A_suf) - (D1_pre + D1_suf)) * w
        dm_dt = 1.0 / ((1.0 + jnp.abs(t)) * (1.0 + jnp.abs(t)))
        g_t = w * g_dpt + g_m * dm_dt

        opac = _col32(d, _C_OPAC)
        g_G = g_a * opac * clampm
        g_opac_px = g_a * G * clampm
        g_rho = -0.5 * G * g_G
        g_u = 2.0 * u * g_rho
        g_v = 2.0 * v * g_rho

        col = lambda i_: _col32(d, i_)
        dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
        ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
        nx, ny, nz = col(_C_N), col(_C_N + 1), col(_C_N + 2)
        tux, tuy, tuz = col(_C_TU), col(_C_TU + 1), col(_C_TU + 2)
        tvx, tvy, tvz = col(_C_TV), col(_C_TV + 1), col(_C_TV + 2)
        cxm, cym, czm = col(_C_MEAN), col(_C_MEAN + 1), col(_C_MEAN + 2)

        # u = e . tu, v = e . tv with e = o + t d - c
        g_ex = g_u * tux + g_v * tvx
        g_ey = g_u * tuy + g_v * tvy
        g_ez = g_u * tuz + g_v * tvz
        # t total gradient: e depends on t via d
        g_t = g_t + g_ex * dx + g_ey * dy + g_ez * dz
        # t = ((c - o) . n) / dn
        g_cx_t = g_t * nx / dn
        g_cy_t = g_t * ny / dn
        g_cz_t = g_t * nz / dn
        g_nx = g_t * ((cxm - ox) - t * dx) / dn
        g_ny = g_t * ((cym - oy) - t * dy) / dn
        g_nz = g_t * ((czm - oz) - t * dz) / dn
        # normal output gradient (flip is a constant sign)
        g_nx = g_nx + g_ref[r["normal"]:r["normal"] + 1, :] * flip * w
        g_ny = g_ny + g_ref[r["normal"] + 1:r["normal"] + 2, :] * flip * w
        g_nz = g_nz + g_ref[r["normal"] + 2:r["normal"] + 3, :] * flip * w

        red = lambda x_: jnp.sum(x_ * contrib, axis=1, keepdims=True)
        zero = jnp.zeros((CHUNK, 1), jnp.float32)
        cols = [
            red(-g_ex + g_cx_t), red(-g_ey + g_cy_t), red(-g_ez + g_cz_t),
            red(g_u * ex), red(g_u * ey), red(g_u * ez),
            red(g_v * ex), red(g_v * ey), red(g_v * ez),
            red(g_nx), red(g_ny), red(g_nz),
            red(g_opac_px),
            red(g_ref[0:1, :] * w), red(g_ref[1:2, :] * w),
            red(g_ref[2:3, :] * w),
        ]
        for i_ in range(A):
            cols.append(red(g_ref[r["aux"] + i_:r["aux"] + i_ + 1, :] * w))
        if emit_wet:
            # forward-exact per-pair wet at WET_COL (see raster_pallas):
            # rides the pair-grad transpose, replacing the forward's wet
            # writes + duplicate-index segment reduction
            from envgs_tpu.ops.raster_pallas import WET_COL

            wet_p = jnp.sum(
                jnp.where(T_bef * om >= T_CUTOFF, w, 0.0),
                axis=1, keepdims=True)
            cols.append(jnp.zeros((CHUNK, WET_COL - len(cols)), jnp.float32))
            cols.append(wet_p)
            cols.append(jnp.zeros((CHUNK, DPAD - WET_COL - 1), jnp.float32))
        else:
            cols.append(jnp.zeros((CHUNK, DPAD - len(cols)), jnp.float32))
        gp_vmem[...] = jnp.concatenate(cols, axis=1)
        gw_dma = pltpu.make_async_copy(
            gp_vmem, gpair_ref.at[pl.ds(off, CHUNK), :], sem_g)
        gw_dma.start()
        gw_dma.wait()

        # ray gradients (sum over splats -> (1, NRAY) rows)
        cmask = contrib.astype(jnp.float32)
        g_ox = jnp.sum((g_ex - g_t * nx / dn) * cmask, axis=0, keepdims=True)
        g_oy = jnp.sum((g_ey - g_t * ny / dn) * cmask, axis=0, keepdims=True)
        g_oz = jnp.sum((g_ez - g_t * nz / dn) * cmask, axis=0, keepdims=True)
        g_dx = jnp.sum((g_ex * t - g_t * t * nx / dn) * cmask, axis=0,
                       keepdims=True)
        g_dy = jnp.sum((g_ey * t - g_t * t * ny / dn) * cmask, axis=0,
                       keepdims=True)
        g_dz = jnp.sum((g_ez * t - g_t * t * nz / dn) * cmask, axis=0,
                       keepdims=True)
        grays_ref[0, 0:1, :] += g_ox
        grays_ref[0, 1:2, :] += g_oy
        grays_ref[0, 2:3, :] += g_oz
        grays_ref[0, 3:4, :] += g_dx
        grays_ref[0, 4:5, :] += g_dy
        grays_ref[0, 5:6, :] += g_dz

        suf[0:1, :] += jnp.sum(w, axis=0, keepdims=True)
        suf[1:2, :] += jnp.sum(wm, axis=0, keepdims=True)
        suf[2:3, :] += jnp.sum(wm2, axis=0, keepdims=True)
        suf[3:4, :] += jnp.sum(gww, axis=0, keepdims=True)
        tcur[...] = tcur[...] * jnp.exp(-jnp.sum(log_om, axis=0, keepdims=True))
        return 0

    jax.lax.fori_loop(0, nchunks_eff, chunk_body, 0)

    def zero_body(c, _):
        @pl.when(c >= nchunks_eff)
        def _():
            off = start + c * CHUNK
            gp_vmem[...] = jnp.zeros_like(gp_vmem)
            gz = pltpu.make_async_copy(
                gp_vmem, gpair_ref.at[pl.ds(off, CHUNK), :], sem_g)
            gz.start()
            gz.wait()
        return 0

    jax.lax.fori_loop(0, nchunks, zero_body, 0)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

# shared with the rasterizer (same f32 pair-row layout)
from envgs_tpu.ops.raster_pallas import _to_rows  # noqa: E402


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _blend_trace(pair_data, rays, tile_bounds, A, interpret,
                 needs=(True, True)):
    return _trace_fwd_call(_to_rows(pair_data), rays, tile_bounds, A,
                           interpret, needs)


def _trace_fwd_call(pair_data, rays, tile_bounds, A, interpret,
                    needs=(True, True), skip_dma=True):
    # needs = (need_dist, need_wet[, need_geo]) — need_geo=False (pure
    # render) strips the normal/aux/depth accumulation from the kernel
    need_dist, need_wet = needs[0], needs[1]
    need_geo = needs[2] if len(needs) > 2 else True
    cap = pair_data.shape[0]
    T = tile_bounds.shape[0] - 1
    FPAD = _fpad(A)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, NRAY), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, FPAD, NRAY), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, DPAD), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((1, NRAY), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((3,), jnp.int32),
        ],
    )

    def kernel(bounds_ref, pair_ref, rays_ref, out_ref, wet_ref, pair_vmem,
               wet_vmem, tcur, sem_p, sem_w, issued):
        _fwd_kernel(A, bounds_ref, pair_ref, rays_ref, out_ref.at[0],
                    wet_ref, pair_vmem, wet_vmem, tcur, sem_p, sem_w,
                    issued, need_dist, need_wet, skip_dma=skip_dma,
                    need_geo=need_geo)

    tiles_out, wet = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, FPAD, NRAY), jnp.float32),
            jax.ShapeDtypeStruct((cap // CHUNK, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_bounds, pair_data, rays)
    if not need_wet:  # buffer never written; replace with exact zeros
        return tiles_out, jnp.zeros((cap,), jnp.float32)
    return tiles_out, wet[:, :CHUNK].reshape(cap)


def _trace_fwd(pair_data, rays, tile_bounds, A, interpret,
               needs=(True, True)):
    del needs  # training path computes everything (bwd reads d1/d2/last/wet)
    pairs = _to_rows(pair_data)
    out = _trace_fwd_call(pairs, rays, tile_bounds, A, interpret)
    return out, (pairs, rays, tile_bounds, out[0])


def _trace_bwd(A, interpret, needs, residuals, cotangents, emit_wet=False):
    del needs
    pair_data, rays, tile_bounds, tiles_out = residuals
    pair_data = _to_rows(pair_data)
    g_tiles, _g_wet = cotangents
    cap = pair_data.shape[0]
    T = tile_bounds.shape[0] - 1
    FPAD = _fpad(A)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, NRAY), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FPAD, NRAY), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FPAD, NRAY), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, NRAY), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, DPAD), jnp.float32),
            pltpu.VMEM((CHUNK, DPAD), jnp.float32),
            pltpu.VMEM((1, NRAY), jnp.float32),
            pltpu.VMEM((4, NRAY), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def kernel(bounds_ref, pair_ref, rays_ref, res_ref, g_ref, gpair_ref,
               grays_ref, pair_vmem, gp_vmem, tcur, suf, sem_p, sem_g):
        _bwd_kernel(A, bounds_ref, pair_ref, rays_ref, res_ref.at[0],
                    g_ref.at[0], gpair_ref, grays_ref, pair_vmem, gp_vmem,
                    tcur, suf, sem_p, sem_g, emit_wet=emit_wet)

    g_pair, g_rays = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((cap, DPAD), jnp.float32),
            jax.ShapeDtypeStruct((T, 8, NRAY), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_bounds, pair_data, rays, tiles_out, g_tiles)
    return g_pair, g_rays, None


_blend_trace.defvjp(_trace_fwd, _trace_bwd)


# ---------------------------------------------------------------------------
# Fused pair gather + blend (the production path)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _gather_blend_trace(packed, gauss_idx, rays, tile_bounds, wet_zero,
                        A, interpret, needs=(True, True)):
    """packed (S, <=LO) f32 logical scene table -> (tiles, wet).

    wet_zero (S,) zeros: its COTANGENT is the per-splat traced wet sum,
    recomputed by the backward kernel into grad lane WET_COL and reduced by
    the same gather_transpose as every other pair gradient (the
    means2d_zero trick — strips the forward's per-pair wet writes and the
    duplicate-index segment reduction from the training path).

    Fuses the per-pair row gather with the blend: the gather stays on
    XLA's fast row-gather path (issue-rate bound; f32 rows are free) while
    the backward runs the blend's reverse kernel to per-pair f32 logical
    gradients and transposes the gather with the segmented-sum scan
    (ops/segsum.gather_transpose)."""
    del wet_zero
    # barriers: fast gather path (no producer/consumer fusion — see
    # cull_and_sort tail note)
    packedp = jax.lax.optimization_barrier(pack_rows(packed))
    pairs = jax.lax.optimization_barrier(packedp[gauss_idx])
    return _trace_fwd_call(pairs, rays, tile_bounds, A, interpret, needs,
                           skip_dma=True)


def _gbt_fwd(packed, gauss_idx, rays, tile_bounds, wet_zero,
             A, interpret, needs=(True, True)):
    del wet_zero
    # the backward reads d1/d2/last (need_dist); wet arrives through the
    # gradient lane, so honor the caller's wet/geo strips
    needs = (True, needs[1]) + tuple(needs[2:3])
    packedp = jax.lax.optimization_barrier(pack_rows(packed))
    pairs = jax.lax.optimization_barrier(packedp[gauss_idx])
    out = _trace_fwd_call(pairs, rays, tile_bounds, A, interpret, needs)
    return out, (pairs, gauss_idx, rays, tile_bounds, out[0], packed.shape)


def _gbt_bwd(A, interpret, needs, residuals, cotangents):
    pairs, gauss_idx, rays, tile_bounds, tiles_out, pshape = residuals
    g_pair, g_rays, _ = _trace_bwd(
        A, interpret, needs, (pairs, rays, tile_bounds, tiles_out),
        cotangents, emit_wet=True
    )
    g_packed = gather_transpose(g_pair, gauss_idx, pshape[0], pshape[0],
                                interpret, width=pshape[1],
                                drop_last_segment=True)
    from envgs_tpu.ops.raster_pallas import WET_COL

    return g_packed, None, g_rays, None, g_packed[:, WET_COL]


_gather_blend_trace.defvjp(_gbt_fwd, _gbt_bwd)


def _trace_tiles_exact(scene: TraceScene, rays, gauss_idx, bounds, K: int,
                       tile_block: int = 8):
    """Exact per-ray-ordered blend over the production candidate windows.

    Eval-time counterpart of the Pallas blend (which composites in per-tile
    radial order — exact for common-origin bundles, approximate otherwise):
    every tile's candidate window [bounds[t], bounds[t+1]) is re-blended
    with the ORACLE's per-ray depth sort (tracer_ref.py math, identical
    constants), so the only remaining difference vs trace_rays_reference is
    the cull itself. O(K log K) per ray; no wet output (eval only).

    Returns (T, 5 + 3 + A, NRAY): rgb*3, dptw, acc, nrm*3, dist, trans, aux.
    """
    T = rays.shape[0]
    P = scene.mean.shape[0]
    A = scene.aux.shape[-1]
    idx_pad = jnp.pad(gauss_idx, (0, K), constant_values=P)

    def one_tile(args):
        start, cnt, r8 = args
        idxw = jax.lax.dynamic_slice(idx_pad, (start,), (K,))
        valid = (jnp.arange(K) < cnt) & (idxw < P)
        g = jnp.clip(idxw, 0, P - 1)
        mean = scene.mean[g]  # (K, 3)
        tu, tv = scene.t_u[g], scene.t_v[g]
        nrm = scene.normal[g]
        op = jnp.where(valid, scene.opacity[g], 0.0)
        col = scene.color[g]
        aux = scene.aux[g]
        o, d = r8[0:3], r8[3:6]  # (3, NRAY)
        dn = nrm @ d  # (K, NRAY)
        dn_safe = jnp.where(jnp.abs(dn) < 1e-9, 1e-9, dn)
        t = (jnp.sum(mean * nrm, -1, keepdims=True) - nrm @ o) / dn_safe
        # delta = o + t*d - mean; u = t_u . delta (3-term sums, (K, NRAY))
        u = tu @ o + t * (tu @ d) - jnp.sum(tu * mean, -1, keepdims=True)
        v = tv @ o + t * (tv @ d) - jnp.sum(tv * mean, -1, keepdims=True)
        rho = u * u + v * v
        alpha = jnp.minimum(ALPHA_MAX, op[:, None] * jnp.exp(-0.5 * rho))
        ok = (alpha >= ALPHA_MIN) & (t > T_MIN) & (jnp.abs(dn) >= 1e-9)
        alpha = jnp.where(ok, alpha, 0.0)
        flip = jnp.where(dn > 0, -1.0, 1.0)  # (K, NRAY)
        # ---- per-ray exact depth order (the point of this path) ----
        keys = jnp.where(alpha > 0, t, jnp.inf).T  # (NRAY, K)
        _, order = jax.lax.sort_key_val(
            keys, jnp.broadcast_to(jnp.arange(K), (NRAY, K)))

        def per_ray(x):  # (K, NRAY) -> (NRAY, K) in ray depth order
            return jnp.take_along_axis(x.T, order, axis=1)

        a_s = per_ray(alpha)
        t_s = per_ray(t)
        m_s = t_s / (1.0 + jnp.abs(t_s))
        log_om = jnp.log1p(-a_s)
        cum = jnp.cumsum(log_om, axis=1)
        Ttil = jnp.exp(jnp.pad(cum, ((0, 0), (1, 0)))[:, :-1])
        contrib = (a_s > 0) & (Ttil * (1.0 - a_s) >= T_CUTOFF)
        w = jnp.where(contrib, a_s * Ttil, 0.0)  # (NRAY, K)
        col_s = col[order]  # (NRAY, K, 3)
        n_s = per_ray(nrm[:, None, 0] * flip), per_ray(
            nrm[:, None, 1] * flip), per_ray(nrm[:, None, 2] * flip)
        acc = jnp.sum(w, axis=1)
        rgb = jnp.einsum("rk,rkc->cr", w, col_s)
        dptw = jnp.sum(w * t_s, axis=1)
        nout = jnp.stack([jnp.sum(w * n, axis=1) for n in n_s])
        aout = jnp.einsum("rk,rkc->cr", w, aux[order]) if A else \
            jnp.zeros((0, NRAY))
        wpre = jnp.pad(jnp.cumsum(w, 1), ((0, 0), (1, 0)))[:, :-1]
        d1pre = jnp.pad(jnp.cumsum(w * m_s, 1), ((0, 0), (1, 0)))[:, :-1]
        d2pre = jnp.pad(
            jnp.cumsum(w * m_s * m_s, 1), ((0, 0), (1, 0)))[:, :-1]
        dist = jnp.sum(w * (m_s * m_s * wpre + d2pre - 2 * m_s * d1pre), 1)
        Tfin = jnp.exp(jnp.sum(jnp.where(contrib, log_om, 0.0), axis=1))
        return jnp.concatenate([
            rgb, dptw[None], acc[None], nout, dist[None], Tfin[None], aout,
        ])  # (8 + 1 + A, NRAY)

    pad = (-T) % tile_block
    starts = jnp.pad(bounds[:-1], (0, pad))
    cnts = jnp.pad(bounds[1:] - bounds[:-1], (0, pad))
    rpad = jnp.pad(rays, ((0, pad), (0, 0), (0, 0)))
    out = jax.lax.map(
        jax.vmap(one_tile),
        (starts.reshape(-1, tile_block), cnts.reshape(-1, tile_block),
         rpad.reshape(-1, tile_block, 8, NRAY)),
    )
    return out.reshape(-1, 10 + A, NRAY)[:T]


def trace_rays(
    scene: TraceScene,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    bg_color: jnp.ndarray,
    backend: str = "tiled",
    per_tile_cap: int | None = None,
    total_pair_cap: int | None = 2 ** 21,
    ray_mask: jnp.ndarray | None = None,
    needs: tuple = (True, True),
    wet_zero: jnp.ndarray | None = None,
    compose_raw: bool = False,
    exact_order: bool = False,
    probe: bool = True,
) -> TraceOutput:
    """Tiled Pallas tracer over an (H, W) ray grid.

    ray_mask (H, W) bool: rays to actually trace (the specular/acc ray
    filtering of envgs_sampler.py:434-447) — tiles with no masked-in ray are
    culled whole (zero chunks), so sparse reflective regions trace at a
    fraction of the full-frame cost. Masked-out rays inside live tiles still
    receive (unused) blend values, matching the reference's scatter-back
    semantics where untraced pixels keep the base color.

    wet_zero (P,) zeros: when given, per-splat wet arrives as
    d(loss)/d(wet_zero) through the blend backward and TraceOutput.wet is
    exact zeros (the forward wet pipeline is stripped — see
    _gather_blend_trace).

    compose_raw: return the PREMULTIPLIED accumulators for cross-device
    slab composition (parallel/splat_sharding.compose_trace_slabs):
    rgb without the bg·T term, dpt NOT normalized by acc, and the d1/d2
    distortion moments filled — the alpha-blend monoid's raw form."""
    interpret = backend == "tiled_interp"
    H, W = ray_o.shape[:2]
    P = scene.mean.shape[0]
    A = scene.aux.shape[-1]
    tiles = build_ray_tiles(ray_o, ray_d)
    # 3-sigma world bounding radius per splat
    su = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_u, axis=-1), 1e-12, None)
    sv = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_v, axis=-1), 1e-12, None)
    radius3 = 3.0 * jnp.maximum(su, sv)
    # per-tile hit budget: full P for small scenes, else capped (nearest-K).
    # 2048 measured visually lossless vs 4096 on the worst-case synthetic
    # dome (41.3 dB between the two renders; 1024 truncates visibly) at
    # ~60% of the cull+blend cost. A chunk-level probe prefilter + Kc=16
    # was tried and REJECTED: a tile's contributors span more than 16
    # Morton chunks on the dome (fill collapsed 709K -> 146K, losing 95%
    # of true contributors), and at Kc=32 the prefilter rejected nothing.
    K = per_tile_cap or min(-(-P // CHUNK) * CHUNK, 2048)
    tile_mask = None
    if ray_mask is not None:
        Hp = -(-H // RTH) * RTH
        Wp = -(-W // RTW) * RTW
        m = jnp.pad(ray_mask.astype(bool),
                    ((0, Hp - H), (0, Wp - W)), constant_values=False)
        tile_mask = (
            m.reshape(Hp // RTH, RTH, Wp // RTW, RTW)
            .transpose(0, 2, 1, 3).reshape(tiles.n_tiles, NRAY).any(axis=1)
        )
    gauss_idx, bounds, dropped_pairs = cull_and_sort(
        tiles, scene, radius3, per_tile_cap=K, total_pair_cap=total_pair_cap,
        tile_mask=tile_mask, probe=probe,
    )
    if exact_order:
        # eval-time exact per-ray blend order over the SAME candidate
        # windows (VERDICT r3 item 4): bounds the production radial-order
        # approximation on real scenes. No wet output (eval only).
        assert not compose_raw, "exact_order: eval path, no slab composition"
        assert wet_zero is None, "exact_order: eval path, no wet grad lane"
        te = _trace_tiles_exact(scene, tiles.rays, gauss_idx, bounds, K)
        ty, tx = -(-H // RTH), -(-W // RTW)
        img = te.reshape(ty, tx, 10 + A, RTH, RTW)
        img = img.transpose(2, 0, 3, 1, 4).reshape(10 + A, ty * RTH,
                                                   tx * RTW)[:, :H, :W]
        acc, trans = img[4], img[9]
        return TraceOutput(
            rgb=img[:3].transpose(1, 2, 0)
            + trans[..., None] * bg_color[None, None, :],
            dpt=jnp.where(acc > 1e-8, img[3] / jnp.maximum(acc, 1e-8), 0.0),
            acc=acc,
            norm=img[5:8].transpose(1, 2, 0),
            dist=img[8],
            aux=img[10:].transpose(1, 2, 0),
            wet=jnp.zeros((P,), jnp.float32),
            trans=trans,
            dropped_pairs=jax.lax.stop_gradient(dropped_pairs),
            num_pairs=jax.lax.stop_gradient(bounds[-1]),
        )
    packed = _pack_scene_table(scene)
    grad_wet = wet_zero is not None
    # preserve needs[2] (need_geo): the render path strips the normal/aux/
    # depth accumulation rows from the kernel
    fwd_needs = (needs[0], needs[1] and not grad_wet) + tuple(needs[2:3])
    wz = (jnp.pad(wet_zero, (0, 1)) if grad_wet
          else jnp.zeros((P + 1,), jnp.float32))
    tiles_out, wet_pairs = _gather_blend_trace(packed, gauss_idx, tiles.rays,
                                               bounds, wz, A, interpret,
                                               fwd_needs)

    r = _rows(A)
    ty = -(-H // RTH)
    tx = -(-W // RTW)
    FPAD = tiles_out.shape[1]
    img = tiles_out.reshape(ty, tx, FPAD, RTH, RTW)
    img = img.transpose(2, 0, 3, 1, 4).reshape(FPAD, ty * RTH, tx * RTW)
    img = img[:, :H, :W]

    trans = img[r["trans"]]
    acc = img[r["acc"]]
    if compose_raw:
        rgb = img[:3].transpose(1, 2, 0)
        dpt = img[r["dpt"]]  # premultiplied (normalize after composition)
    else:
        rgb = (img[:3].transpose(1, 2, 0)
               + trans[..., None] * bg_color[None, None, :])
        dpt = jnp.where(acc > 1e-8, img[r["dpt"]] / jnp.maximum(acc, 1e-8),
                        0.0)
    if fwd_needs[1]:
        wet = jax.ops.segment_sum(
            jax.lax.stop_gradient(wet_pairs), gauss_idx, num_segments=P + 1
        )[:P]
    else:  # pure render / grad-wet: never written (exact zeros, no reduce)
        wet = jnp.zeros((P,), jnp.float32)
    return TraceOutput(
        rgb=rgb,
        dpt=dpt,
        acc=acc,
        norm=img[r["normal"]:r["normal"] + 3].transpose(1, 2, 0),
        dist=img[r["dist"]],
        aux=img[r["aux"]:r["aux"] + A].transpose(1, 2, 0),
        wet=wet,
        trans=trans,
        dropped_pairs=jax.lax.stop_gradient(dropped_pairs),
        d1=img[r["d1"]] if compose_raw else None,
        d2=img[r["d2"]] if compose_raw else None,
        num_pairs=jax.lax.stop_gradient(bounds[-1]),
    )


def trace_rays_multibounce(
    scene: TraceScene,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    bg_color: jnp.ndarray,
    max_trace_depth: int = 0,
    specular_threshold: float = 0.0,
    backend: str = "tiled",
    total_pair_cap: int | None = 2 ** 21,
    ray_mask: jnp.ndarray | None = None,
):
    """Recursive specular tracing (the reference's max_trace_depth>0 path,
    optix_utils.py:104-119 + the per-bounce `mid` ray/output buffers at
    optix_utils.py:29-37,244-265).

    Each bounce b traces the current ray set, then spawns reflected rays at
    the blended hit surface for rays whose blended specular (aux channel 0)
    exceeds `specular_threshold` and whose hit is solid (acc > 0.5); bounce
    colors composite back-to-front as rgb_b' = (1-s_b) rgb_b + s_b rgb_{b+1}
    on the reflected set. Returns (composited TraceOutput of bounce 0,
    per-bounce TraceOutput list = the `mid` buffers).

    All shipped EnvGS configs use max_trace_depth=0 (gaussian2d_sampler.py:89)
    — one trace, no recursion — so this is capability parity, not a hot path.
    """
    scene_has_spec = scene.aux.shape[-1] > 0

    def _trace(o, d, m):
        if backend == "ref":
            return trace_rays_reference(scene, o, d, bg_color)
        return trace_rays(scene, o, d, bg_color, backend=backend,
                          total_pair_cap=total_pair_cap, ray_mask=m)

    bounces = []
    masks = []
    o, d, m = ray_o, ray_d, ray_mask
    for b in range(max_trace_depth + 1):
        out = _trace(o, d, m)
        bounces.append(out)
        if b == max_trace_depth:
            break
        n = out.norm * jax.lax.rsqrt(
            jnp.sum(out.norm * out.norm, axis=-1, keepdims=True) + 1e-12
        )
        d_new = d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n
        o_new = o + d * out.dpt[..., None]
        spec_b = out.aux[..., 0] if scene_has_spec else jnp.zeros_like(out.acc)
        bounce_m = (spec_b > specular_threshold) & (out.acc > 0.5)
        m = bounce_m if m is None else (m & bounce_m)
        masks.append(m)
        o, d = o_new, d_new

    rgb = bounces[-1].rgb
    for b in range(max_trace_depth - 1, -1, -1):
        s = jnp.clip(bounces[b].aux[..., :1], 0.0, 1.0) if scene_has_spec \
            else jnp.zeros_like(bounces[b].rgb[..., :1])
        mixed = (1.0 - s) * bounces[b].rgb + s * rgb
        rgb = jnp.where(masks[b][..., None], mixed, bounces[b].rgb)
    return bounces[0]._replace(rgb=rgb), bounces
