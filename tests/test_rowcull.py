"""Per-tile-row snug culling: conservativeness w.r.t. the alpha floor.

The binning-level row cull (ops/common.snug_row_interval at ROWCULL_LEVEL)
may only drop (splat, tile) pairs whose every pixel is below the 1/255
alpha floor — i.e. pairs that contribute exactly zero in the blend. These
tests sweep random anisotropic splats and assert no live pixel (rho <=
2 ln 255) ever falls outside the culled tile interval, for both the surfel
(projective conic) and gauss3d (EWA conic) pipelines.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from envgs_tpu.ops.common import (
    ROWCULL_LOWPASS_R,
    prepare_splats,
    snug_row_interval,
    splat_response,
)
from envgs_tpu.ops.raster3d_ref import prepare_splats3d
from envgs_tpu.utils.camera import make_camera

H, W = 160, 192
LIVE_RHO = 2.0 * np.log(255.0)


def _cam():
    K = np.array([[200, 0, W / 2], [0, 200, H / 2], [0, 0, 1]], np.float32)
    return make_camera(H, W, K, np.eye(3, dtype=np.float32),
                       np.zeros(3, np.float32))


def _grids():
    jj, ii = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    tyb = (np.floor(ii.ravel() / 16) * 16).astype(np.float32)
    xt16 = (np.floor(jj.ravel() / 16) * 16).astype(np.float32)
    return jnp.asarray(jj.ravel()), jnp.asarray(ii.ravel()), \
        jnp.asarray(tyb), xt16


def test_rowcull_conservative_surfel():
    rng = np.random.default_rng(3)
    P = 60
    means = np.concatenate(
        [rng.normal(size=(P, 2)) * 0.8, rng.random((P, 1)) * 5 + 1.5], -1
    ).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    scales = (rng.random((P, 2)) * 0.08 + 0.004).astype(np.float32)
    cam = _cam()
    prep = prepare_splats(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.ones((P,)), jnp.ones((P, 3)), cam,
    )
    pxf, pyf, tyb, xt16 = _grids()

    @jax.jit
    def viol(i):
        G, _ = splat_response(prep.tmat[i], prep.center_pix[i], pxf, pyf)
        rho = -2.0 * jnp.log(jnp.maximum(G, 1e-30))
        live = rho <= LIVE_RHO
        lo, hi = snug_row_interval(prep.center_pix[i], prep.rowcull[i],
                                   tyb, tyb + 15.0, ROWCULL_LOWPASS_R)
        inside = (xt16 + 15.0 >= lo) & (xt16 <= hi)
        return jnp.sum(live & ~inside & prep.valid[i])

    total = sum(int(viol(i)) for i in range(P))
    assert total == 0


def test_rowcull_conservative_gauss3d():
    rng = np.random.default_rng(5)
    P = 60
    means = np.concatenate(
        [rng.normal(size=(P, 2)) * 0.8, rng.random((P, 1)) * 5 + 1.5], -1
    ).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    scales = (rng.random((P, 3)) * 0.08 + 0.004).astype(np.float32)
    cam = _cam()
    prep = prepare_splats3d(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.ones((P,)), jnp.ones((P, 3)), cam,
    )
    pxf, pyf, tyb, xt16 = _grids()

    @jax.jit
    def viol(i):
        cn = prep.conic[i]
        dx = pxf - prep.center_pix[i, 0]
        dy = pyf - prep.center_pix[i, 1]
        rho = cn[0] * dx * dx + cn[2] * dy * dy + 2.0 * cn[1] * dx * dy
        live = rho <= LIVE_RHO
        # gauss3d conic already includes the 2D dilation: no circle union
        lo, hi = snug_row_interval(prep.center_pix[i], prep.rowcull[i],
                                   tyb, tyb + 15.0, 0.0)
        inside = (xt16 + 15.0 >= lo) & (xt16 <= hi)
        return jnp.sum(live & ~inside & prep.valid[i])

    total = sum(int(viol(i)) for i in range(P))
    assert total == 0


@pytest.mark.slow
def test_rowcull_actually_culls():
    """Sanity: for elongated splats the rowcull interval is strictly
    tighter than the AABB rect (pairs drop)."""
    rng = np.random.default_rng(7)
    P = 40
    means = np.concatenate(
        [rng.normal(size=(P, 2)) * 0.8, rng.random((P, 1)) * 5 + 1.5], -1
    ).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    scales = np.stack(
        [np.full(P, 0.12), np.full(P, 0.008)], -1
    ).astype(np.float32)  # 15:1 anisotropic
    cam = _cam()
    prep = prepare_splats(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.ones((P,)), jnp.ones((P, 3)), cam,
    )
    pxf, pyf, tyb, xt16 = _grids()
    rect = culled = 0
    for i in range(P):
        if not bool(prep.valid[i]):
            continue
        cx, cy = map(float, prep.center_pix[i])
        ex, ey = map(float, prep.ext[i])
        in_rect = (np.abs(np.asarray(pxf) - cx) <= ex + 16) & \
                  (np.abs(np.asarray(pyf) - cy) <= ey + 16)
        lo, hi = snug_row_interval(prep.center_pix[i], prep.rowcull[i],
                                   tyb, tyb + 15.0, ROWCULL_LOWPASS_R)
        inside = (xt16 + 15.0 >= np.asarray(lo)) & (xt16 <= np.asarray(hi))
        rect += int(in_rect.sum())
        culled += int((in_rect & inside).sum())
    assert culled < 0.8 * rect, (culled, rect)


def test_tile_stable_sort_32bit_packed_path():
    """The 32-bit packed key (sign-bit XOR trick) must reproduce the stable
    pair sort exactly at the production bit widths (13 tile bits + 19 rank
    bits) including keys with the sign bit set."""
    import jax
    import jax.numpy as jnp
    from envgs_tpu.ops.binning import tile_stable_sort

    rng = np.random.default_rng(0)
    P = 300_000          # 19 bits
    num_tiles = 6435     # 13 bits -> nbits == 32
    n = 4096
    tid = jnp.asarray(rng.integers(0, num_tiles + 1, n), jnp.int32)
    # gid ascending within the array (depth-major generation invariant)
    gid = jnp.sort(jnp.asarray(rng.integers(0, P, n), jnp.int32))
    t_ref, g_ref = jax.lax.sort((tid, gid), num_keys=1, is_stable=True)
    t_pk, g_pk = tile_stable_sort(tid, gid, num_tiles, P)
    np.testing.assert_array_equal(np.asarray(t_pk), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(g_pk), np.asarray(g_ref))
