import jax
import jax.numpy as jnp
import numpy as np
import pytest

from envgs_tpu.utils.transforms import quat_to_rotmat, surfel_frame, normalize, reflect, affine_inverse
from envgs_tpu.utils.camera import make_camera, get_rays
from envgs_tpu.utils.sh import eval_sh, eval_sh_color, rgb2sh0, sh02rgb, C0


def test_quat_to_rotmat_identity():
    R = quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_quat_to_rotmat_orthonormal():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_surfel_frame_cross():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    tu, tv, n = surfel_frame(jnp.asarray(q))
    np.testing.assert_allclose(np.cross(tu, tv), np.asarray(n), atol=1e-5)


def test_reflect():
    d = jnp.array([1.0, -1.0, 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(reflect(d, n), [1.0, 1.0, 0.0], atol=1e-6)


def test_affine_inverse():
    rng = np.random.default_rng(2)
    q = rng.normal(size=4).astype(np.float32)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = R
    m[:3, 3] = [1, 2, 3]
    inv = np.asarray(affine_inverse(jnp.asarray(m)))
    np.testing.assert_allclose(inv @ m, np.eye(4), atol=1e-5)


def _toy_cam(H=64, W=96):
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    T = np.zeros(3, np.float32)
    return make_camera(H, W, K, R, T, znear=0.01, zfar=100.0)


def test_projection_roundtrip():
    """pix_from_world must agree with plain K-projection for points in front,
    including off-center principal points."""
    H, W = 64, 96
    K = np.array([[100.0, 0, W / 2 + 3.7], [0, 100.0, H / 2 - 1.2], [0, 0, 1]],
                 np.float32)
    cam = make_camera(H, W, K, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    pts = np.array([[0.1, -0.2, 2.0], [0.5, 0.3, 5.0]], np.float32)
    M = np.asarray(cam.pix_from_world)
    hom = np.concatenate([pts, np.ones((2, 1), np.float32)], -1)
    proj = hom @ M.T
    xy = proj[:, :2] / proj[:, 2:]
    # K-projection puts pixel centers at (u+0.5); the rasterizer samples at
    # integer coords, so K-projection - 0.5 must match exactly.
    Kp = (pts / pts[:, 2:]) @ np.asarray(cam.K).T
    np.testing.assert_allclose(xy, Kp[:, :2] - 0.5, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(proj[:, 2], pts[:, 2], rtol=1e-5)


def test_camera_crop_rows():
    """A row-band camera must reproduce the parent's projection shifted."""
    cam = _toy_cam()
    band = cam.crop_rows(16, 32)
    pts = np.array([[0.1, -0.05, 3.0]], np.float32)
    hom = np.concatenate([pts, np.ones((1, 1), np.float32)], -1)
    full = hom @ np.asarray(cam.pix_from_world).T
    part = hom @ np.asarray(band.pix_from_world).T
    np.testing.assert_allclose(
        part[:, 1] / part[:, 2], full[:, 1] / full[:, 2] - 16, atol=1e-4
    )


def test_rays_hit_projection():
    """Ray through pixel (i, j) must project back to that pixel."""
    cam = _toy_cam()
    o, d = get_rays(cam)
    pts = np.asarray(o)[None, None] + 3.0 * np.asarray(d)  # depth 3 points
    M = np.asarray(cam.pix_from_world)
    hom = np.concatenate([pts, np.ones(pts.shape[:2] + (1,), np.float32)], -1)
    proj = hom @ M.T
    xy = proj[..., :2] / proj[..., 2:]
    jj, ii = np.meshgrid(np.arange(cam.W), np.arange(cam.H))
    np.testing.assert_allclose(xy[..., 0], jj, atol=1e-3)
    np.testing.assert_allclose(xy[..., 1], ii, atol=1e-3)
    np.testing.assert_allclose(proj[..., 2], 3.0, rtol=1e-5)  # z-depth scaling


def test_sh_deg0_constant():
    sh = jnp.zeros((5, 3, 16)).at[:, :, 0].set(1.0)
    dirs = normalize(jnp.asarray(np.random.default_rng(3).normal(size=(5, 3))))
    out = eval_sh(3, sh, dirs)
    np.testing.assert_allclose(out, C0, rtol=1e-6)


def test_sh_rgb_roundtrip():
    rgb = jnp.asarray([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(sh02rgb(rgb2sh0(rgb)), rgb, atol=1e-6)


def test_sh_higher_degrees_orthogonality():
    """Integrating SH_l * SH_0 over many random dirs ~ 0 for l > 0."""
    rng = np.random.default_rng(4)
    dirs = normalize(jnp.asarray(rng.normal(size=(20000, 3)).astype(np.float32)))
    for idx in [1, 4, 9, 16]:
        sh = jnp.zeros((1, 1, 25)).at[0, 0, idx].set(1.0)
        vals = eval_sh(4, jnp.broadcast_to(sh, (20000, 1, 25)), dirs)
        assert abs(float(vals.mean())) < 0.02


def test_eval_sh_4d():
    """4D SH = spatial SH tensored with a cosine temporal basis
    (sh_utils.py:731-1097): reduces to static SH at deg_t=0, is exactly
    periodic in l, and block k carries the cos(2 pi k t / l) weight."""
    import numpy as np
    import jax.numpy as jnp

    from envgs_tpu.utils.sh import eval_sh, eval_sh_4d, num_sh_coeffs_4d

    rng = np.random.default_rng(0)
    P, deg, deg_t = 64, 3, 2
    K4 = num_sh_coeffs_4d(deg, deg_t)
    assert K4 == 48
    sh = jnp.asarray(rng.standard_normal((P, 3, K4)), jnp.float32)
    dirs = rng.standard_normal((P, 3))
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True),
                       jnp.float32)
    t = jnp.asarray(rng.uniform(0, 1, (P,)), jnp.float32)

    # deg_t=0 == static SH on the first block
    np.testing.assert_allclose(
        np.asarray(eval_sh_4d(deg, 0, sh[..., :16], dirs, t)),
        np.asarray(eval_sh(deg, sh[..., :16], dirs)), rtol=1e-6)
    # periodicity in l
    a = eval_sh_4d(deg, deg_t, sh, dirs, t, l=0.5)
    b = eval_sh_4d(deg, deg_t, sh, dirs, t + 0.5, l=0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # block-k weighting: sh with only block 1 live scales as cos(2 pi t / l)
    sh1 = jnp.zeros_like(sh).at[..., 16:32].set(sh[..., 16:32])
    v = eval_sh_4d(deg, deg_t, sh1, dirs, t)
    base = eval_sh(deg, sh[..., 16:32], dirs)
    np.testing.assert_allclose(
        np.asarray(v),
        np.asarray(base * jnp.cos(2 * jnp.pi * t)[:, None]), rtol=1e-4,
        atol=1e-5)


def test_chunkify():
    """chunkify pads the ray axis to a chunk multiple, lax.maps the fn, and
    crops the merged outputs (chunk_utils.py:6-104 semantics)."""
    import jax.numpy as jnp
    import numpy as np

    from envgs_tpu.utils.chunk import chunkify

    @chunkify(chunk_size=8)
    def fn(rays, scale):
        return {"a": rays * scale, "b": rays.sum(-1)}

    rays = jnp.arange(3 * 19, dtype=jnp.float32).reshape(19, 3)
    out = fn(rays, 2.0)
    np.testing.assert_allclose(np.asarray(out["a"]), np.asarray(rays) * 2.0)
    assert out["b"].shape == (19,)
    np.testing.assert_allclose(np.asarray(out["b"]),
                               np.asarray(rays).sum(-1))


@pytest.mark.slow
def test_ssim_custom_vjp_matches_autodiff():
    """ssim's closed-form backward (fused-ssim recipe) must match plain
    autodiff through the filter chain to float precision."""
    from envgs_tpu.ops.losses import (
        _gaussian_window,
        _ssim_fields,
        _ssim_from_fields,
        ssim,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((40, 52, 3), np.float32))
    y = jnp.asarray(rng.random((40, 52, 3), np.float32))

    def ssim_autodiff(a, b, win_size=11, sigma=1.5, max_val=1.0):
        win = _gaussian_window(win_size, sigma)
        return _ssim_from_fields(_ssim_fields(a, b, win),
                                 (0.01 * max_val) ** 2,
                                 (0.03 * max_val) ** 2)

    assert float(jnp.abs(ssim(x, y) - ssim_autodiff(x, y))) == 0.0
    for args in ((), (7, 1.0, 2.0)):
        g0 = jax.grad(ssim_autodiff, argnums=(0, 1))(x, y, *args)
        g1 = jax.grad(ssim, argnums=(0, 1))(x, y, *args)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-8)
