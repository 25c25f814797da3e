"""PointPlanes (R4DV) family: dynamic point rendering — forward sanity and
photometric fitting of a moving point cluster across frames."""
import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.point_planes import (
    PointPlanesConfig,
    make_point_planes_train_step,
    point_planes_forward,
)
from envgs_tpu.utils.camera import make_camera
import pytest


def _cam(H=48, W=48, f=55.0):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    # camera at z=-2 looking +z at the origin-centered unit box
    return make_camera(H, W, K, np.eye(3, dtype=np.float32),
                       np.asarray([0, 0, 2.0], np.float32))


def _gt_cluster(t, n=80, seed=0):
    """A ball of points whose center slides along x with t. The travel is
    kept within the splat footprint so photometric position gradients
    exist at every frame (Gaussian gradients vanish past ~3 sigma — the
    same basin limitation as the reference's point optimization)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, 3)).astype(np.float32) * 0.08
    c = np.array([t - 0.5, 0.0, 0.0], np.float32) * 0.22
    return base + c


def _gt_image(cam, t, cfg):
    pts = jnp.asarray(_gt_cluster(t))
    n = pts.shape[0]
    quats = jnp.concatenate([jnp.ones((n, 1)), jnp.zeros((n, 3))], -1)
    from envgs_tpu.ops.raster3d import render_gaussians3d

    return render_gaussians3d(
        pts, quats, jnp.full((n, 3), 0.02), jnp.full((n,), 0.9),
        jnp.broadcast_to(jnp.asarray([0.9, 0.5, 0.2]), (n, 3)), cam,
        backend="pallas_interp", pair_cap=2 ** 12,
    ).rgb


@pytest.mark.slow
def test_forward_and_motion_fit():
    # oracle backend: exact + faster than interpreted kernels at 80 points.
    # radius_shift=0 starts radii mid-range (the -5 default needs long
    # training to grow past radius_min)
    cfg = PointPlanesConfig(n_frames=4, raster_backend="ref",
                            pair_cap=2 ** 12, radius_max=0.05,
                            radius_shift=0.0, resd_scale=0.3, sh_deg=1)
    cam = _cam()
    # init points near the t=0.5 cluster (the R4DV visual-hull init role)
    rng = np.random.default_rng(1)
    init_pts = (_gt_cluster(0.5)
                + rng.normal(size=(80, 3)).astype(np.float32) * 0.05)

    init, step = make_point_planes_train_step(cfg, cam, lr=5e-3)
    params, opt_state = init(jax.random.PRNGKey(0), init_pts)

    out = point_planes_forward(cfg, params, 0.0, cam)
    assert out.rgb.shape == (48, 48, 3)
    assert bool(jnp.isfinite(out.rgb).all())

    ts = [0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0]
    targets = [_gt_image(cam, t, cfg) for t in ts]
    assert float(targets[0].std()) > 0.02
    # the two end frames must actually differ (motion to learn)
    assert float(jnp.abs(targets[0] - targets[-1]).max()) > 0.3

    hist = []
    K, R, T = jnp.asarray(cam.K), cam.R, cam.T
    for it in range(400):
        i = it % 4
        params, opt_state, aux = step(params, opt_state,
                                      jnp.asarray(ts[i]), K, R, T,
                                      targets[i])
        hist.append(float(aux["psnr"]))
    first = float(np.mean(hist[:4]))
    last = float(np.mean(hist[-4:]))
    assert np.isfinite(last) and last > first + 2.0, (first, last)

    # the learned displacement tracks the motion: rendered frames at the
    # two ends match their own targets better than the opposite ends
    for i, j in [(0, 3), (3, 0)]:
        out = point_planes_forward(cfg, params, ts[i], cam)
        err_own = float(jnp.mean((out.rgb - targets[i]) ** 2))
        err_other = float(jnp.mean((out.rgb - targets[j]) ** 2))
        assert err_own < 0.8 * err_other, (i, err_own, err_other)
