"""Spacetime Gaussians (STGS/FDGS): temporal marginal + linear motion
rendered through the gauss3d kernel, maintenance over the extended params,
4D ply round-trip, and a motion-recovery training run.

Reference semantics: stgs_utils.py:63-661 (temporal params, marginal at
:209-210, reset_t at :313).
"""
import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.stgs import (
    STGSConfig,
    init_stgs_pool,
    init_stgs_state,
    load_stgs_ply,
    make_stgs_train_step,
    render_stgs,
    reset_t,
    save_stgs_ply,
    splats_at_time,
    stgs_lr_config,
)
from envgs_tpu.utils.camera import make_camera
import pytest

CFG = STGSConfig(sh_degree=1, raster_backend="pallas_interp",
                 pair_cap=2 ** 11)


def _cam(H=40, W=40, f=50.0):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return make_camera(H, W, K, np.eye(3, dtype=np.float32),
                       np.zeros(3, np.float32))


def _blob_pool(v=(0.8, 0.0, 0.0), t0=0.5, n=32, seed=0):
    rng = np.random.default_rng(seed)
    xyz = (rng.standard_normal((n, 3)) * 0.05 + [0, 0, 3.0]).astype(
        np.float32)
    colors = np.tile([[0.9, 0.3, 0.2]], (n, 1)).astype(np.float32)
    pool = init_stgs_pool(xyz, np.full(n, t0, np.float32), colors, 64, CFG)
    pool = pool._replace(params=pool.params._replace(
        motion=jnp.where(pool.stats.active[:, None],
                         jnp.asarray(v, jnp.float32)[None, :], 0.0),
        opacity=jnp.full((64, 1), 4.0),
        scaling_t=jnp.full((64, 1), np.log(0.3)),
    ))
    return pool


def _com(img):
    """Column center of mass of image brightness."""
    w = np.asarray(img).sum(-1)
    xs = np.arange(w.shape[1])
    return float((w.sum(0) * xs).sum() / max(w.sum(), 1e-8))


@pytest.mark.slow
def test_linear_motion_moves_projection():
    pool = _blob_pool(v=(0.9, 0.0, 0.0))
    cam = _cam()
    c0 = _com(render_stgs(pool, cam, jnp.asarray(0.3), CFG).rgb)
    c1 = _com(render_stgs(pool, cam, jnp.asarray(0.7), CFG).rgb)
    # dt=0.4, v=0.9, z=3, f=50 -> ~6 px shift to the right
    assert c1 - c0 > 3.0, (c0, c1)


@pytest.mark.slow
def test_temporal_marginal_gates_opacity():
    pool = _blob_pool(v=(0.0, 0.0, 0.0), t0=0.5)
    cam = _cam()
    a_near = float(render_stgs(pool, cam, jnp.asarray(0.5), CFG).alpha.max())
    a_far = float(render_stgs(pool, cam, jnp.asarray(2.0), CFG).alpha.max())
    # 5 sigma away in time: the splat should all but vanish
    assert a_near > 0.5 and a_far < 0.05, (a_near, a_far)
    _, op = splats_at_time(pool, jnp.asarray(0.5))
    assert float(op.max()) > 0.9


def test_reset_t_clamps_and_zeros_moments():
    pool = _blob_pool()
    pool = pool._replace(params=pool.params._replace(
        t=pool.params.t.at[0].set(7.0)))
    state = init_stgs_state(pool)
    mu = state.opt.mu._replace(t=jnp.ones_like(state.opt.mu.t))
    pool2, opt2 = reset_t(pool, state.opt._replace(mu=mu), 0.0, 1.0)
    assert float(pool2.params.t.max()) <= 1.0
    assert float(jnp.abs(opt2.mu.t).max()) == 0.0


def test_4d_ply_roundtrip(tmp_path):
    pool = _blob_pool(v=(0.3, -0.2, 0.1))
    path = str(tmp_path / "stgs.ply")
    save_stgs_ply(pool, path)
    back = load_stgs_ply(path, cap=64, cfg=CFG)
    act = np.asarray(pool.stats.active)
    for k in ("xyz", "t", "scaling_t", "motion", "opacity", "scaling",
              "rotation"):
        a = np.asarray(getattr(pool.params, k))[act]
        b = np.asarray(getattr(back.params, k))[np.asarray(
            back.stats.active)]
        np.testing.assert_allclose(b, a, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_training_recovers_motion():
    """Supervise a moving blob at several times; the zero-init motion param
    must move toward the true velocity (cf. memory: never supervise motion
    through a saturating head — here motion is a direct parameter)."""
    cam = _cam(32, 32, f=40.0)
    true = _blob_pool(v=(0.6, 0.0, 0.0), n=16, seed=1)
    times = [0.2, 0.4, 0.6, 0.8]
    gts = [render_stgs(true, cam, jnp.asarray(t), CFG).rgb for t in times]

    init = true._replace(params=true.params._replace(
        motion=jnp.zeros_like(true.params.motion)))
    state = init_stgs_state(init)
    lr = stgs_lr_config()._replace(motion=0.05, xyz=0.0, xyz_lr_init=0.0,
                                   xyz_lr_final=0.0)
    step = jax.jit(make_stgs_train_step(CFG, cam, lr, donate=False))
    K, R, T = cam.K, cam.R, cam.T
    for it in range(60):
        i = it % len(times)
        state, aux = step(state, K, R, T, jnp.asarray(times[i]), gts[i],
                          jnp.asarray(it))
    mot = np.asarray(state.pool.params.motion)[np.asarray(
        state.pool.stats.active)]
    assert mot[:, 0].mean() > 0.05, mot[:, 0].mean()
    assert abs(mot[:, 1]).mean() < mot[:, 0].mean()


@pytest.mark.slow
def test_4dsh_static_block_equivalence():
    """With sh_degree_t > 0 but zero temporal coefficients, the 4D-SH
    render equals the static-SH render exactly (the k=0 block IS the
    static SH, eval_shfs_4d semantics sh_utils.py:731-1097)."""
    cfg4 = CFG._replace(sh_degree_t=2)
    pool4 = _blob_pool_cfg(cfg4)
    pool3 = _blob_pool_cfg(CFG)
    cam = _cam()
    out4 = render_stgs(pool4, cam, jnp.asarray(0.5), cfg4)
    out3 = render_stgs(pool3, cam, jnp.asarray(0.5), CFG)
    np.testing.assert_allclose(np.asarray(out4.rgb), np.asarray(out3.rgb),
                               atol=1e-6)


def _blob_pool_cfg(cfg, v=(0.0, 0.0, 0.0), t0=0.5, n=32, seed=0):
    rng = np.random.default_rng(seed)
    xyz = (rng.standard_normal((n, 3)) * 0.05 + [0, 0, 3.0]).astype(
        np.float32)
    colors = np.tile([[0.9, 0.3, 0.2]], (n, 1)).astype(np.float32)
    pool = init_stgs_pool(xyz, np.full(n, t0, np.float32), colors, 64, cfg)
    return pool._replace(params=pool.params._replace(
        motion=jnp.where(pool.stats.active[:, None],
                         jnp.asarray(v, jnp.float32)[None, :], 0.0),
        opacity=jnp.full((64, 1), 4.0),
        scaling_t=jnp.full((64, 1), np.log(10.0)),  # no temporal fade
    ))


@pytest.mark.slow
def test_4dsh_recovers_time_varying_color():
    """A deg_t=1 STGS model recovers a scene whose color oscillates in
    time (GT rendered from known 4D coefficients at 4 timestamps); the
    static-SH model structurally cannot and plateaus at a higher loss —
    the 4D-SH appearance claim of the STGS family (VERDICT r4 item 8)."""
    cfg4 = STGSConfig(sh_degree=1, sh_degree_t=1,
                      raster_backend="pallas_interp", pair_cap=2 ** 11)
    cam = _cam()
    # GT: blob whose k=1 temporal block carries a strong red<->blue swing
    gt_pool = _blob_pool_cfg(cfg4)
    K = (cfg4.sh_degree + 1) ** 2
    fr = np.array(gt_pool.params.features_rest)
    fr[:, K - 1, 0] = 0.8   # cos-harmonic red
    fr[:, K - 1, 2] = -0.8  # cos-harmonic blue (opposite phase)
    gt_pool = gt_pool._replace(
        params=gt_pool.params._replace(features_rest=jnp.asarray(fr)),
        stats=gt_pool.stats._replace(
            sh_degree=jnp.asarray(cfg4.sh_degree, jnp.int32)))
    times = [0.1, 0.35, 0.6, 0.85]
    gts = [np.asarray(render_stgs(gt_pool, cam, jnp.asarray(t), cfg4).rgb)
           for t in times]
    # the GT genuinely varies over time
    assert np.max(np.abs(gts[0] - gts[2])) > 0.2

    def fit(cfg):
        pool = _blob_pool_cfg(cfg)
        pool = pool._replace(stats=pool.stats._replace(
            sh_degree=jnp.asarray(cfg.sh_degree, jnp.int32)))
        state = init_stgs_state(pool)
        lr = stgs_lr_config()._replace(features_dc=0.01, features_rest=0.01)
        step = jax.jit(make_stgs_train_step(cfg, cam, lr, donate=False))
        last = None
        for it in range(120):
            t_i = it % len(times)
            state, stats = step(state, cam.K, cam.R, cam.T,
                                jnp.asarray(times[t_i]),
                                jnp.asarray(gts[t_i]), jnp.asarray(it))
            last = float(stats["loss"])
        # loss on all four timestamps with the final params
        tot = 0.0
        for t_i, t in enumerate(times):
            out = render_stgs(state.pool, cam, jnp.asarray(t), cfg)
            tot += float(jnp.mean(jnp.abs(out.rgb - gts[t_i])))
        return tot / len(times), last

    err4, _ = fit(cfg4)
    err3, _ = fit(STGSConfig(sh_degree=1, sh_degree_t=0,
                             raster_backend="pallas_interp",
                             pair_cap=2 ** 11))
    assert err4 < 0.5 * err3, (err4, err3)
    assert err4 < 0.05, err4
