"""Aux supervisor family: property tests against the reference formulas
(easyvolcap/models/supervisors/*, easyvolcap/utils/loss_utils.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.train.aux_supervisors import (
    AuxLossConfig,
    bce_loss,
    compute_aux_losses,
    compute_scale_and_shift,
    curvature_loss,
    depth_loss,
    eikonal,
    elastic_crit,
    flow_loss,
    inner_outer,
    lossfun_distortion,
    lossfun_outer,
    miou_loss,
    motion_consistency_loss,
    occupancy_entropy,
    plane_smoothness,
    plane_tv,
    proposal_loss,
    scale_invariant_log_loss,
    scale_shift_invariant_loss,
    smoothl1,
)


def test_depth_losses_zero_at_equality():
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.random((8, 8)).astype(np.float32) + 0.5)
    for kind in ("smoothl1", "l1", "l2", "silog"):
        v = float(depth_loss(d, d, kind=kind))
        assert abs(v) < 1e-5, kind


def test_smoothl1_matches_torch_formula():
    x = jnp.asarray([0.0, 0.5, 2.0, -3.0])
    y = jnp.zeros(4)
    # elementwise: 0, 0.125, 1.5, 2.5 -> mean 1.03125
    assert abs(float(smoothl1(x, y)) - 1.03125) < 1e-6


def test_depth_mask_defaults_to_nonzero_gt():
    """depth_supervisor.py:71 — zero-depth GT pixels are ignored."""
    pred = jnp.ones((4, 4))
    gt = jnp.zeros((4, 4)).at[0, 0].set(1.0)
    assert abs(float(depth_loss(pred, gt, kind="l1"))) < 1e-6
    gt2 = gt.at[0, 1].set(3.0)
    assert abs(float(depth_loss(pred, gt2, kind="l1")) - 1.0) < 1e-6


def test_scale_shift_solution_exact_on_affine():
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.random((16, 16)).astype(np.float32))
    tgt = 2.5 * pred - 0.7
    m = jnp.ones_like(pred)
    s, t = compute_scale_and_shift(pred, tgt, m)
    assert abs(float(s) - 2.5) < 1e-4 and abs(float(t) + 0.7) < 1e-4
    # and the ssi loss is invariant to affine disturbance of pred
    v = float(scale_shift_invariant_loss(pred, tgt, m))
    assert v < 1e-5


def test_silog_scale_invariant():
    rng = np.random.default_rng(2)
    pred = jnp.asarray(rng.random((8, 8)).astype(np.float32) + 0.5)
    tgt = jnp.asarray(rng.random((8, 8)).astype(np.float32) + 0.5)
    m = jnp.ones_like(pred)
    a = float(scale_invariant_log_loss(pred, tgt, m, beta=0.0))
    b = float(scale_invariant_log_loss(7.0 * pred, tgt, m, beta=0.0))
    assert abs(a - b) < 1e-4


def test_flow_loss_weighted():
    f = jnp.ones((4, 4, 2))
    g = jnp.zeros((4, 4, 2))
    w = jnp.zeros((4, 4, 1)).at[0, 0].set(1.0)
    assert abs(float(flow_loss(f, g)) - 1.0) < 1e-6
    # torch broadcast semantics (flow_supervisor.py:27): the (H, W, 1)
    # weight broadcasts over both flow channels in the product but is
    # summed un-broadcast in the denominator -> 2.0 here
    assert abs(float(flow_loss(f, g, w)) - 2.0) < 1e-4


def test_distortion_zero_for_delta_histogram():
    """A single occupied zero-width-adjacent bin has ~zero distortion."""
    t = jnp.linspace(0.0, 1.0, 9)[None]
    w = jnp.zeros((1, 8)).at[0, 3].set(1.0)
    v = float(jnp.sum(lossfun_distortion(t, w)))
    # only the intra-interval term survives: w^2 * dt / 3 = 0.125/3
    assert abs(v - 0.125 / 3.0) < 1e-6


def test_distortion_grows_with_spread():
    t = jnp.linspace(0.0, 1.0, 9)[None]
    tight = jnp.zeros((1, 8)).at[0, 3].set(1.0)
    spread = jnp.full((1, 8), 1.0 / 8.0)
    assert float(jnp.sum(lossfun_distortion(t, spread))) > float(
        jnp.sum(lossfun_distortion(t, tight)))


def test_inner_outer_identity_partition():
    """On its own bins, the outer measure straddles adjacent bins (edges
    land exactly on edges, so the covering interval spans two bins) and the
    inner measure is zero — matching the reference searchsorted semantics
    (prop_utils.py:99-115). The envelope property outer >= w always holds."""
    t = jnp.linspace(0.0, 1.0, 6)[None]
    w = jnp.asarray([[0.1, 0.3, 0.2, 0.25, 0.15]])
    inner, outer = inner_outer(t, t, w)
    expect_outer = np.asarray([[0.4, 0.5, 0.45, 0.4, 0.15]])
    np.testing.assert_allclose(np.asarray(outer), expect_outer, atol=1e-6)
    np.testing.assert_allclose(np.asarray(inner), 0.0, atol=1e-6)
    assert np.all(np.asarray(outer) >= np.asarray(w) - 1e-6)
    # self-envelope -> zero outer loss
    v = float(jnp.sum(lossfun_outer(t, w, t, w)))
    assert v < 1e-8


def test_lossfun_outer_zero_when_enveloped():
    """Proposal weights covering the nerf histogram -> zero envelope loss
    (proposal_supervisor.py:40-50)."""
    t = jnp.linspace(0.0, 1.0, 9)[None]
    w = jnp.full((1, 8), 0.1)
    t_env = jnp.linspace(0.0, 1.0, 5)[None]
    w_env = jnp.full((1, 4), 0.5)  # generous envelope
    v = float(jnp.sum(lossfun_outer(t, w, t_env, w_env)))
    assert v < 1e-8
    # starving envelope -> positive loss
    v2 = float(jnp.sum(lossfun_outer(t, w, t_env, jnp.zeros((1, 4)))))
    assert v2 > 1e-3


def test_proposal_loss_stats_and_stopgrad():
    t = jnp.linspace(0.0, 1.0, 9)[None]
    w = jnp.full((1, 8), 0.1)

    def f(wv):
        total, _ = proposal_loss(t, wv, [t], [jnp.zeros((1, 8))],
                                 prop_loss_weight=1.0)
        return total

    g = jax.grad(f)(w)
    # nerf histogram is stop-gradiented in the envelope term
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-8)


def test_plane_tv_flat_is_zero():
    flat = jnp.ones((2, 3, 16, 16))
    assert float(plane_tv(flat)) == 0.0
    ramp = jnp.tile(jnp.arange(16.0)[None, :], (16, 1))[None, None]
    assert float(plane_tv(ramp)) > 0.0


def test_plane_smoothness_linear_time_is_zero():
    lin = jnp.arange(10.0)[None, None, :] * 3.0 + 1.0
    assert abs(float(plane_smoothness(lin))) < 1e-10
    quad = (jnp.arange(10.0) ** 2)[None, None, :]
    assert float(plane_smoothness(quad)) > 0.1


def test_eikonal_zero_for_unit_gradients():
    g = jnp.stack([jnp.ones(10), jnp.zeros(10), jnp.zeros(10)], -1)
    assert abs(float(eikonal(g))) < 1e-8
    assert float(eikonal(2.0 * g)) > 0.5


def test_curvature_finite_difference_quadratic():
    """sdf = x^2 has Laplacian 2 along x; taps at +-delta recover it."""
    delta = 0.01
    x = jnp.asarray([0.3, -0.2])
    sdf = x ** 2
    taps = jnp.stack(
        [jnp.stack([(x + delta) ** 2, (x - delta) ** 2], -1),
         jnp.stack([sdf, sdf], -1),
         jnp.stack([sdf, sdf], -1)], axis=-2)  # (N, 3, 2)
    v = float(curvature_loss(sdf, taps, delta))
    assert abs(v - 2.0 / 3.0) < 1e-2  # mean |curv| over 3 axes = 2/3


def test_elastic_crit_zero_at_rotation():
    """Rigid warps (singular values 1) carry no elastic energy."""
    th = 0.4
    R = jnp.asarray([[np.cos(th), -np.sin(th), 0],
                     [np.sin(th), np.cos(th), 0],
                     [0, 0, 1.0]])
    assert float(elastic_crit(R[None])[0]) < 1e-8
    S = jnp.diag(jnp.asarray([2.0, 1.0, 1.0]))
    assert float(elastic_crit(S[None])[0]) > 1e-5


def test_miou_and_bce():
    x = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    assert abs(float(miou_loss(x, x))) < 1e-6
    y = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    assert float(miou_loss(x, y)) > 0.99
    assert float(bce_loss(x, x)) < 1e-5
    assert float(bce_loss(x, y)) > 5.0


def test_occupancy_entropy():
    assert abs(float(occupancy_entropy(jnp.asarray([1.0, 1.0])))) < 1e-6
    assert float(occupancy_entropy(jnp.asarray([0.5, 0.5]))) > 0.3


def test_motion_consistency_agreement():
    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.random((32, 3)).astype(np.float32) * 0.05)
    flow = jnp.tile(jnp.asarray([[0.1, -0.2, 0.3]]), (32, 1))
    mask = jnp.ones((32,))
    v = float(motion_consistency_loss(xyz, flow, mask, K=4, radius=0.5))
    assert v < 1e-6
    # one dissenting point raises the loss
    flow2 = flow.at[0].set(jnp.asarray([5.0, 5.0, 5.0]))
    assert float(motion_consistency_loss(xyz, flow2, mask, K=4,
                                         radius=0.5)) > 0.1


def test_compute_aux_losses_dispatch_and_gating():
    rng = np.random.default_rng(4)
    dpt = jnp.asarray(rng.random((8, 8)).astype(np.float32) + 0.5)
    out = {"dpt_map": dpt, "gradients": jnp.ones((10, 3)),
           "acc_map": jnp.ones((8, 8))}
    batch = {"dpt": dpt + 0.1, "msk": jnp.ones((8, 8))}
    cfg = AuxLossConfig(dpt_loss_weight=1.0, eikonal_loss_weight=2.0,
                        msk_loss_weight=0.5)
    loss, stats = compute_aux_losses(cfg, out, batch)
    assert set(stats) == {"dpt_loss", "eikonal_loss", "msk_loss"}
    assert np.isfinite(float(loss))
    # zero weights -> fully disabled, no stats
    loss0, stats0 = compute_aux_losses(AuxLossConfig(), out, batch)
    assert not stats0 and float(loss0) == 0.0
    # jit-compatible (static cfg via closure)
    lj = jax.jit(lambda o, b: compute_aux_losses(cfg, o, b)[0])(out, batch)
    np.testing.assert_allclose(float(lj), float(loss), rtol=1e-6)
