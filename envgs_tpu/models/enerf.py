"""ENeRF image-based model family: cost-volume depth + IBR appearance.

TPU-native counterpart of the reference's generalizable image-based stack
(/root/reference/easyvolcap/models/samplers/cost_volume_sampler.py +
networks/embedders/image_based_embedder.py + regressors/{feature_net,
cost_reg_net}.py — the ENeRF pipeline, CVPR'22):

1. `feature_net` — shared 2D conv encoder over source views (two strided
   levels: 16ch @ 1/2, 32ch @ 1/4 — FeatureNet semantics).
2. `cost_volume` — plane-sweep over depth hypotheses: warp source features
   to the target frustum by depth-plane homography, variance across views
   (the MVSNet/ENeRF matching cost).
3. `cost_reg` — 3D conv regularizer -> per-pixel depth distribution;
   `depth_regression` -> expected depth + std (the guided sampling interval).
4. Depth-guided sampling: `n_samples` z-values in [d-k*std, d+k*std]
   (CostVolumeSampler.n_samples semantics, coarse->fine levels).
5. IBR appearance: project samples into sources, bilinearly gather
   rgb+features, aggregate mean/var + learned per-view blend weights
   (ImageBasedEmbedder/FeatureAgg), small MLPs -> sigma + blended rgb,
   quadrature `volume_render` (models/nerf.py).

Everything is shape-static and jittable; convs are NHWC/HWIO so XLA tiles
them onto the MXU. Batches are single-target + S source views (the ENeRF
regime: batch_size 1, n_srcs 2-4).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.models.nerf import volume_render
from envgs_tpu.models.regressors import MLP
from envgs_tpu.utils.camera import Camera


# ---------------------------------------------------------------------------
# minimal conv toolkit (NHWC / HWIO; DHWC for the cost regularizer)
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout):
    w = jax.random.normal(key, (kh, kw, cin, cout)) * jnp.sqrt(
        2.0 / (kh * kw * cin))
    return [w, jnp.zeros((cout,))]


def _conv(x, p, stride=1):
    return jax.lax.conv_general_dilated(
        x, p[0], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p[1]


def _conv3_init(key, k, cin, cout, positive: bool = False):
    w = jax.random.normal(key, (k, k, k, cin, cout)) * jnp.sqrt(
        2.0 / (k ** 3 * cin))
    if positive:
        # seed the cost head positive: logits start as a smoothed mean of
        # the (non-negative) variance volume, so softmax(-logits) peaks at
        # the photoconsistent depth from step 0 (MVSNet argmin-cost prior);
        # training refines from there instead of escaping a random basin
        w = jnp.abs(w) + 1.0 / (k ** 3 * cin)
    return [w, jnp.zeros((cout,))]


def _conv3(x, p, stride=1):
    return jax.lax.conv_general_dilated(
        x, p[0], (stride, stride, stride), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + p[1]


class ENeRFConfig(NamedTuple):
    """Static hyperparameters (CostVolumeSampler defaults, two levels)."""

    feat_dims: tuple = (16, 32)  # channels @ 1/2, 1/4 (FeatureNet)
    n_planes: tuple = (64, 8)  # depth hypotheses per level
    n_samples: int = 4  # color samples around the regressed depth
    cost_dim: int = 8  # 3D regularizer width
    ibr_hidden: int = 32
    guide_sigma: float = 3.0  # sampling interval = +- guide_sigma * std
    bg_brightness: float = 0.0

    # IBR heads (the shared models/regressors.MLP: He init, relu hidden)
    @property
    def agg_net(self) -> MLP:
        f0 = self.feat_dims[0]
        return MLP(2 * (f0 + 3) + 1, self.ibr_hidden, 1, 1, skips=())

    @property
    def sig_net(self) -> MLP:
        f0 = self.feat_dims[0]
        return MLP(2 * (f0 + 3), self.ibr_hidden, 1, self.ibr_hidden,
                   skips=())

    @property
    def sig_out_net(self) -> MLP:
        return MLP(self.ibr_hidden, self.ibr_hidden, 0, 1, skips=())

    @property
    def rgb_res_net(self) -> MLP:
        return MLP(self.ibr_hidden + 3, self.ibr_hidden, 1, 3, skips=(),
                   out_actvn="tanh")


def init_enerf(cfg: ENeRFConfig, key):
    keys = jax.random.split(key, 12)
    f0, f1 = cfg.feat_dims
    params = dict(
        # feature encoder: 3 -> f0 (stride 2) -> f1 (stride 2)
        fe0=_conv_init(keys[0], 3, 3, 3, f0),
        fe0b=_conv_init(keys[1], 3, 3, f0, f0),
        fe1=_conv_init(keys[2], 3, 3, f0, f1),
        fe1b=_conv_init(keys[3], 3, 3, f1, f1),
        # cost regularizers per level (variance volume -> 1 logit)
        cr0a=_conv3_init(keys[4], 3, f1, cfg.cost_dim, positive=True),
        cr0b=_conv3_init(keys[5], 3, cfg.cost_dim, 1, positive=True),
        cr1a=_conv3_init(keys[6], 3, f0, cfg.cost_dim, positive=True),
        cr1b=_conv3_init(keys[7], 3, cfg.cost_dim, 1, positive=True),
        # IBR heads: per-view weight + sigma/rgb from aggregated features
        agg=cfg.agg_net.init(keys[8]),
        sig=cfg.sig_net.init(keys[9]),
        sig_out=cfg.sig_out_net.init(keys[10]),
        rgb_res=cfg.rgb_res_net.init(keys[11]),
    )
    return params


def feature_net(params, imgs):
    """(S, H, W, 3) -> [(S, H/2, W/2, f0), (S, H/4, W/4, f1)]."""
    x = jax.nn.relu(_conv(imgs, params["fe0"], stride=2))
    l0 = jax.nn.relu(_conv(x, params["fe0b"]))
    x = jax.nn.relu(_conv(l0, params["fe1"], stride=2))
    l1 = jax.nn.relu(_conv(x, params["fe1b"]))
    return [l0, l1]


def _scaled_K(K, sx, sy):
    K = jnp.asarray(K, jnp.float32)
    S = jnp.asarray([[sx, 0, 0], [0, sy, 0], [0, 0, 1]], jnp.float32)
    return S @ K


def _bilinear(img, x, y):
    """img (H, W, C); x/y (...,) pixel coords -> (..., C); zeros outside."""
    H, W = img.shape[:2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    v = (
        img[y0i, x0i] * ((1 - wx) * (1 - wy))[..., None]
        + img[y0i, x1i] * (wx * (1 - wy))[..., None]
        + img[y1i, x0i] * ((1 - wx) * wy)[..., None]
        + img[y1i, x1i] * (wx * wy)[..., None]
    )
    inside = ((x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1))
    return v * inside[..., None]


def _project(pts, K, R, T):
    """World points (..., 3) -> (x, y, z) in a camera."""
    p = pts @ R.T + T
    z = jnp.maximum(p[..., 2], 1e-6)
    x = p[..., 0] / z * K[0, 0] + K[0, 2]
    y = p[..., 1] / z * K[1, 1] + K[1, 2]
    return x, y, p[..., 2]


def _backproject(cam: Camera, depth, sx=1.0, sy=1.0):
    """Pixel grid at scale (sx, sy) + depth (..., h, w) -> world (..., h, w, 3)."""
    h, w = depth.shape[-2:]
    K = _scaled_K(cam.K, sx, sy)
    jj, ii = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    d = jnp.stack([(jj - K[0, 2]) / K[0, 0], (ii - K[1, 2]) / K[1, 1],
                   jnp.ones_like(jj)], -1)
    p_view = d * depth[..., None]
    return (p_view - cam.T) @ cam.R  # R^T (p - T): view -> world


def cost_volume(feat_src, src_cams, tgt_cam: Camera, depth_hyps, scale):
    """Variance plane-sweep volume.

    feat_src (S, h, w, C) at `scale`; depth_hyps (D, h, w) or (D, 1, 1)
    target-view z-depths -> (D, h, w, C) variance across views."""
    S = feat_src.shape[0]
    D = depth_hyps.shape[0]
    h, w = feat_src.shape[1:3]
    dh = jnp.broadcast_to(depth_hyps, (D, h, w))
    pts = _backproject(tgt_cam, dh, scale, scale)  # (D, h, w, 3)

    def per_src(feat, cam):
        K = _scaled_K(cam.K, scale, scale)
        x, y, _ = _project(pts, K, cam.R, cam.T)
        Hs, Ws = feat.shape[:2]
        inside = ((x >= 0) & (x <= Ws - 1) & (y >= 0) & (y <= Hs - 1))
        return _bilinear(feat, x, y), inside  # (D, h, w, C), (D, h, w)

    ws = [per_src(feat_src[i], src_cams[i]) for i in range(S)]
    warped = jnp.stack([w for w, _ in ws])  # (S, D, h, w, C)
    valid = jnp.stack([m for _, m in ws]).astype(jnp.float32)  # (S, D, h, w)
    # masked variance over IN-BOUNDS views only: all-out-of-bounds warps
    # must not look like a perfect (zero-variance) match — hypotheses with
    # fewer than 2 observing views get a large constant cost instead
    cnt = jnp.sum(valid, axis=0)[..., None]
    cnt_s = jnp.maximum(cnt, 1.0)
    vm = valid[..., None]
    mean = jnp.sum(warped * vm, axis=0) / cnt_s
    var = jnp.sum((warped ** 2) * vm, axis=0) / cnt_s - mean ** 2
    return jnp.where(cnt >= 2.0, var, 10.0)


def depth_regression(params, cr_keys, volume, depth_hyps):
    """3D conv regularizer -> softmax depth distribution -> (depth, std)."""
    a, b = cr_keys
    x = jax.nn.relu(_conv3(volume[None], params[a]))
    logits = _conv3(x, params[b])[0, ..., 0]  # (D, h, w)
    prob = jax.nn.softmax(-logits, axis=0)
    dh = jnp.broadcast_to(depth_hyps, prob.shape)
    depth = jnp.sum(prob * dh, axis=0)
    var = jnp.sum(prob * (dh - depth[None]) ** 2, axis=0)
    return depth, jnp.sqrt(jnp.clip(var, 1e-8, None))


def _upsample(img, H, W):
    """Nearest-neighbor upsample (h, w) -> (H, W)."""
    h, w = img.shape[-2:]
    yi = jnp.clip((jnp.arange(H) * h // H), 0, h - 1)
    xi = jnp.clip((jnp.arange(W) * w // W), 0, w - 1)
    return img[..., yi[:, None], xi[None, :]]


class ENeRFOutput(NamedTuple):
    rgb_map: jnp.ndarray  # (H, W, 3)
    dpt_map: jnp.ndarray  # (H, W)
    acc_map: jnp.ndarray  # (H, W)
    depth_coarse: jnp.ndarray  # (h/4, w/4) cost-volume depth
    depth_std: jnp.ndarray  # (h/4, w/4)
    rgb_coarse: jnp.ndarray | None  # (h/4, w/4, 3) level-0 render


def _ibr_render(cfg, params, tgt_cam, src_imgs, src_cams, f0, depth, std,
                near, far, scale):
    """Depth-guided sampling + IBR blend + quadrature render at `scale`.

    depth/std (h, w) at scale; returns volume_render dict at that scale.
    The reference renders every level (`render_if=[True, True]`) — the
    coarse render supervises the cost volume directly."""
    n = cfg.n_samples
    ts = jnp.linspace(-1.0, 1.0, n)
    z_vals = jnp.clip(
        depth[..., None] + ts * cfg.guide_sigma * std[..., None], near, far
    )  # (h, w, n)
    z_vals = jnp.sort(z_vals, axis=-1)
    pts = _backproject(
        tgt_cam, z_vals.transpose(2, 0, 1), scale, scale
    ).transpose(1, 2, 0, 3)  # (h, w, n, 3)

    S = src_imgs.shape[0]

    def per_src(i):
        K2 = jnp.asarray(src_cams[i].K, jnp.float32)
        x, y, _ = _project(pts, K2, src_cams[i].R, src_cams[i].T)
        rgb = _bilinear(src_imgs[i], x, y)  # (h, w, n, 3)
        ft = _bilinear(f0[i], x * 0.5, y * 0.5)  # (h, w, n, f0)
        return jnp.concatenate([rgb, ft], -1)

    src_feat = jnp.stack([per_src(i) for i in range(S)])  # (S,h,w,n,3+f0)
    mean = jnp.mean(src_feat, axis=0)
    var = jnp.mean(src_feat ** 2, axis=0) - mean ** 2
    glob = jnp.concatenate([mean, var], -1)  # (h, w, n, 2*(3+f0))

    # learned per-view blending of source COLORS (FeatureAgg + ibr head)
    per_view_in = jnp.concatenate([
        jnp.broadcast_to(glob[None], (S, *glob.shape)),
        jnp.sum((src_feat - mean[None]) ** 2, -1, keepdims=True),
    ], -1)
    logits = cfg.agg_net(params["agg"], per_view_in)[..., 0]  # (S, h, w, n)
    wsrc = jax.nn.softmax(logits, axis=0)
    rgb_blend = jnp.sum(wsrc[..., None] * src_feat[..., :3], axis=0)

    hid = cfg.sig_net(params["sig"], glob)
    sigma = jax.nn.softplus(cfg.sig_out_net(params["sig_out"], hid)[..., 0] - 1.0)
    rgb_res = cfg.rgb_res_net(
        params["rgb_res"], jnp.concatenate([hid, rgb_blend], -1)) * 0.1
    rgb_s = jnp.clip(rgb_blend + rgb_res, 0.0, 1.0)  # (h, w, n, 3)
    return volume_render(rgb_s, sigma, z_vals, bg_color=cfg.bg_brightness)


def render_enerf(
    cfg: ENeRFConfig,
    params,
    tgt_cam: Camera,
    src_imgs: jnp.ndarray,  # (S, H, W, 3)
    src_cams: list,
    near: float,
    far: float,
    render_coarse: bool = False,
) -> ENeRFOutput:
    """Full two-level ENeRF forward for one target view."""
    H, W = tgt_cam.H, tgt_cam.W
    feats = feature_net(params, src_imgs)  # [(S,H/2,W/2,f0), (S,H/4,W/4,f1)]

    # ---- level 0: full-range sweep at 1/4 scale ----
    D0 = cfg.n_planes[0]
    # uniform-disparity hypotheses (uni_disps=True for the coarse level)
    t = jnp.linspace(0.0, 1.0, D0)
    dh0 = 1.0 / (1.0 / near * (1 - t) + 1.0 / far * t)
    vol0 = cost_volume(feats[1], src_cams, tgt_cam,
                       dh0[:, None, None], 0.25)
    depth0, std0 = depth_regression(params, ("cr0a", "cr0b"), vol0,
                                    dh0[:, None, None])

    # ---- level 1: narrow sweep around depth0 at 1/2 scale ----
    D1 = cfg.n_planes[1]
    h1, w1 = feats[0].shape[1:3]
    d_up = _upsample(depth0, h1, w1)
    s_up = _upsample(std0, h1, w1)
    t1 = jnp.linspace(-1.0, 1.0, D1)
    dh1 = d_up[None] + t1[:, None, None] * cfg.guide_sigma * s_up[None]
    dh1 = jnp.clip(dh1, near, far)
    vol1 = cost_volume(feats[0], src_cams, tgt_cam, dh1, 0.5)
    depth1, std1 = depth_regression(params, ("cr1a", "cr1b"), vol1, dh1)

    # ---- renders: optional level-0 supervision + full-res final ----
    rgb_coarse = None
    if render_coarse:
        out0 = _ibr_render(cfg, params, tgt_cam, src_imgs, src_cams,
                           feats[0], depth0, std0, near, far, 0.25)
        rgb_coarse = out0["rgb_map"]

    dF = _upsample(depth1, H, W)
    sF = _upsample(std1, H, W)
    out = _ibr_render(cfg, params, tgt_cam, src_imgs, src_cams, feats[0],
                      dF, sF, near, far, 1.0)
    return ENeRFOutput(
        rgb_map=out["rgb_map"],
        dpt_map=out["dpt_map"],
        acc_map=out["acc_map"],
        depth_coarse=depth0,
        depth_std=std0,
        rgb_coarse=rgb_coarse,
    )


def make_enerf_train_step(cfg: ENeRFConfig, tgt_cam: Camera, n_srcs: int,
                          near: float, far: float, lr: float = 5e-4):
    """Jitted photometric train step over one (target, sources) batch.
    Source cameras are passed as stacked (S, 3, 3)/(S, 3)/(S, 3, 3) arrays
    so the step re-jits only on (H, W, S) changes."""
    import optax

    opt = optax.adam(lr)
    H, W = tgt_cam.H, tgt_cam.W

    def _cams(Ks, Rs, Ts):
        return [Camera(H, W, Ks[i], Rs[i], Ts[i]) for i in range(n_srcs)]

    def init(key):
        params = init_enerf(cfg, key)
        return params, opt.init(params)

    @jax.jit
    def step(params, opt_state, Kt, Rt, Tt, src_imgs, Ks, Rs, Ts, target):
        cam = Camera(H, W, Kt, Rt, Tt)

        def loss_fn(p):
            out = render_enerf(cfg, p, cam, src_imgs, _cams(Ks, Rs, Ts),
                               near, far, render_coarse=True)
            loss = jnp.mean((out.rgb_map - target) ** 2)
            # level-0 supervision (render_if=[True, True]): the coarse
            # render's photometric loss is the cost volume's depth signal
            h0, w0 = out.rgb_coarse.shape[:2]
            tgt0 = target[: h0 * 4 : 4, : w0 * 4 : 4]
            loss = loss + 0.5 * jnp.mean((out.rgb_coarse - tgt0) ** 2)
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        psnr = -10.0 * jnp.log10(loss + 1e-10)
        return params, opt_state, dict(loss=loss, psnr=psnr)

    return init, step
