"""PointPlanes model family: dynamic point-based rendering (R4DV).

TPU-native counterpart of the reference's `PointPlanesSampler`
(/root/reference/easyvolcap/models/samplers/point_planes_sampler.py — the
Real-time 4D video pipeline): an optimizable point cloud whose per-frame
motion, geometry and appearance come from K-Planes features:

- `resd`: displacement regressor (scale * tanh MLP, DisplacementRegressor
  semantics) over K-Planes features of (x, t) -> per-frame point positions;
- `geo`: MLP -> (radius in [radius_min, radius_max] via shifted sigmoid,
  alpha via shifted sigmoid) (:67-71 radius/alpha shifts);
- `rgb`: per-point SH coefficients evaluated at the view direction
  (SphericalHarmonics regressor).

Rendering uses the gauss3d tile kernel as the point splatter (isotropic
scales = radius): pts_per_pix compositing becomes front-to-back alpha
blending, `volume_rendering=True` semantics. Fully functional + jittable;
points themselves are trainable (`opt_pcd=True`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.models.embedders import KPlanesEmbedder
from envgs_tpu.models.regressors import MLP
from envgs_tpu.ops.raster3d import Raster3DOutput, render_gaussians3d
from envgs_tpu.utils.camera import Camera
from envgs_tpu.utils.sh import eval_sh_color
from envgs_tpu.utils.transforms import normalize


class PointPlanesConfig(NamedTuple):
    """Static hyperparameters (PointPlanesSampler defaults, scaled down)."""

    n_frames: int = 8
    radius_min: float = 0.001
    radius_max: float = 0.015
    radius_shift: float = -5.0
    alpha_shift: float = 5.0
    resd_scale: float = 0.1  # displacement range (DisplacementRegressor)
    sh_deg: int = 2
    feat_width: int = 64
    bg_brightness: float = 0.0
    raster_backend: str = "pallas"
    pair_cap: int = 2 ** 20
    bounds: tuple = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))

    @property
    def embedder(self) -> KPlanesEmbedder:
        return KPlanesEmbedder(
            n_features=8, resolutions=(16, 32), n_frames=self.n_frames,
            time_resolution=max(self.n_frames, 2), bounds=self.bounds,
        )

    @property
    def resd_net(self) -> MLP:
        return MLP(self.embedder.out_dim, self.feat_width, 2, 3, skips=())

    @property
    def geo_net(self) -> MLP:
        return MLP(self.embedder.out_dim, self.feat_width, 2, 2, skips=())

    @property
    def rgb_net(self) -> MLP:
        K = (self.sh_deg + 1) ** 2
        return MLP(self.embedder.out_dim, self.feat_width, 2, 3 * K,
                   skips=())

    def init(self, key, points: jnp.ndarray) -> dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        resd = self.resd_net.init(k2)
        # zero-init the displacement head: identity warp at start, and the
        # pre-tanh stays small early so tanh cannot saturate into a
        # constant (gradient-dead) displacement
        w, b = resd[-1]
        resd[-1] = (jnp.zeros_like(w), b)
        return dict(
            points=jnp.asarray(points, jnp.float32),  # opt_pcd=True
            planes=self.embedder.init(k1),
            resd=resd,
            geo=self.geo_net.init(k3),
            rgb=self.rgb_net.init(k4),
        )


def point_planes_forward(cfg: PointPlanesConfig, params: dict, t,
                         cam: Camera) -> Raster3DOutput:
    """Render frame `t` (in [0, 1]) from camera `cam`."""
    pts = params["points"]  # (N, 3)
    feat = cfg.embedder(params["planes"], pts, t)  # (N, F)

    # per-frame displaced positions (resd = scale * tanh(mlp))
    resd = cfg.resd_scale * jnp.tanh(cfg.resd_net(params["resd"], feat))
    x = pts + resd

    geo = cfg.geo_net(params["geo"], feat)  # (N, 2)
    radius = cfg.radius_min + (cfg.radius_max - cfg.radius_min) * (
        jax.nn.sigmoid(geo[..., 0] + cfg.radius_shift))
    alpha = jax.nn.sigmoid(geo[..., 1] + cfg.alpha_shift)

    K = (cfg.sh_deg + 1) ** 2
    sh = cfg.rgb_net(params["rgb"], feat).reshape(-1, 3, K)
    dirs = normalize(x - cam.center[None, :])
    rgb = jnp.clip(eval_sh_color(cfg.sh_deg, sh, dirs), 0.0, 1.0)

    N = x.shape[0]
    quats = jnp.concatenate(
        [jnp.ones((N, 1)), jnp.zeros((N, 3))], -1)  # isotropic: any rot
    scales3 = jnp.repeat(radius[:, None], 3, axis=-1)
    return render_gaussians3d(
        x, quats, scales3, alpha, rgb, cam,
        bg_color=cfg.bg_brightness, backend=cfg.raster_backend,
        pair_cap=cfg.pair_cap,
    )


def make_point_planes_train_step(cfg: PointPlanesConfig,
                                 cam_template: Camera, lr: float = 5e-3):
    """Jitted photometric step over (t, K, R, T, target)."""
    import optax

    opt = optax.adam(lr)
    H, W = cam_template.H, cam_template.W
    znear, zfar = cam_template.znear, cam_template.zfar

    def init(key, points):
        params = cfg.init(key, points)
        return params, opt.init(params)

    @jax.jit
    def step(params, opt_state, t, K, R, T, target):
        cam = Camera(H, W, K, R, T, znear, zfar)

        def loss_fn(p):
            out = point_planes_forward(cfg, p, t, cam)
            return jnp.mean((out.rgb - target) ** 2), out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        psnr = -10.0 * jnp.log10(loss + 1e-10)
        return params, opt_state, dict(loss=loss, psnr=psnr)

    return init, step
