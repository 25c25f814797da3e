"""Multi-chip scaling: image-band decomposition over a jax.sharding.Mesh.

TPU-native replacement for the reference's DDP/NCCL data parallelism
(/root/reference/scripts/main.py:240-275, SURVEY §2.7). The reference trains
1 image/iteration, so batch-DP is the wrong axis; the natural parallel axis
is the PIXEL/ray axis (SURVEY §5.7): the image splits into horizontal bands
of whole 16px tile rows, each device rasterizes + traces its band against
the replicated Gaussian pools as a row-CROP of the global camera
(rasterize(row_window): full-image K everywhere, banding is integer tile
arithmetic — bit-identical to the matching rows of a full render), and
the loss is a pmean. shard_map's transpose then
all-reduces parameter gradients over the band axis automatically — the
DDP all-reduce without any process-group management, riding ICI.

The default loss is BAND-EXACT: SSIM exchanges 5-row halos over the band
axis (ppermute; each global window computed by exactly one band), the
depth-normalization quantiles psum their CDF counts, and the depth-derived
surface normal recomputes band-boundary rows from a 1-row depth halo — the
band step's updated parameters match the single-chip step to float
tolerance under the FULL default loss (asserted by the driver dryrun and
tests/test_sharding.py), not just under L1.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from envgs_tpu.models import gaussians as G
from envgs_tpu.models.camera_opt import CameraResiduals, apply_residual
from envgs_tpu.models.envgs import EnvGSConfig, forward_envgs
from envgs_tpu.ops.raster import depth_to_normal
from envgs_tpu.train.optimizer import LRConfig, lr_tree_for, sparse_adam_update
from envgs_tpu.train.supervisor import LossConfig, compute_losses
from envgs_tpu.train.trainer import (
    Batch,
    CamOptConfig,
    CamOptState,
    TrainState,
    init_cam_opt,
)
from envgs_tpu.utils.camera import Camera


def make_mesh(n_devices: int | None = None, axis: str = "band") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(devs, (axis,))


def make_sharded_train_step(
    mesh: Mesh,
    cam: Camera,
    model_cfg: EnvGSConfig,
    loss_cfg: LossConfig,
    lr_base: LRConfig,
    lr_env: LRConfig,
    has_norm: bool = False,
    axis: str = "band",
    lpips_fn=None,
    cam_opt: CamOptConfig = CamOptConfig(),
):
    """Band-parallel jitted train step: step(state, batch, K, R, T, it) —
    or, with cam_opt.enabled, step(state, cam_state, batch, K, R, T,
    view_idx, it) returning (state, cam_state, stats).

    Feature-parity contract with trainer.make_train_step (single-chip and
    band-parallel training must not diverge): densification-gradient width
    follows use_base_tracing, the perceptual-loss hook and camera residuals
    apply per band (residual on the full camera, then the band's intrinsics
    shift), and max SH degrees are read from the pools' static pytree aux
    (part of the jit cache key) instead of mutable closure state. Batch
    images must have H divisible by (n_bands * 16).
    """
    n_bands = mesh.shape[axis]
    H, W = cam.H, cam.W
    assert H % (n_bands * 16) == 0, (
        f"H={H} must split into {n_bands} bands of whole 16px tile rows"
    )
    band_h = H // n_bands
    m2z_w = 3 if model_cfg.use_base_tracing else 2

    def band_loss(msb, mse, bparams, bstats, eparams, estats, m2z, e3z,
                  wz_b, wz_e, cres, rgb, msk, norm, K, R, T, view_idx, it):
        """Per-device on its (1, band_h, W, C) slice -> replicated scalars."""
        camera = Camera(H, W, K, R, T, cam.znear, cam.zfar)
        if cam_opt.enabled:
            camera = apply_residual(camera, cres, view_idx)
        idx = jax.lax.axis_index(axis)
        row0 = idx * band_h
        K_full = camera.K
        # row-crop contract: the band camera keeps the FULL-image K (and
        # H_full rides the band tuple) so every projection/blend float is
        # bit-identical to the single-chip render — banding is integer tile
        # arithmetic only (rasterize(row_window))
        camera = Camera(band_h, W, K_full, camera.R, camera.T,
                        cam.znear, cam.zfar)
        base = G.GaussianPool(bparams, bstats, msb)
        env = G.GaussianPool(eparams, estats, mse)
        out = forward_envgs(base, env, camera, it, model_cfg, m2z, e3z,
                            wz_b, wz_e, band=(row0, H, axis))
        # --- band-exact surface normal (depth_to_normal's central
        # differences need one depth row from each neighbor band; without
        # the halo the band-boundary rows would read the zeroed 1px border
        # the single-chip path only has at the image edge) ---
        fwd_perm = [(i, i + 1) for i in range(n_bands - 1)]
        bwd_perm = [(i + 1, i) for i in range(n_bands - 1)]
        dpt = out.dpt_map  # = surf_depth (what single-chip feeds dpt2norm)
        top_row = jax.lax.ppermute(dpt[-1:], axis, fwd_perm)
        bot_row = jax.lax.ppermute(dpt[:1], axis, bwd_perm)
        dpt_ext = jnp.concatenate([top_row, dpt, bot_row], axis=0)
        cam_ext = Camera(band_h + 2, W, K_full, camera.R,
                         camera.T, cam.znear, cam.zfar)
        sn = depth_to_normal(cam_ext, dpt_ext[..., 0], i0=row0 - 1.0)[1:-1]
        grow = idx * band_h + jnp.arange(band_h)
        border = (grow == 0) | (grow == H - 1)
        sn = jnp.where(border[:, None, None], 0.0, sn)
        sn = sn * jax.lax.stop_gradient(out.acc_map)
        out = out._replace(surf_norm_map=sn)
        loss, stats = compute_losses(
            out, rgb[0], msk[0], norm[0] if has_norm else None,
            camera.R, it, loss_cfg, bg_brightness=model_cfg.bg_brightness,
            lpips_fn=lpips_fn, band=(axis, n_bands, H),
        )
        loss = jax.lax.pmean(loss, axis)
        stats = {k: jax.lax.pmean(v, axis) for k, v in stats.items()}
        aux = (
            jax.lax.psum(out.base_wet, axis),
            jax.lax.pmax(out.base_radii, axis),
            jax.lax.psum(out.base_visibility.astype(jnp.float32), axis),
            jax.lax.psum(out.env_wet, axis),
        )
        return loss, (stats, aux)

    def _step_impl(state: TrainState, cam_state: CamOptState, batch: Batch,
                   K, R, T, view_idx, it):
        base, env = state.base, state.env
        m2z = jnp.zeros((base.cap, m2z_w))
        e3z = jnp.zeros((env.cap, 3))
        # wet hooks (trainer.make_train_step parity): per-splat wet comes
        # back as their cotangents; the replicated in_spec makes shard_map's
        # transpose psum the per-band contributions automatically
        wz_b = jnp.zeros((base.cap,))
        wz_e = jnp.zeros((env.cap,))

        def bandify(x):
            return x.reshape(n_bands, band_h, W, x.shape[-1])

        rgb_b = bandify(batch.rgb)
        msk_b = bandify(batch.msk)
        norm_b = bandify(batch.norm)

        smapped = jax.shard_map(
            functools.partial(band_loss, base.max_sh_degree,
                              env.max_sh_degree),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(),
                      P(axis), P(axis), P(axis), P(), P(), P(), P(), P()),
            out_specs=(P(), (P(), P())),
            check_vma=False,  # pallas_call out_shapes carry no vma info
        )

        def loss_fn(bparams, eparams, m2z, e3z, wz_b, wz_e, cres):
            return smapped(bparams, base.stats, eparams, env.stats, m2z, e3z,
                           wz_b, wz_e, cres, rgb_b, msk_b, norm_b, K, R, T,
                           view_idx, it)

        argnums = (0, 1, 2, 3, 4, 5, 6) if cam_opt.enabled \
            else (0, 1, 2, 3, 4, 5)
        (loss, (stats, aux)), grads = jax.value_and_grad(
            loss_fn, argnums=argnums, has_aux=True
        )(base.params, env.params, m2z, e3z, wz_b, wz_e, cam_state.res)
        g_base, g_env, g_m2z, g_e3z, g_wet_b, g_wet_e = grads[:6]
        base_wet, base_radii, base_vis, env_wet = aux
        # one of {forward wet, gradient-lane wet} is exact zeros per backend
        base_wet = base_wet + jax.lax.stop_gradient(g_wet_b)
        env_wet = env_wet + jax.lax.stop_gradient(g_wet_e)

        new_bp, opt_base = sparse_adam_update(
            base.params, g_base, state.opt_base, lr_tree_for(it, lr_base))
        new_ep, opt_env = sparse_adam_update(
            env.params, g_env, state.opt_env, lr_tree_for(it, lr_env))

        if cam_opt.enabled:
            g_cam: CameraResiduals = grads[6]
            if cam_opt.freeze_extri:
                g_cam = g_cam._replace(se3=jnp.zeros_like(g_cam.se3))
            if cam_opt.freeze_intri:
                g_cam = g_cam._replace(intr=jnp.zeros_like(g_cam.intr))
            cam_lrs = CameraResiduals(
                se3=jnp.asarray(cam_opt.extri_lr, jnp.float32),
                intr=jnp.asarray(cam_opt.intri_lr, jnp.float32),
            )
            new_res, new_copt = sparse_adam_update(
                cam_state.res, g_cam, cam_state.opt, cam_lrs, eps=1e-15)
            cam_state = CamOptState(new_res, new_copt)

        b_stats = G.accumulate_stats(
            base.stats, g_m2z, (base_vis > 0) | (base_wet > 0),
            weight=base_wet, radii=base_radii)
        e_stats = G.accumulate_stats(env.stats, g_e3z, env_wet > 0, weight=env_wet)

        new_state = TrainState(
            base._replace(params=new_bp, stats=b_stats),
            env._replace(params=new_ep, stats=e_stats),
            opt_base, opt_env, state.key,
        )
        return new_state, cam_state, stats

    if cam_opt.enabled:
        return jax.jit(_step_impl)

    dummy_cam = init_cam_opt(1)

    def step(state: TrainState, batch: Batch, K, R, T, it):
        new_state, _, stats = _step_impl(
            state, dummy_cam, batch, K, R, T, jnp.asarray(0), it)
        return new_state, stats

    return jax.jit(step)
