"""Command-line entry points: train / test / render-path / smoke.

The `evc`-family equivalent (/root/reference/easyvolcap/scripts/main.py via
pyproject entry points): config-chain + dotted-override driven, e.g.

  python -m envgs_tpu train -c configs/exps/envgs_synthetic.yaml
  python -m envgs_tpu test  -c configs/exps/envgs_synthetic.yaml
  python -m envgs_tpu smoke             # synthetic end-to-end sanity run

Configs follow the reference's stacking semantics (engine/config.py):
parents via `configs:`, `_delete_`, CLI `a.b.c=value` overrides.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from envgs_tpu.engine import Config, load_config
from envgs_tpu.engine.registry import call_filtered
from envgs_tpu.models import gaussians as G
from envgs_tpu.models.envgs import EnvGSConfig
from envgs_tpu.train.optimizer import LRConfig
from envgs_tpu.train.runner import Runner
from envgs_tpu.train.supervisor import LossConfig
from envgs_tpu.train.trainer import ScheduleConfig


def _named(cls, cfg: dict):
    cfg = {k: v for k, v in (cfg or {}).items() if k in cls._fields}
    return cls(**cfg)


def _load_views(cfg: Config):
    """dataset_cfg -> (views, eval_views, init_xyz, init_rgb, env_bounds,
    spatial_scale)."""
    dcfg = cfg.get("dataset_cfg", {})
    source = dcfg.get("source", "synthetic")

    if source == "synthetic":
        from envgs_tpu.data.synthetic import make_scene

        scene = make_scene(
            n_views=dcfg.get("n_views", 12),
            H=dcfg.get("H", 128),
            W=dcfg.get("W", 128),
            seed=dcfg.get("seed", 0),
        )
        split = dcfg.get("eval_every", 4)
        views, eval_views = [], []
        for i, cam in enumerate(scene.cams):
            v = dict(rgb=scene.images[i], msk=scene.masks[i],
                     norm=scene.normals[i], camera=cam, name=f"{i:02d}")
            (eval_views if (split and i % split == 0) else views).append(v)
        xyz = np.concatenate([
            np.asarray(scene.gt_base.params.xyz)[
                np.asarray(scene.gt_base.stats.active)],
        ])
        rng = np.random.default_rng(0)
        init_xyz = xyz + rng.normal(scale=0.05, size=xyz.shape).astype(np.float32)
        init_rgb = rng.random(init_xyz.shape).astype(np.float32)
        env_bounds = dcfg.get("env_bounds", [[-14, -14, -14], [14, 14, 14]])
        spatial_scale = 2.5
    else:
        from envgs_tpu.data.dataset import MultiViewDataset

        scfg = cfg.get("model_cfg", {}).get("sampler_cfg", {}) or {}
        # val_dataset_cfg overlays dataset_cfg for the eval split — the
        # reference's val_dataloader_cfg.dataset_cfg (explicit per-split
        # view_sample lists in the ref_real/nerf_casting/envgs stacks)
        vcfg = dict(dcfg, **(cfg.get("val_dataset_cfg", {}) or {}))
        ds = call_filtered(MultiViewDataset, dict(dcfg, split="train"))
        vs = call_filtered(MultiViewDataset, dict(vcfg, split="val"))
        views = [ds[i] for i in range(len(ds))]
        eval_views = [vs[i] for i in range(len(vs))]
        # preload_gs lives under sampler_cfg in the reference
        # (gaussian2d_sampler.py:194-216); accept it in either place
        init_xyz, init_rgb = ds.load_sfm(
            scfg.get("preload_gs") or dcfg.get("preload_gs"))
        env_bounds = (scfg.get("env_bounds") or dcfg.get("env_bounds")
                      or [[-1, -1, -1], [1, 1, 1]])
        # the reference pins the exact SfM-derived spatial_scale per scene
        # in its dataset configs; honor it over the camera-sphere estimate
        spatial_scale = float(scfg.get("spatial_scale", ds.spatial_scale))
    return views, eval_views, init_xyz, init_rgb, env_bounds, spatial_scale


def build_from_config(cfg: Config):
    """Config dict -> (views, eval_views, pools, cfg objects)."""
    (views, eval_views, init_xyz, init_rgb, env_bounds,
     spatial_scale) = _load_views(cfg)

    mcfg = cfg.get("model_cfg", {})
    scfg = dict(mcfg.get("sampler_cfg", {}) or {})
    # reference key aliases (configs/models/envgs.yaml:44 names the gate
    # render_reflection_start_iter; white_bg is the shiny_blender dataset
    # stack's background switch)
    if "render_reflection_start_iter" in scfg:
        scfg.setdefault("reflection_start_iter",
                        scfg["render_reflection_start_iter"])
    if scfg.get("white_bg"):
        scfg.setdefault("bg_brightness", 1.0)
        scfg.setdefault("env_bg_brightness", 1.0)
    # scene configs pin the exact SfM-derived spatial_scale (reference
    # datasets/*/<scene>.yaml); it feeds densify thresholds + xyz LR
    spatial_scale = float(scfg.get("spatial_scale", spatial_scale))
    model_cfg = _named(EnvGSConfig, scfg)
    # CPU runs use the interpreter variants of the Pallas kernels
    import jax

    if jax.default_backend() == "cpu":
        if model_cfg.raster_backend == "pallas":
            model_cfg = model_cfg._replace(raster_backend="pallas_interp")
        if model_cfg.tracer_backend == "tiled":
            model_cfg = model_cfg._replace(tracer_backend="tiled_interp")
    sched = _named(ScheduleConfig, {**scfg, **cfg.get("runner_cfg", {})})

    sup = cfg.get("model_cfg", {}).get("supervisor_cfg", {})
    loss_cfg = _named(LossConfig, sup)
    # chained aux supervisor family (the reference's supervisor_cfgs list):
    # model_cfg.supervisor_cfg.aux_cfg.{dpt_loss_weight, ...} enables
    # depth/flow/mask/entropy terms by key (train/aux_supervisors.py)
    from envgs_tpu.train.aux_supervisors import AuxLossConfig

    aux_raw = sup.get("aux_cfg", {}) or {}
    aux_cfg = _named(AuxLossConfig, aux_raw) if aux_raw else None

    ocfg = cfg.get("runner_cfg", {}).get("optimizer_cfg", {})
    lr_table = ocfg.get("lr_table", {})
    lr_common = dict(
        xyz=lr_table.get("_xyz", 0.00016),
        features_dc=lr_table.get("_features_dc", 0.0025),
        features_rest=lr_table.get("_features_rest", 0.000125),
        opacity=lr_table.get("_opacity", 0.05),
        scaling=lr_table.get("_scaling", 0.005),
        rotation=lr_table.get("_rotation", 0.001),
        specular=lr_table.get("_specular", 0.01),
        spatial_scale=spatial_scale,
        reflection_start_iter=sched.reflection_start_iter,
        normal_prop_until_iter=sched.normal_prop_until_iter,
    )
    # sampler_cfg.xyz_lr_scheduler (envgs.yaml:36-40): the expon xyz-LR
    # schedule's init/final/delay/max-steps knobs
    xsched = scfg.get("xyz_lr_scheduler", {}) or {}
    if xsched:
        lr_common.update(
            xyz_lr_init=float(xsched.get("lr_init", lr_common["xyz"])),
            xyz_lr_final=float(xsched.get("lr_final", 1.6e-6)),
            xyz_lr_delay_mult=float(xsched.get("lr_delay_mult", 0.01)),
            xyz_lr_max_steps=int(xsched.get("max_steps", 30000)),
        )
    lr_base = _named(LRConfig, lr_common)
    lr_env = _named(LRConfig, dict(lr_common, use_opacity_pulse=False))

    dens_base = _named(G.DensifyConfig, dict(
        scfg, spatial_scale=spatial_scale,
        max_gs=int(scfg.get("max_gs", 2_000_000)),
    ))
    env_keys = {
        k[len("env_"):]: v for k, v in scfg.items() if k.startswith("env_")
    }
    dens_env = _named(G.DensifyConfig, dict(
        env_keys, spatial_scale=spatial_scale,
        max_gs=int(scfg.get("env_max_gs", 700_000)),
    ))

    # pools
    cap = int(scfg.get("pool_cap", scfg.get("max_gs", 2 ** 17)))
    env_cap = int(scfg.get("env_pool_cap", scfg.get("env_max_gs", 2 ** 16)))
    base = G.create_pool(
        init_xyz, init_rgb, cap=cap,
        sh_degree=int(scfg.get("sh_deg", 3)),
        init_opacity=float(scfg.get("init_occ", 0.1)),
        specular_channels=int(scfg.get("specular_channels", 1)),
        init_specular=float(scfg.get("init_specular", 1e-3)),
        init_roughness=float(scfg.get("init_roughness", 0.5)),
    )
    rng = np.random.default_rng(1)
    # env pool init: explicit SfM ply when the dataset ships one
    # (sampler_cfg.env_preload_gs, e.g. <root>/envs/points3D.ply in every
    # ref_real/nerf_casting scene config), else the reference's
    # subgrid-random fallback (envgs_sampler.py:179-192)
    env_ply = scfg.get("env_preload_gs")
    if env_ply and os.path.exists(env_ply):
        from envgs_tpu.utils.ply import load_sfm_ply

        env_xyz, env_rgb = load_sfm_ply(env_ply)
    else:
        from envgs_tpu.utils.grid import sample_points_subgrid

        S = int(round((env_cap / 4) ** (1 / 3)))  # grid at half capacity
        env_xyz = sample_points_subgrid(np.asarray(env_bounds, np.float32),
                                        S=max(S, 2), N=2)
        env_rgb = rng.random(env_xyz.shape).astype(np.float32)
    env = G.create_pool(
        env_xyz, env_rgb, cap=env_cap,
        sh_degree=int(scfg.get("env_sh_deg", 3)),
        init_opacity=float(scfg.get("env_init_occ", 0.1)),
    )
    return views, eval_views, base, env, model_cfg, loss_cfg, sched, \
        dens_base, dens_env, lr_base, lr_env, aux_cfg


def make_runner(cfg: Config) -> Runner:
    (views, eval_views, base, env, model_cfg, loss_cfg, sched, dens_base,
     dens_env, lr_base, lr_env, aux_cfg) = build_from_config(cfg)
    rcfg = cfg.get("runner_cfg", {})

    # OptimizableCamera residuals (configs/specs/optcam.yaml semantics)
    from envgs_tpu.train.trainer import CamOptConfig

    ccfg = cfg.get("model_cfg", {}).get("camera_cfg", {}) or {}
    cam_opt = CamOptConfig(
        enabled=ccfg.get("type") == "OptimizableCamera",
        extri_lr=float(ccfg.get("extri_lr", 1e-5)),
        intri_lr=float(ccfg.get("intri_lr", 1e-8)),
        freeze_extri=bool(ccfg.get("freeze_extri", False)),
        freeze_intri=bool(ccfg.get("freeze_intri", False)),
    )

    # DatasetRatioModerator / DatasetCenterCropRatioModerator schedules
    # (runners/moderators.py:30-87 semantics)
    from envgs_tpu.train.moderators import (
        AlternatingSchedule,
        CenterCropSchedule,
        RatioSchedule,
    )

    modcfg = rcfg.get("moderator_cfg", {}) or {}
    ratio_sched = None
    crop_sched = None
    alternating = None
    if modcfg.get("type") == "AlternatingModerator":
        alternating = AlternatingSchedule(
            patterns=tuple(modcfg.get("patterns", ("patch", "full"))))
    if modcfg.get("type") == "DatasetRatioModerator":
        ratio_sched = RatioSchedule(
            ratio_start=float(modcfg.get("milestone_start", 0.25)),
            ratio_end=float(modcfg.get("milestone_end", 1.0)),
            iter_start=int(modcfg.get("iter_start", 0)),
            iter_end=int(modcfg.get("iter_end", 10000)),
        )
    elif modcfg.get("type") == "DatasetCenterCropRatioModerator":
        crop_sched = CenterCropSchedule(
            crop_start=float(modcfg.get("milestone_start", 0.5)),
            crop_end=float(modcfg.get("milestone_end", 1.0)),
            iter_start=int(modcfg.get("iter_start", 0)),
            iter_end=int(modcfg.get("iter_end", 5000)),
        )

    scfg = cfg.get("model_cfg", {}).get("sampler_cfg", {})
    patch = scfg.get("patch_size", [-1, -1])
    patch_size = tuple(patch) if patch and patch[0] > 0 else None

    return Runner(
        views=views,
        eval_views=eval_views,
        base=base,
        env=env,
        model_cfg=model_cfg,
        loss_cfg=loss_cfg,
        sched=sched,
        dens_base=dens_base,
        dens_env=dens_env,
        lr_base=lr_base,
        lr_env=lr_env,
        exp_name=cfg.get("exp_name", "exp"),
        out_root=cfg.get("out_root", "data"),
        save_latest_every=rcfg.get("save_latest_every", 5000),
        log_every=rcfg.get("log_interval", 50),
        eval_every_iters=rcfg.get("eval_every_iters", 0),
        resume=rcfg.get("resume", True),
        cam_opt=cam_opt,
        aux_cfg=aux_cfg,
        ratio_sched=ratio_sched,
        crop_sched=crop_sched,
        patch_size=patch_size,
        alternating=alternating,
        # profiling (profiler_cfg semantics, scripts/wrap.py:44-56 +
        # runner collect_timing / timer_record_to_file knobs)
        collect_timing=bool(rcfg.get("collect_timing", False)),
        timer_sync=bool(rcfg.get("timer_sync_cuda", False)),
        timer_record_to_file=rcfg.get("timer_record_to_file"),
        profiler_trace_dir=(cfg.get("profiler_cfg", {}) or {}).get(
            "trace_dir"
        ) if (cfg.get("profiler_cfg", {}) or {}).get("enabled") else None,
        profiler_start=int((cfg.get("profiler_cfg", {}) or {}).get(
            "skip_first", 10)),
        profiler_steps=int((cfg.get("profiler_cfg", {}) or {}).get(
            "active", 5)),
        record=bool(rcfg.get("record", True)),
        resolved_config=cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg),
    )


def train_gaussiant(cfg: Config):
    """Plain-3DGS training loop (GaussianTSampler model family): the
    config-driven counterpart of the reference's gaussiant.yaml experiments,
    sharing the dataset layer and checkpoint/eval conventions."""
    import jax
    import jax.numpy as jnp

    from envgs_tpu.models.gaussiant import (
        GaussianTConfig,
        gaussiant_maintenance,
        init_gaussiant_pool,
        init_gaussiant_state,
        make_gaussiant_train_step,
        render_gaussiant,
    )
    from envgs_tpu.train.evaluator import Evaluator
    from envgs_tpu.utils.ply import save_gaussian_ply

    views, eval_views, init_xyz, init_rgb, _, spatial_scale = _load_views(cfg)
    scfg = cfg.get("model_cfg", {}).get("sampler_cfg", {})
    gcfg = _named(GaussianTConfig, scfg)
    if jax.default_backend() == "cpu" and gcfg.raster_backend == "pallas":
        gcfg = gcfg._replace(raster_backend="pallas_interp")
    cap = int(scfg.get("pool_cap", max(len(init_xyz) * 4, 1024)))
    pool = init_gaussiant_pool(init_xyz, init_rgb, cap, gcfg)
    state = init_gaussiant_state(pool)
    dcfg_d = _named(G.DensifyConfig, dict(scfg, spatial_scale=spatial_scale,
                                          max_gs=cap))
    rcfg = cfg.get("runner_cfg", {})
    total = int(rcfg.get("epochs", 1)) * int(rcfg.get("ep_iter", 500))
    log_every = int(rcfg.get("log_interval", 50))
    exp = cfg.get("exp_name", "gaussiant")
    model_dir = os.path.join(cfg.get("out_root", "data"), "trained_model",
                             exp)

    # per-resolution step cache (Runner._step_fn pattern): captures differ
    # per (H, W) since shapes are static under jit
    step_cache: dict = {}

    def step_for(cam):
        k = (cam.H, cam.W)
        if k not in step_cache:
            step_cache[k] = make_gaussiant_train_step(gcfg, cam)
        return step_cache[k]

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    order = rng.permutation(len(views))
    oi = 0
    for it in range(total):
        key, mkey = jax.random.split(key)
        state = gaussiant_maintenance(state, it, gcfg, dcfg_d, mkey)
        v = views[int(order[oi])]
        oi = (oi + 1) % len(order)
        if oi == 0:
            order = rng.permutation(len(views))
        cam = v["camera"]
        state, aux = step_for(cam)(state, jnp.asarray(cam.K), cam.R, cam.T,
                                   jnp.asarray(v["rgb"]))
        if it % log_every == 0 or it == total - 1:
            print(f"iter {it}/{total} loss {float(aux['loss']):.4f} "
                  f"psnr {float(aux['psnr']):.2f} "
                  f"pts {int(aux['n_pts'])}", flush=True)

    os.makedirs(model_dir, exist_ok=True)
    p = state.pool.params
    act = np.asarray(state.pool.stats.active)
    save_gaussian_ply(
        os.path.join(model_dir, "point_cloud.ply"),
        np.asarray(p.xyz)[act], np.asarray(p.features_dc)[act],
        np.asarray(p.features_rest)[act], np.asarray(p.opacity)[act],
        np.asarray(p.scaling)[act], np.asarray(p.rotation)[act],
    )

    # eval: PSNR/SSIM on held-out views
    if eval_views:
        ev = Evaluator(os.path.join(cfg.get("out_root", "data"), "result",
                                    exp))
        for i, v in enumerate(eval_views):
            out = render_gaussiant(state.pool, v["camera"], gcfg)
            ev.evaluate(np.asarray(out.rgb), np.asarray(v["rgb"]),
                        name=f"{i:04d}")
        print(json.dumps(ev.summarize()["summary"], indent=2))
    return state


def main(argv=None):
    p = argparse.ArgumentParser("envgs_tpu")
    # mode parity with the reference entry points (scripts/main.py + the
    # evc-ws console script): ws = websocket render server; dist = alias of
    # train (multi-host SPMD needs no separate launcher — jax.distributed
    # initializes from the TPU pod env, parallel/multihost.py)
    p.add_argument("mode", choices=["train", "test", "render", "mesh",
                                    "smoke", "ws", "dist", "sig"])
    p.add_argument("--name", default=None,
                   help="sig mode: experiment/config substring identifying "
                        "the running training process")
    p.add_argument("--signal", default="usr1", choices=["usr1", "usr2"],
                   help="sig mode: usr1 = status dump + checkpoint, "
                        "usr2 = checkpoint only")
    p.add_argument("-c", "--config", default=None,
                   help="comma-separated config chain")
    p.add_argument("--path-kind", default="orbit",
                   choices=["orbit", "spiral", "linear", "cubic"],
                   help="render mode: camera path interpolation kind")
    p.add_argument("--path-frames", type=int, default=60,
                   help="render mode: number of path frames")
    p.add_argument("--path-dir", default=None,
                   help="render mode: explicit saved camera path dir "
                        "(easymocap intri/extri, e.g. the viewer's O-key "
                        "export under result/<exp>/camera_paths/<ts>)")
    p.add_argument("--mesh-res", type=int, default=256,
                   help="mesh mode: TSDF grid resolution")
    p.add_argument("--mesh-stride", type=int, default=1,
                   help="mesh mode: fuse every Nth training view")
    p.add_argument("--host", default="127.0.0.1", help="ws mode: bind host")
    p.add_argument("--port", type=int, default=1024, help="ws mode: port")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (the reference's "
                        "anomaly-detection switch, SURVEY §5.2): every jit "
                        "re-checks outputs for NaN/Inf and raises at the "
                        "producing op — slow, debugging only")
    p.add_argument("opts", nargs="*", help="dotted overrides a.b.c=v")
    a = p.parse_args(argv)

    if a.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    if a.mode == "sig":
        # evc-sig analog (reference scripts/sigusr1.py): signal a RUNNING
        # training process by name. Only ever sends SIGUSR1/SIGUSR2 (status
        # dump / checkpoint-on-demand) — never a termination signal.
        import signal as _signal

        name = a.name or (a.opts[0] if a.opts else None)
        if not name:
            p.error("sig requires --name <experiment substring>")
        sig = _signal.SIGUSR1 if a.signal == "usr1" else _signal.SIGUSR2
        me = os.getpid()
        hits = []
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as fh:
                    cmd = fh.read().replace(b"\0", b" ").decode(
                        "utf-8", "ignore")
            except OSError:
                continue
            # only python interpreters: wrappers (timeout, shells) would DIE
            # on an unhandled SIGUSR1 (default action is termination)
            first = cmd.split(" ", 1)[0]
            if ("python" in os.path.basename(first) and "envgs_tpu" in cmd
                    and name in cmd and " sig" not in cmd):
                hits.append((int(pid), cmd.strip()))
        if not hits:
            print(f"no running envgs_tpu process matching {name!r}")
            return
        for pid, cmd in hits:
            os.kill(pid, sig)
            print(f"sent {a.signal.upper()} to {pid}: {cmd[:100]}")
        return
    if a.mode == "dist":
        a.mode = "train"
    if a.mode == "ws":
        if not a.config:
            p.error("ws requires -c <config>")
        from envgs_tpu.serve.websocket_server import serve_config

        serve_config(a.config, a.opts, host=a.host, port=a.port)
        return

    if a.mode == "smoke":
        cfg = Config.wrap({
            "exp_name": "smoke",
            "dataset_cfg": {"source": "synthetic", "H": 64, "W": 64,
                            "n_views": 6},
            "model_cfg": {"sampler_cfg": {
                "pool_cap": 1280, "env_pool_cap": 768,
                "reflection_start_iter": 60, "pair_cap": 2 ** 14,
                "tracer_backend": "ref",
                # CPU smoke uses the reference rasterizer (the interpret-mode
                # Pallas path is minutes-per-compile on one host core)
                "raster_backend": "pallas"
                if __import__("jax").default_backend() != "cpu" else "ref",
            }},
            "runner_cfg": {"epochs": 1, "ep_iter": 150, "log_interval": 25,
                           "resume": False},
        })
        runner = make_runner(cfg)
        runner.train()
        runner.test()
        return

    if not a.config:
        p.error("train/test require -c <config[,config2,...]>")
    cfg = load_config(a.config, overrides=a.opts, root=os.getcwd())
    # model-family dispatch by sampler/network type (registry name),
    # mirroring the reference's REGISTRY.build-driven construction
    mcfg = cfg.get("model_cfg", {}) or {}
    styp = (mcfg.get("sampler_cfg", {}) or {}).get("type")
    ntyp = (mcfg.get("network_cfg", {}) or {}).get("type")
    if a.mode == "train":
        if styp == "GaussianTSampler":
            train_gaussiant(cfg)
            return
        from envgs_tpu.engine import TRAINERS
        from envgs_tpu.train import families  # noqa: F401 (registrations)
        for typ in (styp, ntyp):
            if typ and typ in TRAINERS:
                TRAINERS.get(typ)(cfg)
                return
    runner = make_runner(cfg)
    if a.mode == "train":
        runner.train()
        runner.test()
    elif a.mode == "render":
        out = runner.render_path(n_frames=a.path_frames, kind=a.path_kind,
                                 tag=("file" if a.path_dir else a.path_kind),
                                 path_dir=a.path_dir)
        print(f"[render] wrote {out}")
    elif a.mode == "mesh":
        # TSDF depth-fusion mesh export from the latest checkpoint
        # (reference: scripts/fusion/volume_fusion.py eval protocol)
        runner.extract_mesh(res=a.mesh_res, stride=a.mesh_stride)
    else:
        runner.test()


if __name__ == "__main__":
    main()
