"""Real-dataset config stacks resolve to the reference's exact recipes.

The reference's de-facto public API is its config tree
(configs/exps/envgs/ref_real/envgs_sedan.yaml:1-16 stacking base ->
models/envgs.yaml:19-81 -> datasets/ref_real/sedan.yaml). These tests pin
our mirrored stacks to the reference numbers so the capability claim is
checkable without the (zero-egress-blocked) datasets themselves.
"""
import os

import pytest

from envgs_tpu.engine import load_config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(rel):
    return load_config(os.path.join(ROOT, rel))


def test_sedan_chain_matches_reference_numbers():
    cfg = _load("configs/exps/envgs/ref_real/envgs_sedan.yaml")
    s = cfg.model_cfg.sampler_cfg
    # exps/envgs/ref_real/envgs_sedan.yaml:6-16
    assert s.densify_until_iter == 30000
    assert s.normal_prop_until_iter == 24000
    assert s.color_sabotage_until_iter == 24000
    assert s.env_densify_until_iter == 30000
    assert cfg.runner_cfg.epochs == 120
    assert cfg.runner_cfg.ep_iter == 500  # -> 60,000 iters
    # models/envgs.yaml:44-66
    assert s.render_reflection_start_iter == 3000
    assert s.sh_deg == 3 and s.env_sh_deg == 3
    assert s.max_gs == 2_000_000 and s.env_max_gs == 700_000
    assert s.env_opacity_reset_interval == 6000
    assert s.env_densify_grad_threshold == 0.0001
    assert s.min_weight_threshold == 0.1
    assert s.xyz_lr_scheduler.lr_init == 0.00016
    assert s.xyz_lr_scheduler.lr_final == 0.0000016
    assert s.xyz_lr_scheduler.max_steps == 30000
    # datasets/ref_real/{ref_real,sedan}.yaml
    assert cfg.dataset_cfg.ratio == 0.25
    assert cfg.dataset_cfg.data_root.endswith("ref_real/sedan")
    assert s.spatial_scale == pytest.approx(5.231606340408326)
    assert s.env_bounds[0][0] == pytest.approx(-15.41093584)
    assert s.preload_gs.endswith("sedan/sparse/0/points3D.ply")
    assert s.env_preload_gs.endswith("sedan/envs/points3D.ply")
    # every-8th-view protocol as explicit lists (158 views)
    train = cfg.dataset_cfg.view_sample
    val = cfg.val_dataset_cfg.view_sample
    assert len(train) == 138 and len(val) == 20
    assert set(train) == {i for i in range(158) if i % 8 != 0}
    assert val == [i for i in range(0, 158, 8)]
    # models/envgs.yaml:70-81 loss recipe
    sup = cfg.model_cfg.supervisor_cfg
    assert sup.img_loss_weight == 0.8 and sup.img_loss_type == "L1"
    assert sup.ssim_loss_weight == 0.2
    assert sup.gs_norm_loss_weight == 0.04
    assert sup.norm_loss_weight == 0.01
    assert sup.perc_loss_weight == 0.01
    assert sup.perc_loss_start_iter == 21000
    assert cfg.exp_name == "envgs_sedan"


def test_shiny_blender_toaster_chain():
    cfg = _load("configs/exps/envgs/shiny_blender/envgs_toaster.yaml")
    s = cfg.model_cfg.sampler_cfg
    # models/envgs_synth.yaml: synthetic recipe
    assert s.render_reflection_start_iter == 6000
    assert s.sh_start_iter == 10000 and s.env_sh_start_iter == 10000
    assert s.init_specular == 0.1
    assert s.min_weight_threshold is None  # turned off
    assert s.env_densify_until_iter == 42000
    assert s.env_opacity_reset_interval == 3000
    assert s.acc_filtering_start_iter == 30000
    assert cfg.runner_cfg.epochs == 120
    # dataset: ratio 1, white bg, blender split dirs
    assert cfg.dataset_cfg.ratio == 1.0
    assert s.white_bg is True
    assert cfg.dataset_cfg.data_root.endswith("toaster/train")
    assert cfg.val_dataset_cfg.data_root.endswith("toaster/test")
    assert cfg.dataset_cfg.view_sample == [0, None, 1]
    assert s.spatial_scale == pytest.approx(5.202147674560547)
    # synth loss recipe: acc-scaled normal losses, no perceptual
    sup = cfg.model_cfg.supervisor_cfg
    assert sup.use_acc_scale_gs_norm_loss is True
    assert sup.use_dpt_scale_gs_norm_loss is False
    assert sup.gs_norm_loss_start_iter == 4000
    assert sup.perc_loss_weight == 0.0


def test_every_scene_config_resolves():
    """All 16 experiment stacks load, chain, and carry scene pins."""
    sets = {
        "ref_real": ["sedan", "spheres", "toycar"],
        "shiny_blender": ["ball", "car", "coffee", "helmet", "teapot",
                          "toaster"],
        "nerf_casting": ["compact", "grinder", "hatchback", "toaster"],
        "envgs": ["audi", "dog", "room"],
    }
    for set_, scenes in sets.items():
        for scene in scenes:
            cfg = _load(f"configs/exps/envgs/{set_}/envgs_{scene}.yaml")
            s = cfg.model_cfg.sampler_cfg
            assert cfg.exp_name == f"envgs_{scene}"
            assert s.spatial_scale > 0, (set_, scene)
            assert s.preload_gs and s.env_preload_gs, (set_, scene)
            assert cfg.dataset_cfg.source == "multiview"
            assert s.render_reflection is True


def test_scene_exp_overrides():
    # exps/envgs/ref_real/envgs_spheres.yaml:6-12
    cfg = _load("configs/exps/envgs/ref_real/envgs_spheres.yaml")
    assert cfg.model_cfg.sampler_cfg.init_specular == 0.1
    assert cfg.model_cfg.sampler_cfg.sh_start_iter == 10000
    assert cfg.model_cfg.supervisor_cfg.perc_loss_weight == 0.1
    # exps/envgs/ref_real/envgs_toycar.yaml: 60 epochs -> 30k iters
    cfg = _load("configs/exps/envgs/ref_real/envgs_toycar.yaml")
    assert cfg.runner_cfg.epochs == 60
    # exps/envgs/shiny_blender/envgs_ball.yaml: init_specular 0.8
    cfg = _load("configs/exps/envgs/shiny_blender/envgs_ball.yaml")
    assert cfg.model_cfg.sampler_cfg.init_specular == 0.8
    # nerf_casting recipes push perceptual loss to 45k
    cfg = _load("configs/exps/envgs/nerf_casting/envgs_grinder.yaml")
    assert cfg.model_cfg.supervisor_cfg.perc_loss_start_iter == 45000
    assert cfg.model_cfg.sampler_cfg.init_specular == 0.01
    # envgs room: ratio 1.0, eval_ep 30
    cfg = _load("configs/exps/envgs/envgs/envgs_room.yaml")
    assert cfg.dataset_cfg.ratio == 1.0
    assert cfg.runner_cfg.eval_ep == 30


def test_builder_consumes_reference_keys(monkeypatch, tmp_path):
    """build_from_config maps the reference key names: the alias
    render_reflection_start_iter, xyz_lr_scheduler, white_bg,
    spatial_scale pin, min_weight_threshold null."""
    from envgs_tpu.cli import build_from_config

    cfg = _load("configs/exps/envgs/shiny_blender/envgs_toaster.yaml")
    # swap the (absent) on-disk dataset for the synthetic source but keep
    # every model/recipe key from the real chain
    cfg["dataset_cfg"] = {"source": "synthetic", "H": 32, "W": 32,
                          "n_views": 4, "eval_every": 4}
    cfg["model_cfg"]["sampler_cfg"]["pool_cap"] = 2048
    cfg["model_cfg"]["sampler_cfg"]["env_pool_cap"] = 512
    (views, eval_views, base, env, model_cfg, loss_cfg, sched, dens_base,
     dens_env, lr_base, lr_env, aux_cfg) = build_from_config(cfg)
    assert model_cfg.reflection_start_iter == 6000  # via the alias
    assert model_cfg.bg_brightness == 1.0  # white_bg
    assert model_cfg.acc_filtering_start_iter == 30000
    assert sched.sh_start_iter == 10000
    assert sched.reflection_start_iter == 6000
    assert sched.init_specular == 0.1
    assert lr_base.xyz_lr_init == 0.00016
    assert lr_base.xyz_lr_max_steps == 30000
    assert dens_base.min_weight_threshold is None
    assert dens_env.min_weight_threshold == 0.1
    assert dens_base.max_gs == 2_000_000
    assert dens_env.max_gs == 700_000
    assert loss_cfg.use_acc_scale_gs_norm_loss is True
    assert loss_cfg.use_dpt_scale_gs_norm_loss is False
    # spatial_scale pinned by the scene config, not the camera sphere
    assert lr_base.spatial_scale == pytest.approx(5.202147674560547)


def test_explicit_view_sample_list(tmp_path):
    """MultiViewDataset: len!=3 view_sample is an explicit index list
    (volumetric_video_dataset.py:784-785 semantics)."""
    import numpy as np

    from envgs_tpu.data.dataset import MultiViewDataset
    from envgs_tpu.utils.easycam import write_cameras

    root = str(tmp_path)
    n = 10
    cams = {}
    rng = np.random.default_rng(0)
    for i in range(n):
        name = f"{i:02d}"
        cams[name] = dict(
            K=np.array([[50.0, 0, 16], [0, 50.0, 16], [0, 0, 1]]),
            R=np.eye(3), T=rng.normal(size=(3, 1)) * 0.01,
            H=32, W=32,
        )
        d = os.path.join(root, "images", name)
        os.makedirs(d)
        from PIL import Image

        Image.fromarray(
            (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        ).save(os.path.join(d, "000000.jpg"))
    write_cameras(cams, root)

    ds = MultiViewDataset(root, view_sample=[1, 3, 5, 7], eval_every=0)
    assert [v.name for v in ds.views] == ["01", "03", "05", "07"]
    # 3-element form stays [begin, end, step]
    ds2 = MultiViewDataset(root, view_sample=[0, None, 2], eval_every=0)
    assert [v.name for v in ds2.views] == ["00", "02", "04", "06", "08"]
