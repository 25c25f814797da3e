"""Family loops get the real runner services (VERDICT r2 #6): resume after
a crash, periodic latest.npz checkpointing, recorder scalars, and the
STGS/FDGS config training path."""
import glob
import os

import numpy as np
import pytest

from envgs_tpu.engine import Config


def _nerf_cfg(tmp, iters, save_every=4):
    return Config.wrap({
        "exp_name": "fam_nerf",
        "out_root": tmp,
        "dataset_cfg": {"source": "synthetic", "H": 24, "W": 24,
                        "n_views": 4},
        "model_cfg": {"sampler_cfg": {"type": "ImportanceSampler",
                                      "n_samples": [8, 8],
                                      "width": 16, "depth": 2,
                                      "feat_dim": 16}},
        "runner_cfg": {"epochs": 1, "ep_iter": iters, "n_rays": 64,
                       "log_interval": 50, "save_latest_every": save_every,
                       "record": True},
    })


@pytest.mark.slow
def test_family_resume_after_kill(tmp_path):
    """A second invocation must pick up from the periodic latest.npz (the
    kill-9-at-mid-train scenario): start_iter > 0 and the checkpoint's
    params are what training continues from."""
    from envgs_tpu.train.families import FamilyLoop, train_nerf

    tmp = str(tmp_path)
    # "crashed" run: 8 iters, saving every 4 -> latest.npz @ iter 8
    train_nerf(_nerf_cfg(tmp, 8))
    path = os.path.join(tmp, "trained_model", "fam_nerf", "latest.npz")
    assert os.path.exists(path)
    z = np.load(path)
    assert int(z["iter"]) == 8
    assert any(k.startswith("o") for k in z.files), "optimizer state saved"

    # resumed run with a longer schedule starts at 8, not 0
    cfg2 = _nerf_cfg(tmp, 12)
    loop = FamilyLoop(cfg2, "fam_nerf")
    import jax
    import jax.numpy as jnp

    from envgs_tpu.models.nerf import NerfConfig, make_nerf_train_step

    ncfg = NerfConfig(n_samples=(8, 8), width=16, depth=2, feat_dim=16)
    init, _ = make_nerf_train_step(ncfg, 5e-4)
    params, opt_state = init(jax.random.PRNGKey(0))
    p2, o2, start = loop.restore(params, opt_state)
    assert start == 8
    # restored leaves equal the checkpoint, not the fresh init
    flat = jax.tree_util.tree_leaves(p2)
    ck = [z[f"p{i}"] for i in range(len(flat))]
    assert all(np.allclose(a, b) for a, b in zip(flat, ck))

    # recorder wrote tfevents
    ev = glob.glob(os.path.join(tmp, "record", "fam_nerf", "**",
                                "events*"), recursive=True)
    assert ev, "recorder scalars missing"


@pytest.mark.slow
def test_stgs_family_from_config(tmp_path):
    """STGS/FDGS trains through the TRAINERS dispatch like every family
    (VERDICT r2 #4): config in, metrics + 4D ply out."""
    from envgs_tpu.engine import TRAINERS
    from envgs_tpu.train import families  # noqa: F401

    assert "STGSModel" in TRAINERS and "STGSSampler" in TRAINERS
    tmp = str(tmp_path)
    cfg = Config.wrap({
        "exp_name": "fam_stgs",
        "out_root": tmp,
        "dataset_cfg": {"source": "synthetic", "H": 32, "W": 32,
                        "n_views": 6},
        "model_cfg": {"sampler_cfg": {
            "type": "STGSModel", "n_points": 256, "pool_cap": 512,
            "sh_degree": 1, "pair_cap": 2 ** 13,
            "densification_interval": 10 ** 9}},
        "runner_cfg": {"epochs": 1, "ep_iter": 30, "log_interval": 10,
                       "save_latest_every": 10},
    })
    summary = TRAINERS.get("STGSModel")(cfg)
    assert summary is not None and np.isfinite(
        summary["summary"]["psnr_mean"])
    assert os.path.exists(os.path.join(tmp, "trained_model", "fam_stgs",
                                       "point_cloud.ply"))
    assert os.path.exists(os.path.join(tmp, "trained_model", "fam_stgs",
                                       "latest.npz"))
