"""Config-driven training for every model family via the CLI dispatch.

The reference builds all components through REGISTRY.build(cfg); the parity
contract here is that `python -m envgs_tpu train -c <cfg>` trains each
family end-to-end purely from its config's `type:` names. Each test runs a
few iterations at tiny scale and checks the metrics/checkpoint artifacts.
"""
import json
import os

import numpy as np
import pytest

from envgs_tpu import cli


def _run(tmp_path, config, overrides=()):
    cli.main(["train", "-c", config,
              f"out_root={tmp_path}", *overrides])
    exp = None
    with open(config) as f:
        for line in f:
            if line.startswith("exp_name:"):
                exp = line.split(":")[1].strip()
    mpath = os.path.join(tmp_path, "result", exp, "metrics.json")
    assert os.path.exists(mpath), f"no metrics.json for {exp}"
    with open(mpath) as f:
        summary = json.load(f)["summary"]
    assert np.isfinite(summary["psnr_mean"])
    assert os.path.exists(
        os.path.join(tmp_path, "trained_model", exp, "latest.npz")
    ) or os.path.exists(
        os.path.join(tmp_path, "trained_model", exp, "point_cloud.ply")
    )
    return summary


@pytest.mark.slow
def test_nerf_family_from_config(tmp_path):
    s = _run(str(tmp_path), "configs/exps/nerf_synthetic.yaml",
             ["runner_cfg.ep_iter=60", "runner_cfg.n_rays=256"])
    assert s["psnr_mean"] > 5.0


@pytest.mark.slow
def test_neus_family_from_config(tmp_path):
    s = _run(str(tmp_path), "configs/exps/neus_synthetic.yaml",
             ["runner_cfg.ep_iter=40", "runner_cfg.n_rays=128",
              "model_cfg.network_cfg.n_samples=16"])
    assert s["psnr_mean"] > 5.0


@pytest.mark.slow
def test_enerf_family_from_config(tmp_path):
    s = _run(str(tmp_path), "configs/exps/enerf_synthetic.yaml",
             ["runner_cfg.ep_iter=30", "dataset_cfg.H=48",
              "dataset_cfg.W=48"])
    assert s["psnr_mean"] > 5.0


@pytest.mark.slow
def test_point_planes_family_from_config(tmp_path):
    s = _run(str(tmp_path), "configs/exps/point_planes_synthetic.yaml",
             ["runner_cfg.ep_iter=40"])
    assert s["psnr_mean"] > 5.0
