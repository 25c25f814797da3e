"""Golden-render parity tests: every committed tests/golden/<name>/ scene
renders through the production ply->pool->rasterize pipeline and must hit
its own camera.json psnr_threshold against the committed golden.png.

The synthetic scene is committed (scripts/make_golden.py regenerates it);
reference checkpoints (BASELINE.json config 1) drop in with no code change.
"""
import json
import os

import numpy as np
import pytest

from tests.golden_harness import golden_dirs, psnr_vs_golden


@pytest.mark.parametrize("scene_dir", golden_dirs(),
                         ids=[os.path.basename(d) for d in golden_dirs()])
def test_golden_render(scene_dir):
    with open(os.path.join(scene_dir, "camera.json")) as fh:
        thr = json.load(fh).get("psnr_threshold", 35.0)
    psnr = psnr_vs_golden(scene_dir, backend="pallas_interp")
    assert psnr >= thr, f"{os.path.basename(scene_dir)}: {psnr:.2f} < {thr}"


def test_golden_assets_exist():
    assert golden_dirs(), "no committed golden scenes found"
