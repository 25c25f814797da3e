"""Generate the real-dataset config stacks (ref_real / shiny_blender /
nerf_casting / envgs) mirroring the reference's experiment recipes.

The reference ships explicit per-split view_sample index lists in its
dataset configs (e.g. configs/datasets/ref_real/sedan.yaml): train views
are every index in [0, n_views) NOT divisible by 8, val views are the
multiples of 8 — the every-8th-view protocol of
scripts/preprocess/tools/compute_metadata.py:58-65. This script generates
those lists from each scene's view count instead of copying them, plus the
scene-pinned values (data_root layout, spatial_scale, env_bounds) cited
from the reference config of the same name.

Run from the repo root:  python scripts/gen_dataset_configs.py
Idempotent — rewrites configs/datasets/** and configs/exps/envgs/**.
"""
from __future__ import annotations

import os
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fmt_list(vals, indent=6, width=78):
    body = ", ".join(str(v) for v in vals)
    lines = textwrap.wrap(body, width=width - indent)
    pad = " " * indent
    return "[" + ("\n" + pad).join(lines) + "]"


def split_views(n):
    train = [i for i in range(n) if i % 8 != 0]
    val = [i for i in range(0, n, 8)]
    return train, val


def write(path, text):
    path = os.path.join(ROOT, path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)
    print("wrote", path)


# ---------------------------------------------------------------------------
# set-level dataset configs (ratio / bounds shared by every scene of a set)
# ---------------------------------------------------------------------------

SET_HEADERS = {
    # configs/datasets/ref_real/ref_real.yaml:1-14
    "ref_real": dict(ratio=0.25, bounds=20.0, white_bg=False),
    # configs/datasets/nerf-casting/nerf-casting.yaml:1-14
    "nerf_casting": dict(ratio=0.25, bounds=20.0, white_bg=False),
    # configs/datasets/envgs/envgs.yaml:1-12
    "envgs": dict(ratio=0.25, bounds=20.0, white_bg=False),
    # configs/datasets/shiny_blender/shiny_blender.yaml:1-12 (ratio 1,
    # white bg, tight synthetic bounds)
    "shiny_blender": dict(ratio=1.0, bounds=1.3, white_bg=True),
}

for name, h in SET_HEADERS.items():
    b = h["bounds"]
    extra = "    white_bg: true\n" if h["white_bg"] else ""
    e = 20.0 if name != "shiny_blender" else 50.0
    write(f"configs/datasets/{name}/{name}.yaml", f"""\
# Set-level defaults for the {name} scenes (reference
# configs/datasets/{name.replace('_', '-') if name == 'nerf_casting' else name}/*.yaml)
dataset_cfg:
  source: multiview
  ratio: {h['ratio']}
  eval_every: 0   # explicit per-split view_sample lists in scene configs

model_cfg:
  sampler_cfg:
    bounds: [[-{b}, -{b}, -{b}], [{b}, {b}, {b}]]
    env_bounds: [[-{e}, -{e}, -{e}], [{e}, {e}, {e}]]
{extra}""")

# ---------------------------------------------------------------------------
# scene-level dataset configs
# ---------------------------------------------------------------------------

# (set, scene, n_views, data_root, spatial_scale, env_bounds or None,
#  ratio override or None)
REAL_SCENES = [
    # configs/datasets/ref_real/{sedan,gardenspheres,toycar}.yaml
    ("ref_real", "sedan", 158, "data/datasets/refnerf/ref_real/sedan",
     5.231606340408326,
     [[-15.41093584, -9.52983853, -26.35259539],
      [28.42411913, 10.86091045, 17.71185112]], None),
    ("ref_real", "gardenspheres", 151,
     "data/datasets/refnerf/ref_real/gardenspheres",
     5.209678745269776,
     [[-20.0, -20.0, -20.0], [20.0, 20.0, 20.0]], None),
    ("ref_real", "toycar", 122, "data/datasets/refnerf/ref_real/toycar",
     7.47562255859375,
     [[-20.0, -20.0, -20.0], [20.0, 20.0, 20.0]], None),
    # configs/datasets/nerf-casting/{compact,grinder,hatchback,toaster}.yaml
    ("nerf_casting", "compact", 332, "data/datasets/nerf-casting/compact",
     5.295990228652954,
     [[-33.82586667907278, -5.20960147094741, -10.367035359781667],
      [25.288327476254402, 2.3769607657873673, 12.855568372777459]], None),
    ("nerf_casting", "grinder", 231, "data/datasets/nerf-casting/grinder",
     5.271625185012818,
     [[-15.887244553029737, -15.072210727799286, -12.59473094096052],
      [22.002262623443315, 15.22537460529968, 20.851396049357824]], None),
    ("nerf_casting", "hatchback", 308,
     "data/datasets/nerf-casting/hatchback", 4.888799953460694,
     [[-16.791121526170997, -7.629639543079618, -16.906692175248942],
      [10.841170802901207, 3.0378974283595213, 23.334149332566778]], None),
    ("nerf_casting", "toaster", 348, "data/datasets/nerf-casting/toaster",
     5.333385944366455,
     [[-15.275330721926242, -5.959935539638103, -5.124253128989539],
      [9.598054620897013, 12.531957972964317, 14.065504243449332]], None),
    # configs/datasets/envgs/{audi,dog,room}.yaml
    ("envgs", "audi", 202, "data/datasets/envgs/audi", 6.437488746643067,
     [[-24.43369652781677, -9.675989911182787, -21.932267889066896],
      [24.759688617142107, 1.977861847608774, 54.04323229716381]], None),
    ("envgs", "dog", 207, "data/datasets/envgs/dog", 5.345488214492798,
     [[-56.30226603723631, -19.476656839171252, -41.3017857618471],
      [37.80840767270835, 27.530485924839798, 24.619118153956567]], 0.5),
    ("envgs", "room", 926, "data/datasets/envgs/room", 6.356000524464478,
     [[-5.438243865966797, -2.206955909729004, -4.81279182434082],
      [5.665380001068115, 2.0093278884887695, 5.748971939086914]], 1.0),
]

for set_, scene, n, root, sscale, ebounds, ratio in REAL_SCENES:
    train, val = split_views(n)
    # room keeps its non-sparse ply layout (configs/datasets/envgs/room.yaml)
    if scene == "room":
        ply = f"{root}/points3d.ply"
        envply = f"{root}/envs/points3d_sfm.ply"
    else:
        ply = f"{root}/sparse/0/points3D.ply"
        envply = f"{root}/envs/points3D.ply"
    ratio_line = f"\n  ratio: {ratio}" if ratio is not None else ""
    eb = ("[" + ", ".join(
        "[" + ", ".join(repr(x) for x in row) + "]" for row in ebounds)
        + "]")
    write(f"configs/datasets/{set_}/{scene}.yaml", f"""\
# Scene config mirroring the reference configs/datasets/
# {set_.replace('_', '-') if set_ == 'nerf_casting' else set_}/{scene}.yaml
# ({n} capture views; train = indices not divisible by 8, val = every 8th —
# the compute_metadata.py:58-65 protocol)
configs: [configs/datasets/{set_}/{set_}.yaml]

dataset_cfg:
  data_root: {root}{ratio_line}
  view_sample: {fmt_list(train, indent=16)}

val_dataset_cfg:
  view_sample: {fmt_list(val, indent=16)}

model_cfg:
  sampler_cfg:
    preload_gs: {ply}
    spatial_scale: {sscale}
    env_preload_gs: {envply}
    env_bounds: {eb}
""")

# shiny_blender scenes: separate train/test directories, [0, null, 1]
SB_SCENES = [
    # configs/datasets/shiny_blender/*.yaml: per-scene spatial_scale
    ("ball", 4.773876905441284),
    ("car", 5.202147674560547),
    ("coffee", 5.202147674560547),
    ("helmet", 5.202147674560547),
    ("teapot", 5.118052291870118),
    ("toaster", 5.202147674560547),
]

for scene, sscale in SB_SCENES:
    root = f"data/datasets/refnerf/shiny_blender/{scene}"
    write(f"configs/datasets/shiny_blender/{scene}.yaml", f"""\
# Scene config mirroring the reference
# configs/datasets/shiny_blender/{scene}.yaml (blender-style split dirs)
configs: [configs/datasets/shiny_blender/shiny_blender.yaml]

dataset_cfg:
  data_root: {root}/train
  view_sample: [0, null, 1]

val_dataset_cfg:
  data_root: {root}/test
  view_sample: [0, null, 1]

model_cfg:
  sampler_cfg:
    preload_gs: {root}/points/pcds/points3d.ply
    spatial_scale: {sscale}
    env_preload_gs: {root}/points/envs/points3d.ply
    env_bounds: [[-50.0, -50.0, -50.0], [50.0, 50.0, 50.0]]
""")

# ---------------------------------------------------------------------------
# experiment configs
# ---------------------------------------------------------------------------

# (set dir, scene, model yaml, extra exp-level overrides)
EXPS = [
    # exps/envgs/ref_real/*.yaml
    ("ref_real", "sedan", "envgs", {
        "model_cfg.sampler_cfg.densify_until_iter": 30000,
        "model_cfg.sampler_cfg.normal_prop_until_iter": 24000,
        "model_cfg.sampler_cfg.color_sabotage_until_iter": 24000,
        "model_cfg.sampler_cfg.env_densify_until_iter": 30000,
        "runner_cfg.epochs": 120}),
    ("ref_real", "spheres", "envgs", {
        "_dataset": "gardenspheres",
        "model_cfg.sampler_cfg.init_specular": 0.1,
        "model_cfg.sampler_cfg.sh_start_iter": 10000,
        "model_cfg.supervisor_cfg.perc_loss_weight": 0.1}),
    ("ref_real", "toycar", "envgs", {
        "model_cfg.sampler_cfg.sh_start_iter": 10000,
        "runner_cfg.epochs": 60}),
    # exps/envgs/shiny_blender/*.yaml
    ("shiny_blender", "ball", "envgs_synth",
     {"model_cfg.sampler_cfg.init_specular": 0.8}),
    ("shiny_blender", "car", "envgs_synth", {}),
    ("shiny_blender", "coffee", "envgs_synth", {}),
    ("shiny_blender", "helmet", "envgs_synth", {}),
    ("shiny_blender", "teapot", "envgs_synth", {}),
    ("shiny_blender", "toaster", "envgs_synth", {}),
    # exps/envgs/nerf_casting/*.yaml
    ("nerf_casting", "compact", "envgs", {
        "model_cfg.supervisor_cfg.perc_loss_start_iter": 45000,
        "runner_cfg.epochs": 120}),
    ("nerf_casting", "grinder", "envgs", {
        "model_cfg.sampler_cfg.init_specular": 0.01,
        "model_cfg.supervisor_cfg.perc_loss_start_iter": 45000,
        "runner_cfg.epochs": 120}),
    ("nerf_casting", "hatchback", "envgs", {
        "model_cfg.supervisor_cfg.perc_loss_start_iter": 45000,
        "runner_cfg.epochs": 120}),
    ("nerf_casting", "toaster", "envgs", {
        "model_cfg.sampler_cfg.init_specular": 0.01,
        "model_cfg.supervisor_cfg.perc_loss_start_iter": 45000,
        "runner_cfg.epochs": 120}),
    # exps/envgs/envgs/*.yaml
    ("envgs", "audi", "envgs", {
        "model_cfg.supervisor_cfg.perc_loss_start_iter": 45000,
        "runner_cfg.epochs": 120}),
    ("envgs", "dog", "envgs", {
        "model_cfg.supervisor_cfg.perc_loss_start_iter": 45000,
        "runner_cfg.epochs": 120}),
    ("envgs", "room", "envgs", {
        "model_cfg.supervisor_cfg.perc_loss_start_iter": 45000,
        "runner_cfg.epochs": 120,
        "runner_cfg.eval_ep": 30}),
]


def nest(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split(".")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return tree


def dump(d, indent=0):
    out = []
    for k, v in d.items():
        pad = "  " * indent
        if isinstance(v, dict):
            out.append(f"{pad}{k}:")
            out.append(dump(v, indent + 1))
        else:
            out.append(f"{pad}{k}: {v}")
    return "\n".join(out)


for set_, scene, model, flat in EXPS:
    flat = dict(flat)
    ds = flat.pop("_dataset", scene)
    refset = set_.replace("_", "-") if set_ == "nerf_casting" else set_
    body = dump(nest(flat)) + "\n\n" if flat else ""
    write(f"configs/exps/envgs/{set_}/envgs_{scene}.yaml", f"""\
# Mirrors the reference configs/exps/envgs/{refset}/envgs_{scene}.yaml
configs:
  - configs/models/{model}.yaml
  - configs/datasets/{set_}/{ds}.yaml

{body}exp_name: '{{{{fileBasenameNoExtension}}}}'
""")

print("done")
