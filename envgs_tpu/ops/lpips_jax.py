"""LPIPS(VGG16) as a pure-JAX graph, ready to fire when weights exist.

The reference evaluates LPIPS with VGG features
(/root/reference/easyvolcap/utils/metric_utils.py:93) and trains with a
0.01-weighted perceptual loss from iter 21k
(/root/reference/configs/models/envgs.yaml:80-81). This zero-egress image
ships no pretrained VGG weights, so the graph loads them from a
configurable path (ENVGS_VGG16_NPZ env var or data/weights/vgg16.npz) —
the evaluator and the perceptual training loss pick it up automatically the
moment the file exists. `save_weights_from_torchvision` converts a
torchvision checkpoint to the npz layout on a machine that has one.

Formula parity: identical to the host torch fallback in ops/losses.py —
input scaling (x*2-1 - mean)/std, VGG16 feature taps after relu1_2 /
relu2_2 / relu3_3 / relu4_3 / relu5_3, channel-unit-normalized squared
differences, mean per tap, summed (verified by tests/test_lpips_jax.py on
random weights).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 "features" conv channel plan; 'M' = 2x2/2 max pool
_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
         512, 512, 512, "M", 512, 512, 512, "M"]
# taps: indices into the conv/pool sequence AFTER whose relu we tap
_TAPS = {1, 3, 6, 9, 12}  # conv indices (0-based over convs only)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def default_weight_path() -> str:
    return os.environ.get(
        "ENVGS_VGG16_NPZ", os.path.join("data", "weights", "vgg16.npz"))


def load_weights(path: str | None = None):
    """npz {conv0_w (kh,kw,cin,cout), conv0_b (cout), ..., lin0_w (C0,), ...}
    -> (convs, lins).

    `lin{i}_w` are the LPIPS package's learned per-channel calibration
    weights (its lin0..lin4 1x1 convs, squeezed) — WITHOUT them the tap
    distance is plain unit-normalized VGG perceptual distance, not LPIPS,
    and numbers are not comparable to published tables. When the npz lacks
    them, lins is None and lpips_pair falls back to the uncalibrated
    formula (documented in the evaluator output).

    Returns None when the file does not exist (callers fall back / NaN)."""
    path = path or default_weight_path()
    if not os.path.exists(path):
        return None
    z = np.load(path)
    convs = []
    i = 0
    while f"conv{i}_w" in z:
        convs.append((jnp.asarray(z[f"conv{i}_w"]),
                      jnp.asarray(z[f"conv{i}_b"])))
        i += 1
    if not convs:
        return None
    lins = None
    if "lin0_w" in z:
        lins = []
        j = 0
        while f"lin{j}_w" in z:
            lins.append(jnp.asarray(z[f"lin{j}_w"]).reshape(-1))
            j += 1
    return (convs, lins)


def save_weights_from_torchvision(path: str | None = None) -> str:
    """Convert torchvision's VGG16 checkpoint to the npz layout, and ALSO
    export the `lpips` package's lin0..lin4 calibration weights when that
    package is importable (requires both checkpoints to be downloadable or
    cached — run off-image). Without the lin weights the npz still loads,
    but distances are uncalibrated VGG perceptual distance, not LPIPS."""
    import torchvision

    net = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    path = path or default_weight_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    out = {}
    i = 0
    for layer in net:
        if layer.__class__.__name__ == "Conv2d":
            w = layer.weight.detach().numpy()  # (cout, cin, kh, kw)
            out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))
            out[f"conv{i}_b"] = layer.bias.detach().numpy()
            i += 1
    try:  # the reference's net='vgg' calibration (metric_utils.py:93)
        import lpips as _lpips_pkg

        m = _lpips_pkg.LPIPS(net="vgg", verbose=False)
        for j, lin in enumerate(m.lins):
            w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
            out[f"lin{j}_w"] = w.reshape(-1)
    except Exception as e:  # pragma: no cover - environment dependent
        print(f"[lpips_jax] lin weights NOT exported ({e}); npz will give "
              "uncalibrated VGG distance")
    np.savez_compressed(path, **out)
    return path


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b[None, None, None, :]


def _pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def vgg16_taps(params, x):
    """x (N, H, W, 3) in [0,1] -> list of tap feature maps (post-relu)."""
    h = ((x * 2.0 - 1.0) - _SHIFT) / _SCALE
    taps = []
    ci = 0
    for item in _PLAN:
        if item == "M":
            h = _pool(h)
            continue
        w, b = params[ci]
        h = jax.nn.relu(_conv(h, w, b))
        if ci in _TAPS:
            taps.append(h)
        ci += 1
    return taps


def lpips_pair(params, x, y):
    """LPIPS distance between (H, W, 3) images in [0,1] (jittable,
    differentiable — usable as the perceptual training loss).

    params: (convs, lins) from load_weights, or a bare convs list (legacy).
    With lins, each tap computes the true LPIPS
        d_i = mean_hw( sum_c lin_i[c] * (nx - ny)_c^2 )
    (the lpips package's lin 1x1 convs + spatial_average); without lins it
    degrades to the unit-normalized tap MSE (uncalibrated VGG distance)."""
    convs, lins = params if isinstance(params, tuple) else (params, None)
    fx = vgg16_taps(convs, x[None])
    fy = vgg16_taps(convs, y[None])
    dist = 0.0
    for i, (ax, ay) in enumerate(zip(fx, fy)):
        nx = ax * jax.lax.rsqrt(
            jnp.sum(ax * ax, axis=-1, keepdims=True) + 1e-10)
        ny = ay * jax.lax.rsqrt(
            jnp.sum(ay * ay, axis=-1, keepdims=True) + 1e-10)
        d2 = (nx - ny) ** 2
        if lins is not None:
            dist = dist + jnp.mean(jnp.sum(d2 * lins[i], axis=-1))
        else:
            dist = dist + jnp.mean(d2)
    return dist


@functools.lru_cache(maxsize=1)
def jitted_lpips(path: str | None = None):
    """(fn, found): jitted LPIPS closure over weights at `path`, or
    (None, False) when no weight file exists."""
    params = load_weights(path)
    if params is None:
        return None
    fn = jax.jit(functools.partial(lpips_pair, params))
    return fn
