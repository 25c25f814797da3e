"""Pure-JAX LPIPS graph vs the torch-host fallback formula, on RANDOM VGG16
weights (no pretrained checkpoint in this image): identical architecture,
scaling, taps and normalization must agree to f32 tolerance."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from envgs_tpu.ops.lpips_jax import _PLAN, lpips_pair  # noqa: E402


def _random_vgg(seed=0):
    """Matching torch Sequential + JAX params with random weights."""
    import torch.nn as nn

    g = torch.Generator().manual_seed(seed)
    layers = []
    params = []
    cin = 3
    for item in _PLAN:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
            continue
        conv = nn.Conv2d(cin, item, 3, padding=1)
        with torch.no_grad():
            conv.weight.copy_(torch.randn(conv.weight.shape, generator=g) * 0.1)
            conv.bias.copy_(torch.randn(conv.bias.shape, generator=g) * 0.05)
        layers.append(conv)
        layers.append(nn.ReLU())
        params.append((
            jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
            jnp.asarray(conv.bias.detach().numpy()),
        ))
        cin = item
    return nn.Sequential(*layers).eval(), params


def _torch_lpips(net, x, y):
    """The ops/losses.py host-fallback formula, verbatim."""
    def prep(a):
        a = np.asarray(a, np.float32).transpose(2, 0, 1)[None]
        t = torch.from_numpy(a) * 2 - 1
        mean = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        std = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        return (t - mean) / std

    taps = {3, 8, 15, 22, 29}
    with torch.no_grad():
        fx, fy = prep(x), prep(y)
        dist = 0.0
        for i, layer in enumerate(net):
            fx, fy = layer(fx), layer(fy)
            if i in taps:
                nx = fx / (fx.norm(dim=1, keepdim=True) + 1e-10)
                ny = fy / (fy.norm(dim=1, keepdim=True) + 1e-10)
                dist = dist + ((nx - ny) ** 2).mean()
    return float(dist)


def test_lpips_jax_matches_torch_formula():
    net, params = _random_vgg()
    rng = np.random.default_rng(0)
    x = rng.random((64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.1, size=x.shape), 0, 1).astype(
        np.float32)
    ref = _torch_lpips(net, x, y)
    got = float(lpips_pair(params, jnp.asarray(x), jnp.asarray(y)))
    assert got == pytest.approx(ref, rel=2e-4), (got, ref)
    # identity distance is ~0
    same = float(lpips_pair(params, jnp.asarray(x), jnp.asarray(x)))
    assert same < 1e-9


@pytest.mark.slow
def test_lpips_weight_roundtrip(tmp_path):
    """save/load npz layout round-trips through load_weights."""
    from envgs_tpu.ops.lpips_jax import load_weights

    _, params = _random_vgg()
    path = str(tmp_path / "vgg16.npz")
    np.savez_compressed(
        path,
        **{f"conv{i}_w": np.asarray(w) for i, (w, _) in enumerate(params)},
        **{f"conv{i}_b": np.asarray(b) for i, (_, b) in enumerate(params)},
    )
    convs, lins = load_weights(path)
    assert len(convs) == len(params) and lins is None
    rng = np.random.default_rng(1)
    x = rng.random((32, 32, 3)).astype(np.float32)
    y = rng.random((32, 32, 3)).astype(np.float32)
    a = float(lpips_pair(params, jnp.asarray(x), jnp.asarray(y)))
    b = float(lpips_pair((convs, lins), jnp.asarray(x), jnp.asarray(y)))
    assert a == pytest.approx(b, rel=1e-6)


@pytest.mark.slow
def test_lpips_lin_calibration_matches_package_formula(tmp_path):
    """With lin{i}_w in the npz, lpips_pair applies the lpips package's
    calibration: d = sum_i spatial_mean( sum_c lin_i[c] * (nx - ny)_c^2 )
    — verified against a direct numpy evaluation of that formula on the
    jax tap features (random weights; VERDICT r2 #5)."""
    from envgs_tpu.ops.lpips_jax import load_weights, vgg16_taps

    _, params = _random_vgg()
    chans = [64, 128, 256, 512, 512]
    rng = np.random.default_rng(2)
    lins = [rng.random(c).astype(np.float32) for c in chans]
    path = str(tmp_path / "vgg16.npz")
    np.savez_compressed(
        path,
        **{f"conv{i}_w": np.asarray(w) for i, (w, _) in enumerate(params)},
        **{f"conv{i}_b": np.asarray(b) for i, (_, b) in enumerate(params)},
        **{f"lin{i}_w": w for i, w in enumerate(lins)},
    )
    loaded = load_weights(path)
    assert loaded[1] is not None and len(loaded[1]) == 5
    x = rng.random((32, 32, 3)).astype(np.float32)
    y = rng.random((32, 32, 3)).astype(np.float32)
    got = float(lpips_pair(loaded, jnp.asarray(x), jnp.asarray(y)))

    fx = vgg16_taps(params, jnp.asarray(x)[None])
    fy = vgg16_taps(params, jnp.asarray(y)[None])
    ref = 0.0
    for i, (ax, ay) in enumerate(zip(fx, fy)):
        ax, ay = np.asarray(ax), np.asarray(ay)
        nx = ax / (np.sqrt((ax ** 2).sum(-1, keepdims=True)) + 1e-10)
        ny = ay / (np.sqrt((ay ** 2).sum(-1, keepdims=True)) + 1e-10)
        d2 = (nx - ny) ** 2
        ref += ((d2 * lins[i]).sum(-1)).mean()  # lin 1x1 conv + spatial avg
    assert got == pytest.approx(float(ref), rel=2e-3), (got, ref)
