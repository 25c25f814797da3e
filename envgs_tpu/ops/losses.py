"""Image losses + quality metrics (pure JAX).

Covers the reference's supervision set (/root/reference/easyvolcap/utils/
loss_utils.py + metric_utils.py:21-99): l1/l2/charbonnier/huber, SSIM with
an 11x11 Gaussian window (conv formulation), MS-SSIM, PSNR, plus a gated
optional LPIPS (torch-free VGG LPIPS is deferred; see `lpips`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1(x, y):
    return jnp.mean(jnp.abs(x - y))


def l2(x, y):
    return jnp.mean((x - y) ** 2)


def mse(x, y):
    return l2(x, y)


def charbonnier(x, y, eps: float = 1e-3):
    return jnp.mean(jnp.sqrt((x - y) ** 2 + eps * eps))


def huber(x, y, delta: float = 1.0):
    d = jnp.abs(x - y)
    return jnp.mean(jnp.where(d < delta, 0.5 * d * d, delta * (d - 0.5 * delta)))


def l1_reg(x):
    return jnp.mean(jnp.abs(x))


def cos_sim(x, y, axis=-1, eps=1e-8):
    # smooth normalization: gradient-safe at zero vectors
    xn = x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps * eps)
    yn = y * jax.lax.rsqrt(jnp.sum(y * y, axis=axis, keepdims=True) + eps * eps)
    return jnp.sum(xn * yn, axis=axis)


def psnr(x, y, max_val: float = 1.0):
    m = jnp.mean((x - y) ** 2)
    return 10.0 * jnp.log10(max_val * max_val / jnp.clip(m, 1e-10, None))


def _gaussian_window(size: int, sigma: float):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def _filter2d_sep(img, win):
    """Separable 2D filter on (H, W, C), 'valid' padding.

    Implemented as shifted adds: 3-channel convolutions lower to ~1%-utilized
    MXU ops on TPU (measured seconds per SSIM backward at 1600px), while 2k
    slice-adds are bandwidth-bound VPU work.
    """
    k = win.shape[0]
    H, W = img.shape[0], img.shape[1]
    out = jnp.zeros((H - k + 1, img.shape[1], img.shape[2]), img.dtype)
    for i in range(k):
        out = out + win[i] * img[i:H - k + 1 + i]
    out2 = jnp.zeros((out.shape[0], W - k + 1, img.shape[2]), img.dtype)
    for i in range(k):
        out2 = out2 + win[i] * out[:, i:W - k + 1 + i]
    return out2


def _ssim_fields(x, y, win):
    """The five window-filtered moment maps SSIM is built from."""
    mu_x = _filter2d_sep(x, win)
    mu_y = _filter2d_sep(y, win)
    exx = _filter2d_sep(x * x, win)
    eyy = _filter2d_sep(y * y, win)
    exy = _filter2d_sep(x * y, win)
    return mu_x, mu_y, exx, eyy, exy


def _ssim_from_fields(fields, C1, C2):
    mu_x, mu_y, exx, eyy, exy = fields
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sx, sy, sxy = exx - mu_x2, eyy - mu_y2, exy - mu_xy
    num = (2 * mu_xy + C1) * (2 * sxy + C2)
    den = (mu_x2 + mu_y2 + C1) * (sx + sy + C2)
    return jnp.mean(num / den)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def ssim(x, y, win_size: int = 11, sigma: float = 1.5, max_val: float = 1.0):
    """SSIM on (H, W, C) images (mean over valid region), conv formulation
    matching the reference's window-11 SSIM (metric_utils.py:28-65).

    Custom VJP: reverse-mode through the shifted-add filter chain makes XLA
    materialize every intermediate moment map plus 4x22 reverse slice-adds;
    the closed-form backward below (the fused-ssim recipe: elementwise tail
    partials -> ONE stacked transposed window filter -> combine) is a plain
    forward expression XLA fuses, measured ~3x faster per train step on
    v5e at 1558x1038."""
    win = _gaussian_window(win_size, sigma)
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    return _ssim_from_fields(_ssim_fields(x, y, win), C1, C2)


def _ssim_fwd(x, y, win_size, sigma, max_val):
    win = _gaussian_window(win_size, sigma)
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    return _ssim_from_fields(_ssim_fields(x, y, win), C1, C2), (x, y)


def _ssim_bwd(win_size, sigma, max_val, res, g):
    """Closed-form SSIM gradient.

    With A = 2 mu_x mu_y + C1, B = 2 s_xy + C2, D = mu_x^2 + mu_y^2 + C1,
    E = s_x + s_y + C2 and S = A B / (D E) averaged over N valid pixels:
      dS/dExx = -S / E                     (through s_x only)
      dS/dExy =  2 A / (D E)              (through s_xy only)
      dS/dmu_x = 2 mu_y (B - A)/(D E) + 2 mu_x S (1/E - 1/D)
    and dL/dx = corr_full(w dS/dmu_x) + 2x corr_full(w dS/dExx)
              + y corr_full(w dS/dExy)  with w = g / N (the mean weight);
    the transposed VALID correlation is a zero-padded correlation with the
    (symmetric) window. All terms are forward expressions — one stacked
    filter pass instead of autodiff's per-slice transpose chain."""
    x, y = res
    win = _gaussian_window(win_size, sigma)
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    mu_x, mu_y, exx, eyy, exy = _ssim_fields(x, y, win)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sx, sy, sxy = exx - mu_x2, eyy - mu_y2, exy - mu_xy
    A = 2 * mu_xy + C1
    B = 2 * sxy + C2
    D = mu_x2 + mu_y2 + C1
    E = sx + sy + C2
    inv_DE = 1.0 / (D * E)
    S = A * B * inv_DE
    w = g / S.size  # mean -> uniform per-pixel cotangent

    d_exx = -S / E * w
    d_eyy = -S / E * w
    d_exy = 2 * A * inv_DE * w
    d_mu_x = (2 * mu_y * (B - A) * inv_DE + 2 * mu_x * S * (1 / E - 1 / D)) * w
    d_mu_y = (2 * mu_x * (B - A) * inv_DE + 2 * mu_y * S * (1 / E - 1 / D)) * w

    k = win_size - 1
    t = jnp.concatenate([d_mu_x, d_mu_y, d_exx, d_eyy, d_exy], axis=-1)
    t = jnp.pad(t, ((k, k), (k, k), (0, 0)))
    t = _filter2d_sep(t, win[::-1])  # full-corr; gaussian window is symmetric
    C = x.shape[-1]
    t_mu_x, t_mu_y, t_exx, t_eyy, t_exy = (
        t[..., i * C:(i + 1) * C] for i in range(5)
    )
    dx = t_mu_x + 2 * x * t_exx + y * t_exy
    dy = t_mu_y + 2 * y * t_eyy + x * t_exy
    return dx, dy


ssim.defvjp(_ssim_fwd, _ssim_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def ssim_masked(x, y, row_mask, n_global, win_size: int = 11,
                sigma: float = 1.5, max_val: float = 1.0):
    """This device's SHARE of a global SSIM mean (band-parallel SSIM).

    x/y are the band rows EXTENDED by the halo rows exchanged from the
    neighbor bands (win_size//2 rows per side), so every window that exists
    in the full image is computed by exactly one band. row_mask
    (H_valid, 1, 1) selects the windows this band owns (zeroing the rows a
    global image would not have), n_global is the full image's valid-window
    element count; psum of the returned shares over the band axis equals
    the single-image ssim() exactly."""
    win = _gaussian_window(win_size, sigma)
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    fields = _ssim_fields(x, y, win)
    mu_x, mu_y, exx, eyy, exy = fields
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sx, sy, sxy = exx - mu_x2, eyy - mu_y2, exy - mu_xy
    num = (2 * mu_xy + C1) * (2 * sxy + C2)
    den = (mu_x2 + mu_y2 + C1) * (sx + sy + C2)
    return jnp.sum(num / den * row_mask) / n_global


def _ssim_masked_fwd(x, y, row_mask, n_global, win_size, sigma, max_val):
    out = ssim_masked(x, y, row_mask, n_global, win_size, sigma, max_val)
    return out, (x, y, row_mask)


def _ssim_masked_bwd(n_global, win_size, sigma, max_val, res, g):
    """The ssim() closed-form backward with the per-row mask weight."""
    x, y, row_mask = res
    win = _gaussian_window(win_size, sigma)
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    mu_x, mu_y, exx, eyy, exy = _ssim_fields(x, y, win)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sx, sy, sxy = exx - mu_x2, eyy - mu_y2, exy - mu_xy
    A = 2 * mu_xy + C1
    B = 2 * sxy + C2
    D = mu_x2 + mu_y2 + C1
    E = sx + sy + C2
    inv_DE = 1.0 / (D * E)
    S = A * B * inv_DE
    w = g * row_mask / n_global

    d_exx = -S / E * w
    d_eyy = -S / E * w
    d_exy = 2 * A * inv_DE * w
    d_mu_x = (2 * mu_y * (B - A) * inv_DE + 2 * mu_x * S * (1 / E - 1 / D)) * w
    d_mu_y = (2 * mu_x * (B - A) * inv_DE + 2 * mu_y * S * (1 / E - 1 / D)) * w

    k = win_size - 1
    t = jnp.concatenate([d_mu_x, d_mu_y, d_exx, d_eyy, d_exy], axis=-1)
    t = jnp.pad(t, ((k, k), (k, k), (0, 0)))
    t = _filter2d_sep(t, win[::-1])
    C = x.shape[-1]
    t_mu_x, t_mu_y, t_exx, t_eyy, t_exy = (
        t[..., i * C:(i + 1) * C] for i in range(5)
    )
    dx = t_mu_x + 2 * x * t_exx + y * t_exy
    dy = t_mu_y + 2 * y * t_eyy + x * t_exy
    return dx, dy, None


ssim_masked.defvjp(_ssim_masked_fwd, _ssim_masked_bwd)


def msssim(x, y, win_size: int = 11, levels: int = 5):
    """Multi-scale SSIM with the standard level weights.

    Levels auto-clamp so the coarsest scale still fits the window
    (small images would otherwise produce empty VALID convolutions)."""
    import math

    max_levels = max(
        1, int(math.floor(math.log2(min(x.shape[0], x.shape[1]) / win_size))) + 1
    )
    levels = min(levels, max_levels)
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])[:levels]
    weights = weights / jnp.sum(weights)
    vals = []
    for lvl in range(levels):
        win = _gaussian_window(win_size, 1.5)
        C2 = 0.03 ** 2
        mu_x = _filter2d_sep(x, win)
        mu_y = _filter2d_sep(y, win)
        sx = _filter2d_sep(x * x, win) - mu_x * mu_x
        sy = _filter2d_sep(y * y, win) - mu_y * mu_y
        sxy = _filter2d_sep(x * y, win) - mu_x * mu_y
        cs = jnp.mean((2 * sxy + C2) / (sx + sy + C2))
        if lvl == levels - 1:
            C1 = 0.01 ** 2
            lum = jnp.mean(
                (2 * mu_x * mu_y + C1) / (mu_x * mu_x + mu_y * mu_y + C1)
            )
            vals.append(jnp.clip(lum * cs, 1e-6, None))
        else:
            vals.append(jnp.clip(cs, 1e-6, None))
            # downsample 2x (average pool)
            H, W = x.shape[0] // 2 * 2, x.shape[1] // 2 * 2
            x = x[:H, :W].reshape(H // 2, 2, W // 2, 2, -1).mean((1, 3))
            y = y[:H, :W].reshape(H // 2, 2, W // 2, 2, -1).mean((1, 3))
    return jnp.prod(jnp.stack(vals) ** weights)


@functools.lru_cache(maxsize=1)
def _lpips_net():
    """Lazy LPIPS: uses torchvision VGG16 weights if present on disk.

    The reference evaluates LPIPS(VGG) (metric_utils.py:93). In this
    zero-egress environment pretrained VGG weights may be unavailable; in
    that case lpips() returns None and the evaluator reports NaN for the
    lpips column (documented in metrics.json).
    """
    try:
        import torch
        import torchvision

        net = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
        return net
    except Exception:
        return None


def lpips(x, y):
    """LPIPS(VGG) on (H, W, 3) in [0,1]; returns None if weights missing.

    Runs on host CPU via torch (eval-only metric, matching the reference's
    use of lpips for evaluation and the late-stage perceptual loss).
    """
    net = _lpips_net()
    if net is None:
        return None
    import numpy as np
    import torch

    def prep(a):
        a = np.asarray(a, np.float32).transpose(2, 0, 1)[None]
        t = torch.from_numpy(a) * 2 - 1
        mean = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        std = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        return (t - mean) / std

    # VGG16 feature taps used by LPIPS; lin0..lin4 calibration weights are
    # picked up from the lpips_jax npz when exported (metric_utils.py:93
    # uses compute_lpips(net='vgg'), which applies them per tap) — without
    # them this is uncalibrated VGG perceptual distance
    from envgs_tpu.ops.lpips_jax import load_weights

    lw = load_weights()
    lins = lw[1] if isinstance(lw, tuple) else None
    taps = {3, 8, 15, 22, 29}
    with torch.no_grad():
        fx, fy = prep(x), prep(y)
        dist = 0.0
        ti = 0
        for i, layer in enumerate(net):
            fx, fy = layer(fx), layer(fy)
            if i in taps:
                nx = fx / (fx.norm(dim=1, keepdim=True) + 1e-10)
                ny = fy / (fy.norm(dim=1, keepdim=True) + 1e-10)
                d2 = (nx - ny) ** 2
                if lins is not None:
                    wch = torch.from_numpy(
                        np.asarray(lins[ti])).view(1, -1, 1, 1)
                    dist = dist + (d2 * wch).sum(dim=1).mean()
                else:
                    dist = dist + d2.mean()
                ti += 1
    return float(dist)
