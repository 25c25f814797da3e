"""Native C++ loader: decode/resize/undistort parity vs PIL/numpy."""
import os

import numpy as np
import pytest

from envgs_tpu.data.native_loader import NativeLoader, available

pytestmark = pytest.mark.skipif(
    not available(), reason="native loader not built"
)


def _write_test_images(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    # smooth image so jpeg loss + resize interpolation stay comparable
    x = np.linspace(0, 4 * np.pi, 96)
    img = (np.stack([
        np.outer(np.sin(x), np.cos(x)),
        np.outer(np.cos(x / 2), np.sin(x / 3)),
        np.outer(np.sin(x / 4), np.ones_like(x)),
    ], -1) * 0.5 + 0.5)
    u8 = (img * 255).astype(np.uint8)
    jp = str(tmp_path / "a.jpg")
    pp = str(tmp_path / "a.png")
    Image.fromarray(u8).save(jp, quality=98)
    Image.fromarray(u8).save(pp)
    return jp, pp, img.astype(np.float32)


def test_decode_png_exact(tmp_path):
    _, pp, img = _write_test_images(tmp_path)
    out = NativeLoader(2).load(pp, 96, 96)
    np.testing.assert_allclose(out, img, atol=2 / 255.0)


def test_decode_jpeg_close(tmp_path):
    jp, _, img = _write_test_images(tmp_path)
    out = NativeLoader(2).load(jp, 96, 96)
    assert np.abs(out - img).mean() < 0.02


def test_resize(tmp_path):
    _, pp, img = _write_test_images(tmp_path)
    out = NativeLoader(2).load(pp, 48, 48)
    # compare against numpy area-ish downsample
    ref = img.reshape(48, 2, 48, 2, 3).mean((1, 3))
    assert np.abs(out - ref).mean() < 0.02


def test_async_pipeline(tmp_path):
    jp, pp, img = _write_test_images(tmp_path)
    pool = NativeLoader(4)
    tickets = [pool.submit(p, 96, 96) for p in [jp, pp] * 8]
    outs = [pool.fetch(t) for t in tickets]
    assert len(outs) == 16
    for o in outs:
        assert o.shape == (96, 96, 3)
        assert np.isfinite(o).all()


def test_missing_file_errors(tmp_path):
    pool = NativeLoader(1)
    with pytest.raises(IOError):
        pool.load(str(tmp_path / "nope.jpg"), 32, 32)
