"""Native (C++) PNG batch loader vs the PIL path."""

import os
import time

import numpy as np
import pytest

from tpugan.io import native
from tpugan.io.image import load_image, load_image_dir, save_image


@pytest.fixture
def png_dir(tmp_path, rng):
    d = tmp_path / "pngs"
    os.makedirs(d)
    for i in range(8):
        save_image(str(d / f"{i:02d}.png"), rng.rand(32, 24, 3).astype(np.float32))
    return str(d)


def test_native_available():
    assert native.available(), "native loader should build in this environment"


def test_native_matches_pil_no_resize(png_dir):
    files = sorted(os.path.join(png_dir, f) for f in os.listdir(png_dir))
    # same-size decode: identical pixels up to u8 quantization
    got = native.load_png_batch(files, 32)[:, :, :24, :]  # native resizes to square
    # compare against PIL at native resolution via a square source instead
    # (use exact square images for the strict test below)


def test_native_exact_on_square(tmp_path, rng):
    d = tmp_path / "sq"
    os.makedirs(d)
    imgs = [rng.rand(16, 16, 3).astype(np.float32) for _ in range(4)]
    for i, im in enumerate(imgs):
        save_image(str(d / f"{i}.png"), im)
    files = sorted(os.path.join(d, f) for f in os.listdir(d))
    got = native.load_png_batch(files, 16)
    ref = load_image_dir(str(d))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_load_image_dir_fast_fallback(tmp_path, rng):
    d = tmp_path / "mixed"
    os.makedirs(d)
    save_image(str(d / "a.png"), rng.rand(8, 8, 3).astype(np.float32))
    save_image(str(d / "b.jpg"), rng.rand(8, 8, 3).astype(np.float32))
    out = native.load_image_dir_fast(str(d), 8)  # jpg present -> PIL path
    assert out.shape == (2, 8, 8, 3)


def test_native_resize_shape(png_dir):
    out = native.load_image_dir_fast(png_dir, 16)
    assert out.shape == (8, 16, 16, 3)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_native_error_on_missing():
    try:
        native.load_png_batch(["/nonexistent/x.png"], 8)
        assert False
    except IOError:
        pass
