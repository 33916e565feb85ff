import os

import numpy as np
import pytest

from instant_ngp_tpu.data.exr import read_exr, write_exr
from instant_ngp_tpu.data.images import (
    image_mse, read_bin_image, read_image, write_bin_image, write_image)


def test_exr_roundtrip_float(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 4, (17, 23, 3)).astype(np.float32)
    path = str(tmp_path / "t.exr")
    write_exr(path, img, half=False)
    back, names = read_exr(path)
    assert names[:3] == ["R", "G", "B"]
    np.testing.assert_allclose(back, img, rtol=0, atol=0)


def test_exr_roundtrip_half_rgba(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (9, 5, 4)).astype(np.float32)
    path = str(tmp_path / "t.exr")
    write_exr(path, img, half=True)
    back, names = read_exr(path)
    assert names == ["R", "G", "B", "A"]
    np.testing.assert_allclose(back, img.astype(np.float16).astype(np.float32))


def test_read_albert_exr(reference_data):
    path = os.path.join(reference_data, "image", "albert.exr")
    img, names = read_exr(path)  # ZIP-compressed half RGBA
    assert img.shape == (1024, 1024, 4)
    assert names == ["R", "G", "B", "A"]
    assert np.isfinite(img).all()
    assert 0.0 <= img[..., :3].mean() <= 1.0
    assert img[..., 3].mean() > 0.9  # fully opaque portrait


def test_bin_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (7, 11, 3)).astype(np.float32)
    path = str(tmp_path / "t.bin")
    write_bin_image(path, img)
    back = read_bin_image(path)
    assert back.shape == (7, 11, 4)
    np.testing.assert_allclose(back[..., :3], img.astype(np.float16), atol=1e-3)
    np.testing.assert_allclose(back[..., 3], 1.0)


def test_ldr_roundtrip_srgb(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    path = str(tmp_path / "t.png")
    write_image(path, img)
    back = read_image(path)
    assert back.shape == (8, 8, 3)
    np.testing.assert_allclose(back, img, atol=1.5 / 255.0)


def test_image_mse_quantize():
    a = np.full((4, 4, 3), 0.5, np.float32)
    b = np.full((4, 4, 3), 0.5 + 1e-4, np.float32)
    assert image_mse(a, b) > 0
    assert image_mse(a, b, quantize=True) == 0.0
