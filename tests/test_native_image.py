"""Native C++ image loader tests (skipped when no toolchain/libjpeg)."""

import io
import os

import numpy as np
import pytest

from fastvlm_tpu.utils import native_image as ni

pytestmark = pytest.mark.skipif(not ni.available(),
                                reason="native image loader not built")


def _smooth_image(w=300, h=200):
    """Smooth gradient (no bicubic overshoot -> tight PIL comparison)."""
    x = np.linspace(0, 1, w)[None, :, None]
    y = np.linspace(0, 1, h)[:, None, None]
    c = np.concatenate([x + 0 * y, y + 0 * x, 0.5 * (x + y)], axis=-1)
    return (c * 255).astype(np.uint8)


def test_matches_pil_on_smooth_images():
    from PIL import Image

    from fastvlm_tpu.data.preprocessing import ImageProcessor, expand2square

    arr = _smooth_image()
    ref = ImageProcessor(64).preprocess(
        expand2square(Image.fromarray(arr), (0, 0, 0)))
    got = ni.preprocess_rgb(arr, 64, ni.MODE_PAD_SQUARE)
    assert got.shape == (64, 64, 3)
    np.testing.assert_allclose(got, ref, atol=6e-3)  # PIL rounds per-pass


def test_pad_geometry_exact():
    # solid red 2:1 image -> black bands top/bottom, red center
    arr = np.zeros((100, 200, 3), np.uint8)
    arr[:, :, 0] = 250
    out = ni.preprocess_rgb(arr, 64, ni.MODE_PAD_SQUARE)
    assert out[0, 32, 0] < 0.02 and out[63, 32, 0] < 0.02  # padded rows
    np.testing.assert_allclose(out[32, 32], [250 / 255, 0, 0], atol=0.02)


def test_jpeg_roundtrip_and_batch(tmp_path):
    from PIL import Image

    arr = _smooth_image()
    paths = []
    for i in range(4):
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    paths.append(str(tmp_path / "missing.jpg"))

    data = open(paths[0], "rb").read()
    one = ni.preprocess_jpeg_bytes(data, 48)
    assert one.shape == (48, 48, 3)
    assert 0.0 <= one.min() and one.max() <= 1.0

    batch, ok = ni.preprocess_files(paths, 48, num_threads=2)
    assert batch.shape == (5, 48, 48, 3)
    assert list(ok) == [True] * 4 + [False]
    np.testing.assert_allclose(batch[0], one, atol=1e-6)
