"""On-device preprocessing vs the host PIL path and geometry contracts."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastvlm_tpu.ops import image_ops


def _smooth(h, w):
    x = np.linspace(0, 255, w)[None, :, None]
    y = np.linspace(0, 255, h)[:, None, None]
    return np.broadcast_to((x + y) / 2, (h, w, 3)).astype(np.uint8)


def test_pad_to_square_geometry():
    x = np.full((100, 200, 3), 200, np.uint8)
    out = np.asarray(image_ops.pad_to_square(jnp.asarray(x, jnp.float32)))
    assert out.shape == (200, 200, 3)
    assert out[0, 100, 0] == 0 and out[199, 100, 0] == 0  # pad rows
    assert out[100, 100, 0] == 200                        # original content


def test_center_crop_and_shortest_edge():
    x = jnp.asarray(_smooth(100, 160), jnp.float32)
    r = image_ops.resize_shortest_edge(x, 64)
    assert r.shape == (64, 102, 3)  # 160 * 64/100 = 102.4 -> 102
    c = image_ops.center_crop(r, 64)
    assert c.shape == (64, 64, 3)


def test_preprocess_matches_host_path_closely():
    """Device path (jax bicubic+antialias) vs host PIL path: close on smooth
    images; both produce [0,1] NHWC."""
    from PIL import Image

    from fastvlm_tpu.data.preprocessing import ImageProcessor, expand2square

    arr = _smooth(150, 250)
    dev = np.asarray(image_ops.preprocess(jnp.asarray(arr), 64, mode="pad"))[0]
    host = ImageProcessor(64).preprocess(
        expand2square(Image.fromarray(arr), (0, 0, 0)))
    assert dev.shape == host.shape == (64, 64, 3)
    assert 0.0 <= dev.min() and dev.max() <= 1.0
    # same geometry: the padded rows are black in both
    assert dev[0].max() < 0.02 and host[0].max() < 0.02
    # interior agrees to resampler-difference tolerance
    np.testing.assert_allclose(dev[16:48], host[16:48], atol=0.03)


def test_anyres_tiles_device():
    x = jnp.asarray(_smooth(300, 600))  # uint8: rescaled on device
    tiles = image_ops.anyres_tiles(x, 64, best_resolution=(128, 64))
    # global view + 2x1 grid
    assert tiles.shape == (3, 64, 64, 3)
    assert float(tiles.min()) >= 0.0 and float(tiles.max()) <= 1.0
    # prescaled float input gives the identical result (rescale is
    # dtype-dispatched: uint8 /255, float passes through)
    tiles_f = image_ops.anyres_tiles(
        jnp.asarray(x, jnp.float32) / 255.0, 64, best_resolution=(128, 64))
    np.testing.assert_allclose(np.asarray(tiles), np.asarray(tiles_f),
                               rtol=1e-5, atol=1e-6)


def test_prepare_array_image_float_255_matches_uint8():
    """np.asarray(pil_img, np.float32) gives [0,255] floats — the engine
    must detect and rescale them identically to the uint8 path (review
    finding: they previously clipped to an all-white image)."""
    import numpy as np

    from fastvlm_tpu.engine import build_engine

    engine = build_engine(random_tiny=True)
    s = engine.cfg.vision.image_size
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (s, s, 3), np.uint8)
    a = np.asarray(engine.prepare_array_image(u8))
    b = np.asarray(engine.prepare_array_image(u8.astype(np.float32)))
    np.testing.assert_allclose(a, b, atol=1e-2)
    # non-native size goes through resize/pad on device, same contract
    u8s = rng.randint(0, 256, (s // 2, s, 3), np.uint8)
    c = np.asarray(engine.prepare_array_image(u8s))
    d = np.asarray(engine.prepare_array_image(u8s.astype(np.float32)))
    np.testing.assert_allclose(c, d, atol=1e-2)
