"""AnyRes merge path tests vs independent numpy/torch evaluation of the
reference semantics (llava_arch.py:101-129 unpad_image, :154-208 merge)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastvlm_tpu.ops.anyres import (
    merge_flat, merge_spatial, num_merged_tokens, unpad_hw)


def _torch_unpad(tensor_chw, original_size):
    """Literal re-evaluation of reference unpad_image semantics in numpy."""
    ow, oh = original_size
    c, ch, cw = tensor_chw.shape
    original_ar = ow / oh
    current_ar = cw / ch
    if original_ar > current_ar:
        scale = cw / ow
        new_h = int(oh * scale)
        pad = (ch - new_h) // 2
        return tensor_chw[:, pad:ch - pad, :]
    scale = ch / oh
    new_w = int(ow * scale)
    pad = (cw - new_w) // 2
    return tensor_chw[:, :, pad:cw - pad]


@pytest.mark.parametrize("orig", [(1000, 400), (400, 1000), (640, 640),
                                  (1333, 777)])
def test_unpad_matches_reference(orig):
    rng = np.random.RandomState(0)
    h, w = 32, 48
    x = rng.randn(8, h, w).astype(np.float32)  # (C, H, W)
    want = _torch_unpad(x, orig)
    top, bottom, left, right = unpad_hw((h, w), orig)
    got = x[:, top:bottom, left:right]
    np.testing.assert_array_equal(got, want)


def test_merge_flat_order():
    t, h, w, c = 3, 2, 2, 4
    x = np.arange(t * h * w * c, dtype=np.float32).reshape(t, h, w, c)
    out = np.asarray(merge_flat(jnp.asarray(x)))
    np.testing.assert_array_equal(out, x.reshape(t * h * w, c))


def test_merge_spatial_grid_assembly():
    """Tiles must reassemble in the reference's (gh, gw, h, w) order:
    view(gh, gw, h, w, C) -> permute to (gh*h, gw*w)."""
    gw, gh, h, w, c = 2, 3, 4, 4, 5
    rng = np.random.RandomState(1)
    base = rng.randn(1, h, w, c).astype(np.float32)
    tiles = rng.randn(gh * gw, h, w, c).astype(np.float32)
    feats = np.concatenate([base, tiles])
    out = np.asarray(merge_spatial(jnp.asarray(feats), (gw, gh)))

    # independent assembly
    grid = tiles.reshape(gh, gw, h, w, c).transpose(0, 2, 1, 3, 4)
    grid = grid.reshape(gh * h, gw * w, c)
    want = np.concatenate([base.reshape(h * w, c), grid.reshape(-1, c)])
    np.testing.assert_array_equal(out, want)


def test_merge_spatial_unpad_with_newline():
    gw, gh, h, w, c = 2, 2, 4, 4, 3
    rng = np.random.RandomState(2)
    feats = rng.randn(1 + gh * gw, h, w, c).astype(np.float32)
    newline = rng.randn(c).astype(np.float32)
    orig = (1600, 400)  # much wider than the 8x8 grid -> rows cropped
    out = np.asarray(merge_spatial(
        jnp.asarray(feats), (gw, gh), jnp.asarray(newline), orig, unpad=True))
    n_expected = num_merged_tokens((gw, gh), h, "spatial_unpad", orig)
    assert out.shape == (n_expected, c)
    # newline embedding appears at the end of each grid row
    top, bottom, left, right = unpad_hw((gh * h, gw * w), orig)
    rows = bottom - top
    cols = right - left
    grid_part = out[h * w:].reshape(rows, cols + 1, c)
    np.testing.assert_array_equal(
        grid_part[:, -1], np.tile(newline, (rows, 1)))


def test_engine_anyres_generate():
    """End-to-end anyres generation through the Engine (tiny random model)."""
    import dataclasses

    import jax
    from PIL import Image

    from fastvlm_tpu.engine import build_engine
    from fastvlm_tpu.models import vlm as vlm_mod

    engine = build_engine(random_tiny=True)
    # switch config to anyres with a 2x1 grid of 256px tiles, unpad merge
    cfg = dataclasses.replace(
        engine.cfg,
        image_aspect_ratio="anyres",
        image_grid_pinpoints=((512, 256), (256, 512), (512, 512)),
        mm_patch_merge_type="spatial_unpad",
    )
    engine.cfg = cfg
    params = dict(engine.params)
    d = cfg.decoder.hidden_size
    params["image_newline"] = jax.random.normal(jax.random.PRNGKey(9), (d,))
    engine.params = params

    image = Image.new("RGB", (900, 400), (200, 40, 10))
    text, stats = engine.chat("Describe.", image, max_new_tokens=4)
    assert stats["decode_tokens"] >= 0
    assert stats["prompt_tokens"] > cfg.num_image_tokens  # more than 1 tile


def test_anyres_one_tower_compile_across_image_sizes():
    """Arbitrary upload sizes must NOT retrigger the expensive tower compile:
    the tower jit is keyed by tile count only, the cheap merge by crop box
    (VERDICT r1 #4: previously every distinct (W, H) recompiled everything)."""
    import dataclasses

    import jax
    from PIL import Image

    from fastvlm_tpu.engine import build_engine

    engine = build_engine(random_tiny=True)
    cfg = dataclasses.replace(
        engine.cfg,
        image_aspect_ratio="anyres",
        image_grid_pinpoints=((512, 256), (256, 512), (512, 512)),
        mm_patch_merge_type="spatial_unpad",
    )
    engine.cfg = cfg
    params = dict(engine.params)
    d = cfg.decoder.hidden_size
    params["image_newline"] = jax.random.normal(jax.random.PRNGKey(9), (d,))
    engine.params = params

    # many distinct pixel sizes, all mapping to the same 2x1 anyres grid
    sizes = [(900, 400), (901, 400), (873, 399), (1024, 333), (640, 300)]
    for w, h in sizes:
        engine.prepare(engine.build_prompt("hi"), Image.new("RGB", (w, h)))

    _, _, counters = engine._tile_fns
    assert counters["tower"] == 1, counters
    # merges are keyed by crop box: far fewer than one per size, and cheap
    assert counters["merge"] <= len(sizes), counters

    # a different grid shape (portrait) costs exactly one more tower trace
    # only if the tile count differs; 1x2 has the same T=3 as 2x1 -> reuse
    engine.prepare(engine.build_prompt("hi"), Image.new("RGB", (400, 900)))
    assert counters["tower"] == 1, counters
