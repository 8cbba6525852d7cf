"""Multi-image splice, remat training, special-token growth."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvlm_tpu.config import Qwen2Config
from fastvlm_tpu.ops.splice import (
    expand_image_ids_multi, overlay_image_embeds_multi, pad_batch)


def test_expand_multi():
    row, starts = expand_image_ids_multi([1, -200, 2, -200, 3], 4)
    np.testing.assert_array_equal(
        row, [1, 0, 0, 0, 0, 2, 0, 0, 0, 0, 3])
    assert starts == [1, 6]


def test_overlay_multi_matches_manual():
    rng = np.random.RandomState(0)
    d, n, m = 4, 2, 2
    text = rng.randn(1, 10, d).astype(np.float32)
    vis = rng.randn(1, m, n, d).astype(np.float32)
    starts = np.array([[1, 6]], np.int32)
    got = np.asarray(overlay_image_embeds_multi(
        jnp.asarray(text), jnp.asarray(vis), jnp.asarray(starts)))
    want = text.copy()
    want[0, 1:3] = vis[0, 0]
    want[0, 6:8] = vis[0, 1]
    np.testing.assert_array_equal(got, want)
    # absent slot (-1) leaves text untouched
    starts2 = np.array([[1, -1]], np.int32)
    got2 = np.asarray(overlay_image_embeds_multi(
        jnp.asarray(text), jnp.asarray(vis), jnp.asarray(starts2)))
    want2 = text.copy()
    want2[0, 1:3] = vis[0, 0]
    np.testing.assert_array_equal(got2, want2)


def test_vlm_multi_image_generate():
    from tests.test_vlm import tiny_vlm_cfg
    from fastvlm_tpu.models import vlm

    cfg = tiny_vlm_cfg()
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    n = cfg.num_image_tokens
    row, starts = expand_image_ids_multi([5, -200, 7, -200, 9], n)
    ids, lens, _ = pad_batch([row], [0], 16)
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 128, 128, 3))
    res = vlm.generate(
        params, cfg, images, jnp.asarray(ids), jnp.asarray(lens),
        jnp.asarray(np.asarray([starts], np.int32)), jax.random.PRNGKey(2),
        max_new_tokens=3, eos_ids=(255,))
    assert np.asarray(res.tokens).shape == (1, 3)


def test_remat_loss_matches_no_remat():
    from tests.test_parallel_train import tiny_cfg, _batch
    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.train import step as ts

    cfg = tiny_cfg(vocab=64)
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    ids, lens, starts = _batch(cfg, 1)
    ids = ids % 64
    labels = np.where(np.arange(ids.shape[1])[None] < lens[:, None], ids, -100)
    batch = {
        "images": jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3)),
        "ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
        "image_starts": jnp.asarray(starts), "attn_lens": jnp.asarray(lens),
    }
    # ONE jitted value_and_grad per remat mode (loss + grads from the same
    # compile; the separate eager loss evals were pure overhead)
    l1, g1 = jax.jit(jax.value_and_grad(
        lambda p: ts.loss_fn(p, cfg, batch, remat=False)))(params)
    l2, g2 = jax.jit(jax.value_and_grad(
        lambda p: ts.loss_fn(p, cfg, batch, remat=True)))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g1, g2)


def test_add_special_tokens_grows_embeddings():
    from fastvlm_tpu.models import qwen2
    from fastvlm_tpu.utils.tokens import add_special_tokens

    cfg = Qwen2Config(vocab_size=64, hidden_size=16, num_layers=1,
                      num_heads=2, num_kv_heads=1, head_dim=8,
                      intermediate_size=32, tie_word_embeddings=False)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)

    class Tok:
        def add_tokens(self, toks, special_tokens=True):
            return len(toks)

    new_params, new_cfg, added = add_special_tokens(
        Tok(), params, cfg, use_im_patch=True, use_im_start_end=True)
    assert added == 3
    assert new_cfg.vocab_size == 67
    assert new_params["embed"].shape == (67, 16)
    assert new_params["lm_head"]["w"].shape == (16, 67)
    mean = np.asarray(params["embed"]).mean(0)
    np.testing.assert_allclose(np.asarray(new_params["embed"][64]), mean,
                               rtol=1e-5, atol=1e-6)


def test_engine_multi_image_prompt():
    from PIL import Image

    from fastvlm_tpu.engine import build_engine

    engine = build_engine(random_tiny=True)
    prompt = engine.build_prompt("Compare <image> with the first one.")
    # build_prompt prepends one <image>; the user text adds a second
    assert prompt.count("<image>") == 2
    imgs = [Image.new("RGB", (64, 64), (250, 0, 0)),
            Image.new("RGB", (64, 64), (0, 0, 250))]
    text, stats = engine.generate(prompt, imgs, max_new_tokens=3)
    assert stats["decode_tokens"] >= 0
    # prompt must contain two full image spans
    assert stats["prompt_tokens"] > 2 * engine.cfg.num_image_tokens

    # image-count mismatch is a clear error
    import pytest

    with pytest.raises(ValueError):
        engine.generate(prompt, [imgs[0]] * 3, max_new_tokens=2)
