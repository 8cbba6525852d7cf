"""VLM pipeline tests: splice overlay, sampling, fused generate (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvlm_tpu.config import FastViTConfig, FastVLMConfig, ProjectorConfig, Qwen2Config
from fastvlm_tpu.models import qwen2, vlm
from fastvlm_tpu.ops.sampling import SamplingParams, sample
from fastvlm_tpu.ops.splice import expand_image_ids, overlay_image_embeds, pad_batch


def tiny_vlm_cfg():
    vision = FastViTConfig(
        layers=(1, 1, 1, 1, 1), embed_dims=(8, 16, 32, 64, 128),
        image_size=128, attn_head_dim=16,
    )
    decoder = Qwen2Config(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=128,
    )
    proj = ProjectorConfig(mm_hidden_size=vision.out_channels,
                           hidden_size=decoder.hidden_size)
    return FastVLMConfig(vision=vision, projector=proj, decoder=decoder)


def test_expand_image_ids():
    ids, start = expand_image_ids([1, 2, -200, 3], num_image_tokens=4)
    np.testing.assert_array_equal(ids, [1, 2, 0, 0, 0, 0, 3])
    assert start == 2
    ids, start = expand_image_ids([1, 2, 3], num_image_tokens=4)
    assert start == -1 and list(ids) == [1, 2, 3]


def test_overlay_matches_manual_concat():
    rng = np.random.RandomState(0)
    d, n = 8, 3
    text = rng.randn(2, 10, d).astype(np.float32)
    vis = rng.randn(2, n, d).astype(np.float32)
    starts = np.array([2, 5], np.int32)
    got = np.asarray(overlay_image_embeds(
        jnp.asarray(text), jnp.asarray(vis), jnp.asarray(starts)))
    for b in range(2):
        s = starts[b]
        want = np.concatenate([text[b, :s], vis[b], text[b, s + n:]], axis=0)
        np.testing.assert_array_equal(got[b], want)
    # text-only row (-1) untouched
    got2 = np.asarray(overlay_image_embeds(
        jnp.asarray(text), jnp.asarray(vis), jnp.asarray(np.array([-1, 5]))))
    np.testing.assert_array_equal(got2[0], text[0])


def test_sampling_modes():
    logits = jnp.asarray(np.array([[0.0, 5.0, 1.0, -2.0]], np.float32))
    key = jax.random.PRNGKey(0)
    assert int(sample(key, logits, SamplingParams())[0]) == 1
    # top_k=1 and top_p→0 must both collapse to argmax even with temperature
    assert int(sample(key, logits, SamplingParams(temperature=1.0, top_k=1))[0]) == 1
    assert int(sample(key, logits, SamplingParams(temperature=1.0, top_p=1e-6))[0]) == 1
    # temperature sampling stays within support
    toks = [int(sample(jax.random.PRNGKey(i), logits,
                       SamplingParams(temperature=2.0))[0]) for i in range(20)]
    assert all(0 <= t < 4 for t in toks)


def test_sample_rows_all_greedy_matches_argmax():
    from fastvlm_tpu.ops.sampling import RowSampling, sample_rows

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    rs = RowSampling.build([SamplingParams()] * 4, 4)
    got = np.asarray(sample_rows(jax.random.PRNGKey(1), logits, rs))
    np.testing.assert_array_equal(got, np.asarray(jnp.argmax(logits, -1)))
    # None rows (free slots) are greedy too
    rs2 = RowSampling.build([None, SamplingParams(), None, None], 4)
    got2 = np.asarray(sample_rows(jax.random.PRNGKey(1), logits, rs2))
    np.testing.assert_array_equal(got2, got)


@pytest.mark.parametrize("sp", [
    SamplingParams(temperature=0.7),
    SamplingParams(temperature=1.3, top_k=5),
    SamplingParams(temperature=0.9, top_p=0.8),
    SamplingParams(temperature=1.0, top_k=8, top_p=0.6),
])
def test_sample_rows_uniform_config_matches_static(sp):
    """Rows all sharing one config must draw the SAME tokens as the static
    ``sample`` path with the same key — the per-row masks reduce to the
    static masks (ties are measure-zero with continuous random logits)."""
    from fastvlm_tpu.ops.sampling import RowSampling, sample_rows

    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32) * 3)
    rs = RowSampling.build([sp] * 4, 4)
    for seed in range(5):
        key = jax.random.PRNGKey(seed)
        want = np.asarray(sample(key, logits, sp))
        got = np.asarray(sample_rows(key, logits, rs))
        np.testing.assert_array_equal(got, want)


def test_sample_rows_mixed_batch_respects_each_row():
    """Greedy rows take argmax regardless of what their neighbours do;
    sampled rows stay inside their own top-k support."""
    from fastvlm_tpu.ops.sampling import RowSampling, sample_rows

    rng = np.random.default_rng(3)
    logits_np = rng.normal(size=(3, 64)).astype(np.float32) * 2
    logits = jnp.asarray(logits_np)
    rs = RowSampling.build([
        SamplingParams(),                            # greedy
        SamplingParams(temperature=1.5, top_k=3),    # sampled, top-3 only
        None,                                        # free slot => greedy
    ], 3)
    top3 = set(np.argsort(logits_np[1])[-3:].tolist())
    for seed in range(20):
        got = np.asarray(sample_rows(jax.random.PRNGKey(seed), logits, rs))
        assert got[0] == int(np.argmax(logits_np[0]))
        assert got[2] == int(np.argmax(logits_np[2]))
        assert int(got[1]) in top3


def test_generate_greedy_matches_stepwise():
    """Fused generate must reproduce manual prefill + decode_step loop."""
    cfg = tiny_vlm_cfg()
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3))

    raw_ids = [5, 7, -200, 9, 11]
    n_img = cfg.num_image_tokens
    row, start = expand_image_ids(raw_ids, n_img)
    ids, seq_lens, starts = pad_batch([row], [start], pad_to=16)

    max_new = 6
    res = vlm.generate(
        params, cfg, images, jnp.asarray(ids), jnp.asarray(seq_lens),
        jnp.asarray(starts), jax.random.PRNGKey(2),
        max_new_tokens=max_new, eos_ids=(255,),
    )
    got = np.asarray(res.tokens)[0]

    # manual loop
    from fastvlm_tpu.ops.kv_cache import init_cache
    cache = init_cache(cfg.decoder.num_layers, 1, 16 + max_new,
                       cfg.decoder.num_kv_heads, cfg.decoder.head_dim,
                       dtype=jnp.float32)
    logits, cache = vlm.prefill(
        params, cfg, images, jnp.asarray(ids), jnp.asarray(seq_lens),
        jnp.asarray(starts), cache)
    want = []
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    want.append(int(tok[0]))
    for _ in range(max_new - 1):
        logits, cache = vlm.decode_step(params, cfg, tok, cache)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        want.append(int(tok[0]))
        if int(tok[0]) == 255:
            break
    np.testing.assert_array_equal(got[: len(want)], want)


def test_generate_batch_ragged_lengths():
    """Rows with different prompt lengths decode independently and correctly."""
    cfg = tiny_vlm_cfg()
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3))
    n_img = cfg.num_image_tokens

    rowA, sA = expand_image_ids([5, -200, 9], n_img)
    rowB, sB = expand_image_ids([5, 7, 13, -200, 9, 11, 3], n_img)
    ids, lens, starts = pad_batch([rowA, rowB], [sA, sB], pad_to=16)

    res = vlm.generate(
        params, cfg, images, jnp.asarray(ids), jnp.asarray(lens),
        jnp.asarray(starts), jax.random.PRNGKey(2), max_new_tokens=4,
        eos_ids=(255,),
    )

    # row A alone must produce identical tokens as row A in the batch
    idsA, lensA, startsA = pad_batch([rowA], [sA], pad_to=16)
    resA = vlm.generate(
        params, cfg, images[:1], jnp.asarray(idsA), jnp.asarray(lensA),
        jnp.asarray(startsA), jax.random.PRNGKey(2), max_new_tokens=4,
        eos_ids=(255,),
    )
    np.testing.assert_array_equal(
        np.asarray(res.tokens)[0], np.asarray(resA.tokens)[0])
