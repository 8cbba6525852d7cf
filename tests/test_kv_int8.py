"""int8 KV cache: quantized dense-cache decode must track the float cache
closely (per-token-head scales; docs/PERF.md round-3 — KV bandwidth bounds
long-context decode, int8 halves it at a measured 1.45x attention speedup).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fastvlm_tpu.config import (
    FastViTConfig,
    FastVLMConfig,
    ProjectorConfig,
    Qwen2Config,
)
from fastvlm_tpu.models import qwen2, vlm
from fastvlm_tpu.ops.kv_cache import init_cache, quantize_tokens

TINY = Qwen2Config(
    vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=8, intermediate_size=64,
    tie_word_embeddings=True)


def test_quantize_tokens_roundtrip_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 2, 8)) * 4.0
    q, s = quantize_tokens(x)
    back = q.astype(jnp.float32) * s[..., None]
    # per-token-head symmetric int8: error <= scale/2 = max|x|/254 per token
    err = jnp.abs(back - x)
    bound = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 254.0 + 1e-7
    assert bool(jnp.all(err <= bound))


def _vlm_cfg(kv_dtype=None):
    # embed_dims must keep each stage's width divisible by the previous
    # (depthwise downsampler groups) — same shape as build_engine's tiny
    vis = FastViTConfig(layers=(1, 1, 1, 1, 1),
                        embed_dims=(8, 16, 32, 64, 128),
                        image_size=128, attn_head_dim=16)
    dec = dataclasses.replace(TINY, kv_cache_dtype=kv_dtype)
    return FastVLMConfig(
        vision=vis,
        projector=ProjectorConfig(mm_hidden_size=vis.out_channels,
                                  hidden_size=32),
        decoder=dec)


def test_int8_kv_decode_tracks_float_cache():
    """Prefill logits are EXACT (fresh-token attention bypasses the cache);
    decode logits stay within quantization tolerance and (on this seed)
    greedy tokens agree."""
    from fastvlm_tpu.ops.sampling import SamplingParams

    b, t, steps = 2, 16, 8
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, 100)
    starts = jnp.asarray([-1, -1], jnp.int32)

    outs = {}
    for name, kv in (("f32", None), ("int8", "int8")):
        cfg = _vlm_cfg(kv)
        params = vlm.init(jax.random.PRNGKey(0), cfg)
        seq_lens = jnp.asarray([t, t - 5], jnp.int32)
        dtype = jnp.int8 if kv else jnp.float32
        cache = init_cache(TINY.num_layers, b, t + steps, TINY.num_kv_heads,
                           TINY.head_dim, dtype)
        if kv:
            assert cache.k.dtype == jnp.int8 and cache.k_scale is not None
        logits, cache = vlm.prefill(params, cfg, None, ids, seq_lens, starts,
                                    cache)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        done = jnp.zeros((b,), bool)
        out, done, tok, cache, _ = vlm.decode_chunk(
            params, cfg, tok, done, cache, jax.random.PRNGKey(7), k=steps,
            eos_ids=(127,), sampling=SamplingParams(temperature=0.0))
        outs[name] = (np.asarray(logits), np.asarray(tok), np.asarray(out))

    # prefill (first-token) logits identical: the cache was not read yet
    np.testing.assert_allclose(outs["int8"][0], outs["f32"][0], atol=1e-5)
    # greedy decode agrees token-for-token on this seed
    np.testing.assert_array_equal(outs["int8"][2], outs["f32"][2])


def test_int8_kv_engine_and_beam_run():
    """Engine streaming + beam search must run end-to-end on an int8 cache
    (covers prefill_continue, decode chunks, and beam cache reordering)."""
    from fastvlm_tpu.data.preprocessing import ByteTokenizer
    from fastvlm_tpu.engine import Engine

    cfg = _vlm_cfg("int8")
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    eng = Engine(cfg, params, tok, eos_ids=(tok.eos_token_id,), chunk=4)
    assert eng._kv_dtype == jnp.int8
    img = np.random.RandomState(0).randint(0, 256, (128, 128, 3), np.uint8)
    text, stats = eng.chat("describe", image=img, max_new_tokens=8)
    assert isinstance(text, str) and stats["ttft_ms"] > 0

    # same model with a float cache: same greedy text (tiny, short horizon)
    cfg_f = _vlm_cfg(None)
    eng_f = Engine(cfg_f, params, tok, eos_ids=(tok.eos_token_id,), chunk=4)
    text_f, _ = eng_f.chat("describe", image=img, max_new_tokens=8)
    assert text == text_f, (text, text_f)

    bt, _ = eng.generate_beam(eng.build_prompt("describe"), img,
                              num_beams=2, max_new_tokens=6)
    assert isinstance(bt, str)
