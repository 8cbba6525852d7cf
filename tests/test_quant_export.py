"""Quantization numerics + export roundtrip tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from fastvlm_tpu.config import Qwen2Config
from fastvlm_tpu.models import qwen2
from fastvlm_tpu.ops import quant


def test_int8_quant_error_small():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32)
    q = quant.quantize_linear({"w": jnp.asarray(w)}, bits=8)
    deq = np.asarray(quant.dequantize(q, 64))
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01


def test_int4_pack_unpack_exact():
    rng = np.random.RandomState(1)
    w = rng.randn(10, 6).astype(np.float32)  # odd cin exercises padding
    q = quant.quantize_linear({"w": jnp.asarray(w)}, bits=4)
    assert q["w_q"].shape == (5, 6)
    unpacked = np.asarray(quant.unpacked_weight(q, 10))
    # re-quantize manually to check the nibble packing is lossless
    scale = np.asarray(q["scale"])
    expect = np.clip(np.round(w / scale[None]), -8, 7)
    np.testing.assert_array_equal(unpacked, expect)


def test_quantized_matmul_matches_dequant():
    rng = np.random.RandomState(2)
    x = rng.randn(3, 16).astype(np.float32)
    w = rng.randn(16, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    for bits in (8, 4):
        q = quant.quantize_linear({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                                  bits=bits)
        got = np.asarray(quant.quantized_matmul(jnp.asarray(x), q))
        want = x @ np.asarray(quant.dequantize(q, 16)) + b
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_quantized_decoder_generates_close_logits():
    cfg = Qwen2Config(vocab_size=128, hidden_size=64, num_layers=2,
                      num_heads=4, num_kv_heads=2, head_dim=16,
                      intermediate_size=128, tie_word_embeddings=True)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    ids = np.array([[5, 9, 22, 77]], np.int32)
    e = qwen2.embed(params, jnp.asarray(ids))
    pos = jnp.arange(4)[None]
    h_ref, _ = qwen2.forward(params, cfg, e, pos)
    ref = np.asarray(qwen2.logits_from_hidden(params, h_ref, cfg))

    qparams = dict(params)
    qparams["layers"] = quant.quantize_decoder(params, bits=8)["layers"]
    h_q, _ = qwen2.forward(qparams, cfg, e, pos)
    got = np.asarray(qwen2.logits_from_hidden(qparams, h_q, cfg))
    # int8 weight-only on a tiny random model: small logit drift, same argmax
    np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.15)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_export_vision_encoder_roundtrip(tmp_path):
    from fastvlm_tpu import export as export_mod
    from fastvlm_tpu.config import FastViTConfig, FastVLMConfig, ProjectorConfig
    from fastvlm_tpu.models import fastvit

    vision = FastViTConfig(layers=(1, 1, 1, 1, 1),
                           embed_dims=(8, 16, 32, 64, 128),
                           image_size=128, attn_head_dim=16)
    cfg = FastVLMConfig(vision=vision)
    params = fastvit.init(jax.random.PRNGKey(0), vision)

    out = str(tmp_path / "export")
    path = export_mod.export_vision_encoder(cfg, params, out)
    assert os.path.exists(path)
    assert os.path.exists(os.path.join(out, "preprocessor_config.json"))
    assert os.path.exists(os.path.join(out, "processor_config.json"))

    fn = export_mod.load_exported_encoder(path)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3))
    got = np.asarray(fn(params, x))
    want = np.asarray(fastvit.apply(params, x, vision))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_w8a8_matmul_close_to_float():
    """W8A8 (dynamic per-token int8 activations, int8 MXU dot) must track
    the float matmul within quantization noise (docs/PERF.md: the 2x-rate
    integer path that breaks the b8 prefill roofline)."""
    rng = np.random.RandomState(3)
    x = rng.randn(5, 64).astype(np.float32)
    w = rng.randn(64, 32).astype(np.float32) * 0.1
    b = rng.randn(32).astype(np.float32) * 0.1
    q = quant.quantize_linear({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                              bits=8, act_quant=True)
    assert "a8" in q
    got = np.asarray(quant.quantized_matmul(jnp.asarray(x), q))
    want = x @ w + b
    denom = np.abs(want).mean()
    assert np.abs(got - want).mean() / denom < 0.02, (got, want)


def test_w8a8_decoder_same_argmax():
    cfg = Qwen2Config(vocab_size=128, hidden_size=64, num_layers=2,
                      num_heads=4, num_kv_heads=2, head_dim=16,
                      intermediate_size=128, tie_word_embeddings=True)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    ids = np.array([[5, 9, 22, 77]], np.int32)
    e = qwen2.embed(params, jnp.asarray(ids))
    pos = jnp.arange(4)[None]
    h_ref, _ = qwen2.forward(params, cfg, e, pos)
    ref = np.asarray(qwen2.logits_from_hidden(params, h_ref, cfg))

    qparams = dict(params)
    qparams["layers"] = quant.quantize_decoder(
        params, bits=8, act_quant=True)["layers"]
    h_q, _ = qwen2.forward(qparams, cfg, e, pos)
    got = np.asarray(qwen2.logits_from_hidden(qparams, h_q, cfg))
    np.testing.assert_allclose(got, ref, rtol=0.15, atol=0.2)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))
