"""Qwen2 decoder parity vs HF transformers (tiny random config) and KV-cache
decode consistency (SURVEY.md §4 item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fastvlm_tpu.config import Qwen2Config
from fastvlm_tpu.models import qwen2
from fastvlm_tpu.ops.kv_cache import init_cache


TINY = Qwen2Config(
    vocab_size=128,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    intermediate_size=64,
    tie_word_embeddings=True,
)


def _hf_model(cfg: Qwen2Config):
    from transformers import Qwen2Config as HFCfg
    from transformers.models.qwen2 import Qwen2ForCausalLM

    hf_cfg = HFCfg(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        intermediate_size=cfg.intermediate_size,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        tie_word_embeddings=cfg.tie_word_embeddings,
        attention_dropout=0.0,
        max_position_embeddings=cfg.max_position_embeddings,
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg)
    model.eval()
    return model


def _params_from_hf(model, cfg: Qwen2Config):
    """Convert a HF Qwen2 state dict into our param pytree."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    def lin(prefix, bias):
        p = {"w": jnp.asarray(sd[prefix + ".weight"].T)}
        if bias:
            p["b"] = jnp.asarray(sd[prefix + ".bias"])
        return p

    layers = []
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        layers.append({
            "ln1": jnp.asarray(sd[pre + "input_layernorm.weight"]),
            "q": lin(pre + "self_attn.q_proj", True),
            "k": lin(pre + "self_attn.k_proj", True),
            "v": lin(pre + "self_attn.v_proj", True),
            "o": lin(pre + "self_attn.o_proj", False),
            "ln2": jnp.asarray(sd[pre + "post_attention_layernorm.weight"]),
            "gate": lin(pre + "mlp.gate_proj", False),
            "up": lin(pre + "mlp.up_proj", False),
            "down": lin(pre + "mlp.down_proj", False),
        })
    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"]),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": jnp.asarray(sd["model.norm.weight"]),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"w": jnp.asarray(sd["lm_head.weight"].T)}
    return params


@pytest.fixture(scope="module")
def hf_and_params():
    model = _hf_model(TINY)
    params = _params_from_hf(model, TINY)
    return model, params


def test_logits_match_hf(hf_and_params):
    model, params = hf_and_params
    ids = np.array([[5, 17, 99, 3, 42, 7]], dtype=np.int32)
    with torch.no_grad():
        want = model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()

    embeds = qwen2.embed(params, jnp.asarray(ids))
    positions = jnp.arange(ids.shape[1])[None]
    hidden, _ = qwen2.forward(params, TINY, embeds, positions)
    got = np.asarray(qwen2.logits_from_hidden(params, hidden, TINY))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_untied_head():
    cfg = Qwen2Config(
        vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
        num_kv_heads=1, head_dim=8, intermediate_size=32,
        tie_word_embeddings=False,
    )
    model = _hf_model(cfg)
    params = _params_from_hf(model, cfg)
    ids = np.array([[1, 2, 3]], dtype=np.int32)
    with torch.no_grad():
        want = model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    embeds = qwen2.embed(params, jnp.asarray(ids))
    hidden, _ = qwen2.forward(params, cfg, embeds, jnp.arange(3)[None])
    got = np.asarray(qwen2.logits_from_hidden(params, hidden, cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cached_decode_matches_full_forward(hf_and_params):
    """Prefill+step-by-step decode must equal one full forward (last logits)."""
    _, params = hf_and_params
    cfg = TINY
    ids = np.array([[5, 17, 99, 3, 42, 7, 11, 2]], dtype=np.int32)
    n_prompt, n_total = 5, ids.shape[1]

    # Full forward over everything (no cache)
    embeds = qwen2.embed(params, jnp.asarray(ids))
    hidden_full, _ = qwen2.forward(params, cfg, embeds, jnp.arange(n_total)[None])
    want = np.asarray(qwen2.logits_from_hidden(params, hidden_full, cfg))

    # Prefill first n_prompt, then decode the rest one token at a time
    cache = init_cache(cfg.num_layers, 1, 16, cfg.num_kv_heads, cfg.head_dim,
                       dtype=jnp.float32)
    pe = qwen2.embed(params, jnp.asarray(ids[:, :n_prompt]))
    mask = qwen2.prefill_mask(jnp.array([n_prompt]), n_prompt, 16)
    hidden_p, cache = qwen2.forward(
        params, cfg, pe, jnp.arange(n_prompt)[None], cache=cache, mask=mask,
        prefill=True)
    got_p = np.asarray(qwen2.logits_from_hidden(params, hidden_p, cfg))
    np.testing.assert_allclose(got_p, want[:, :n_prompt], rtol=2e-4, atol=2e-4)

    for t in range(n_prompt, n_total):
        tok = qwen2.embed(params, jnp.asarray(ids[:, t:t + 1]))
        mask = qwen2.decode_mask(cache.lengths, 16)[:, :, :]
        pos = cache.lengths[:, None]
        hidden_d, cache = qwen2.forward(
            params, cfg, tok, pos, cache=cache,
            mask=mask, prefill=False)
        got_d = np.asarray(qwen2.logits_from_hidden(params, hidden_d, cfg))
        np.testing.assert_allclose(
            got_d[:, 0], want[:, t], rtol=5e-4, atol=5e-4,
            err_msg=f"decode step {t}")
