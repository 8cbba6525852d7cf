"""Qwen2 decoder family — TPU-native JAX implementation.

Matches HF ``Qwen2ForCausalLM`` numerics (the reference defers to HF for its
decoder: llava/model/language_model/llava_qwen.py:30-160): RMSNorm(eps 1e-6),
GPT-NeoX-style RoPE (theta 1e6), GQA with QKV bias / bias-free o_proj, SwiGLU
MLP, optional tied embeddings (0.5B/1.5B).

TPU-first design:
  * per-layer params stacked on a leading axis and driven by ``lax.scan`` —
    one compiled layer body, O(1) compile time in depth;
  * static-shape compact KV cache (ops/kv_cache.py) — decode is a fixed-shape
    jitted step, no retrace, no realloc;
  * float32 softmax/accumulation, bf16 storage by policy;
  * forward takes *embeddings*, not token ids, so the VLM splice path
    (vision tokens interleaved with text) is the same code path as plain LM.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from fastvlm_tpu.config import Qwen2Config, resolve_dtype
from fastvlm_tpu.ops.conv import rms_norm
from fastvlm_tpu.ops.kv_cache import (
    KVCache,
    PagedKVCache,
    dequantize_view,
    gather_pages,
    write_prompt,
    write_prompt_paged,
    write_token,
    write_token_paged,
)

Params = Dict[str, Any]

NEG_INF = -1e30  # mask value; finite to keep softmax NaN-free on fully-masked rows


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _dense(key, cin, cout, dtype, bias, std=0.02):
    p = {"w": (jax.random.normal(key, (cin, cout)) * std).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _layer_init(key, cfg: Qwen2Config, dtype):
    ks = jax.random.split(key, 7)
    d = cfg.hidden_size
    p = {
        "ln1": jnp.ones((d,), dtype),
        "q": _dense(ks[0], d, cfg.q_dim, dtype, cfg.qkv_bias),
        "k": _dense(ks[1], d, cfg.kv_dim, dtype, cfg.qkv_bias),
        "v": _dense(ks[2], d, cfg.kv_dim, dtype, cfg.qkv_bias),
        "o": _dense(ks[3], cfg.q_dim, d, dtype, bias=False),
        "ln2": jnp.ones((d,), dtype),
        "up": _dense(ks[5], d, cfg.intermediate_size, dtype, bias=False),
        "down": _dense(ks[6], cfg.intermediate_size, d, dtype, bias=False),
    }
    if cfg.mlp_type == "swiglu":
        p["gate"] = _dense(ks[4], d, cfg.intermediate_size, dtype, bias=False)
    return p


def init(key, cfg: Qwen2Config) -> Params:
    dtype = resolve_dtype(cfg.param_dtype)
    k_emb, k_layers, k_head = jax.random.split(key, 3)
    layer_keys = jax.random.split(k_layers, cfg.num_layers)
    layers = [_layer_init(k, cfg, dtype) for k in layer_keys]
    params: Params = {
        "embed": (jax.random.normal(k_emb, (cfg.vocab_size, cfg.hidden_size)) * 0.02).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": jnp.ones((cfg.hidden_size,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _dense(k_head, cfg.hidden_size, cfg.vocab_size, dtype, bias=False)
    return params


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float):
    """positions: (...,) int -> cos/sin of shape (..., head_dim), f32.

    GPT-NeoX convention: frequencies for the first half, duplicated for the
    second half (matches HF Qwen2 rotary embedding).
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (..., half)
    angles = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x: (B, T, H, D); cos/sin: (B, T, D) -> rotated x (same dtype)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    xf = x.astype(jnp.float32)
    rf = rotated.astype(jnp.float32)
    out = xf * cos[:, :, None, :] + rf * sin[:, :, None, :]
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# attention / layer body
# ---------------------------------------------------------------------------


def _norm(x, w, cfg: Qwen2Config):
    """Pre-norm dispatch: RMSNorm (Qwen/Llama/Mistral) or bias-free
    LayerNorm (MPT, HF MptForCausalLM uses nn.LayerNorm with bias=None)."""
    if cfg.norm_type == "layernorm":
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + cfg.rms_eps)).astype(x.dtype) \
            * w.astype(x.dtype)
    return rms_norm(x, w, cfg.rms_eps)


def _mlp(h, lp, cfg: Qwen2Config):
    """SwiGLU (gate*up) or plain up->GELU->down (MPT)."""
    if "gateup" in lp:
        gu = _project(h, lp["gateup"])
        gate, up = jnp.split(gu, 2, axis=-1)
        gated = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype) * up
    elif "gate" in lp:
        gated = jax.nn.silu(
            _project(h, lp["gate"]).astype(jnp.float32)
        ).astype(h.dtype) * _project(h, lp["up"])
    else:  # MPT GELU MLP (exact erf, matching HF's default approximate='none')
        gated = jax.nn.gelu(
            _project(h, lp["up"]).astype(jnp.float32), approximate=False
        ).astype(h.dtype)
    return _project(gated, lp["down"])


def _lora_delta(x, p):
    """scale * (x @ A) @ B in f32 (train/lora.py adapter leaves)."""
    low = jnp.einsum("btd,dr->btr", x, p["lora_a"].astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    delta = jnp.einsum("btr,ro->bto", low, p["lora_b"].astype(x.dtype),
                       preferred_element_type=jnp.float32)
    return p["lora_scale"].astype(jnp.float32) * delta


def _project(x, p):
    if "w_q" in p:  # weight-only quantized linear (ops/quant.py)
        from fastvlm_tpu.ops.quant import quantized_matmul

        out = quantized_matmul(x, p)  # handles scale + bias
        if "lora_a" in p:  # QLoRA: adapters ride on the frozen int base
            # (reference train_qwen.py:1050-1067 bnb base + :1113-1129 peft)
            out = (out.astype(jnp.float32) + _lora_delta(x, p)).astype(x.dtype)
        return out
    out = jnp.einsum("btd,df->btf", x, p["w"].astype(x.dtype),
                     preferred_element_type=jnp.float32)
    if "lora_a" in p:  # low-rank adapter path (train/lora.py)
        out = out + _lora_delta(x, p)
    if "b" in p:
        out = out + p["b"].astype(jnp.float32)
    return out.astype(x.dtype)


def alibi_slopes(num_heads: int) -> jnp.ndarray:
    """Standard ALiBi head slopes (geometric sequence), for MPT-style decoders."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(num_heads).is_integer():
        return jnp.asarray(pow2_slopes(num_heads), jnp.float32)
    closest = 2 ** math.floor(math.log2(num_heads))
    extra = pow2_slopes(2 * closest)[0::2][: num_heads - closest]
    return jnp.asarray(pow2_slopes(closest) + extra, jnp.float32)


def pos_terms(cfg: Qwen2Config, positions, mask):
    """Shared positional preamble: (cos, sin, alibi_bias, (B,1,T,S) mask).

    One definition for the plain forward and the pipelined path
    (parallel/pipeline.py) so rope/ALiBi math can't drift between them."""
    cos = sin = None
    if cfg.pos_emb == "rope":
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    bias = None
    if cfg.pos_emb == "alibi":
        # additive -slope * (q_pos - k_pos) bias (MPT-style decoders)
        s = mask.shape[-1]
        k_pos = jnp.arange(s, dtype=jnp.int32)[None, None, :]
        dist = (positions[:, :, None] - k_pos).astype(jnp.float32)  # (B,T,S)
        slopes = alibi_slopes(cfg.num_heads)
        bias = -slopes[None, :, None, None] * dist[:, None]
    return cos, sin, bias, mask[:, None]


def _attend_quant(q, k8, ks, v8, vs, mask):
    """Decode attention over an int8 KV cache WITHOUT materializing a
    dequantized copy: per-token scales commute out of the dots —
    scores[:, s] = (q · k8[s]) * k_scale[s], and the value scale folds into
    the probabilities (p' = p * v_scale) before the PV dot. Only a pure
    int8->bf16 convert feeds each einsum operand.

    q: (B,T,Hq,D); k8/v8: (B,S,Hkv,D) int8; ks/vs: (B,S,Hkv) f32;
    mask: (B,1,T,S) bool."""
    b, t, hq, d = q.shape
    hkv = k8.shape[2]
    g = hq // hkv
    qq = q.reshape(b, t, hkv, g, d)
    scores = jnp.einsum("bthgd,bshd->bhgts", qq, k8.astype(q.dtype),
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    kss = jnp.transpose(ks, (0, 2, 1))[:, :, None, None, :]  # (B,Hkv,1,1,S)
    scores = scores * kss
    scores = jnp.where(mask[:, :, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    vss = jnp.transpose(vs, (0, 2, 1))[:, :, None, None, :]
    probs = (probs * vss).astype(q.dtype)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, v8.astype(q.dtype),
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(b, t, hq * d)


def _attend(q, k, v, mask, bias=None):
    """q: (B,T,Hq,D); k,v: (B,S,Hkv,D); mask: (B,1,T,S) bool;
    bias: optional (B,Hq,T,S) additive (ALiBi) -> (B,T,Hq,D)."""
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    q = q.reshape(b, t, hkv, group, d)
    scores = jnp.einsum("bthgd,bshd->bhgts", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    if bias is not None:
        scores = scores + bias.reshape(b, hkv, group, t, -1)
    scores = jnp.where(mask[:, :, None], scores, NEG_INF)  # mask (B,Hkv=1 bc,T,S)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.reshape(b, t, hq * d)


def _attend_pool(q, k_pool, v_pool, owner, base, lengths, window=None):
    """Decode attention IN PLACE over the shared page pool — no per-row
    gather, no dense view (the third paged-decode formulation after
    per-token gather and chunk-view; VERDICT r2 #1 "attend the pool in
    place with segment masking").

    Every row's query attends ALL pool tokens in one (B·Hq, D) x (D, P·page)
    matmul, with per-token validity ``owner[p] == b and
    base[p] + slot <= lengths[b]`` masking out other rows' pages. That
    computes B× the needed logit FLOPs, but decode attention is
    KV-bandwidth-bound (~1 FLOP/byte vs the MXU's hundreds), so the extra
    FLOPs ride the same pool read — and the pool is read ONCE per step
    total instead of once per row via gathered views. Traffic scales with
    POOL size (tokens actually in flight across the batch), not with
    B × s_bucket like the chunk-view.

    q: (B, 1, Hq, D); k/v_pool: (P, page, Hkv, D); owner/base: (P,) from
    ops/kv_cache.pool_ownership; lengths: (B,) pre-write lengths (the
    step's token at position lengths[b] was just written, mirroring
    decode_mask's ``k <= lengths`` contract)."""
    b, t, hq, d = q.shape
    p, page, hkv, _ = k_pool.shape
    g = hq // hkv
    kf = k_pool.reshape(p * page, hkv, d)
    vf = v_pool.reshape(p * page, hkv, d)
    qq = q.reshape(b, t, hkv, g, d)
    scores = jnp.einsum("bthgd,shd->bhgts", qq, kf.astype(q.dtype),
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    slot = jnp.arange(page, dtype=jnp.int32)
    pos = (base[:, None] + slot[None, :]).reshape(-1)       # (P*page,)
    own = jnp.repeat(owner, page)                           # (P*page,)
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    valid = (own[None, :] == rows) & (pos[None, :] <= lengths[:, None])
    if window is not None:
        valid = valid & (lengths[:, None] - pos[None, :] < window)
    scores = jnp.where(valid[:, None, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    # rows with zero valid tokens (finished, pages freed) would softmax all
    # -inf into NaN; their output is ignored but must not poison the row
    probs = jnp.where(valid.any(-1)[:, None, None, None, None],
                      probs, 0.0).astype(vf.dtype)
    out = jnp.einsum("bhgts,shd->bthgd", probs, vf,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(b, t, hq * d)


def fuse_decoder_params(params: Params, cfg: Qwen2Config) -> Params:
    """Concatenate q/k/v -> qkv and gate/up -> gateup weights.

    One matmul instead of three/two per layer — fewer tiny MXU launches at
    decode (T=1). Single-chip serving only: TP sharding wants the unfused
    layout (the concat axis would split unevenly across q/k/v)."""
    layers = dict(params["layers"])
    qkv = {"w": jnp.concatenate(
        [layers["q"]["w"], layers["k"]["w"], layers["v"]["w"]], axis=-1)}
    if "b" in layers["q"]:
        qkv["b"] = jnp.concatenate(
            [layers["q"]["b"], layers["k"]["b"], layers["v"]["b"]], axis=-1)
    layers["qkv"] = qkv
    if "gate" in layers:
        layers["gateup"] = {"w": jnp.concatenate(
            [layers["gate"]["w"], layers["up"]["w"]], axis=-1)}
        del layers["gate"], layers["up"]
    for k in ("q", "k", "v"):
        del layers[k]
    out = dict(params)
    out["layers"] = layers
    return out


def _decode_attention_pallas(q, keys, values, lengths):
    """Route one decode step through the blocked Pallas kernel.

    q: (B, 1, Hq, D); keys/values: (B, S_max, Hkv, D); valid key count per
    row is lengths[b] + 1 (the step's token was just written)."""
    from fastvlm_tpu.ops.pallas.decode_attention import decode_attention

    out = decode_attention(q[:, 0], keys.astype(q.dtype),
                           values.astype(q.dtype), lengths + 1,
                           interpret=jax.default_backend() == "cpu")
    b, hq, d = out.shape
    return out.reshape(b, 1, hq * d)


def _layer(x, lp, cfg: Qwen2Config, cos, sin, cache_k, cache_v, mask, lengths,
           prefill, bias=None, prefill_offset=0, block_tables=None,
           cache_ks=None, cache_vs=None, pool_owner=None, pool_base=None,
           pool_bucket=None):
    """One decoder layer.

    cache_k/v: (B, S_max, Hkv, D) dense cache rows, (P, page, Hkv, D) pool
    slices when ``block_tables`` is given (paged serving layout), or None
    (no cache — training self-attention). cache_ks/vs: per-token-head
    scales when the dense cache stores int8 (ops/kv_cache.py)."""
    b, t, d = x.shape
    h = _norm(x, lp["ln1"], cfg)
    if "qkv" in lp:
        qkv = _project(h, lp["qkv"])
        q, k, v = jnp.split(qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim], axis=-1)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    else:
        q = _project(h, lp["q"]).reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = _project(h, lp["k"]).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = _project(h, lp["v"]).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    if cfg.pos_emb == "rope":
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    attn = None  # set directly by the Pallas decode routes
    quant_kv = cache_k is not None and cache_k.dtype == jnp.int8
    use_pallas = (cfg.attn_backend == "pallas" and bias is None
                  and cfg.attn_window is None and not quant_kv
                  and t == 1)  # speculative verify decodes t=k+1 at once
    if cache_k is None:
        keys, values = k, v
        new_cache = None
    elif prefill:
        if block_tables is None:
            if quant_kv:
                cache_k, cache_v, cache_ks, cache_vs = write_prompt(
                    cache_k, cache_v, k, v, prefill_offset,
                    cache_ks, cache_vs)
            else:
                cache_k, cache_v = write_prompt(cache_k, cache_v, k, v,
                                                prefill_offset)
        else:
            cache_k, cache_v = write_prompt_paged(cache_k, cache_v, k, v,
                                                  block_tables, prefill_offset)
        if mask.shape[-1] == t:
            # Fresh-token prefill attention: a (B, T, T) mask means the
            # caller is prefilling an empty cache, so the just-computed
            # (B, T) keys ARE the full valid cache — attend them directly
            # instead of streaming the S_max-wide (mostly masked) cache.
            keys, values = k, v
        elif block_tables is None:
            keys = dequantize_view(cache_k, cache_ks, q.dtype)
            values = dequantize_view(cache_v, cache_vs, q.dtype)
        else:
            keys = gather_pages(cache_k, block_tables)
            values = gather_pages(cache_v, block_tables)
        new_cache = (cache_k, cache_v, cache_ks, cache_vs) if quant_kv \
            else (cache_k, cache_v)
    elif block_tables is None:  # dense decode step
        if quant_kv:
            cache_k, cache_v, cache_ks, cache_vs = write_token(
                cache_k, cache_v, k, v, lengths, cache_ks, cache_vs)
            new_cache = (cache_k, cache_v, cache_ks, cache_vs)
            if bias is None:
                # scale-on-scores formulation: no dequantized KV copy
                attn = _attend_quant(q, cache_k, cache_ks, cache_v,
                                     cache_vs, mask)
            else:
                keys = dequantize_view(cache_k, cache_ks, q.dtype)
                values = dequantize_view(cache_v, cache_vs, q.dtype)
        else:
            cache_k, cache_v = write_token(cache_k, cache_v, k, v, lengths)
            keys, values = cache_k, cache_v
            new_cache = (cache_k, cache_v)
            if use_pallas:
                attn = _decode_attention_pallas(q, keys, values, lengths)
    else:  # paged decode step
        cache_k, cache_v = write_token_paged(cache_k, cache_v, k, v,
                                             block_tables, lengths)
        new_cache = (cache_k, cache_v)
        if pool_owner is not None:
            # in-place pool attention: no gathered view at all. With a
            # watermark bucket, only pages [0, pool_bucket) are read — a
            # fused slice, valid because the batcher allocates lowest-first
            # and buckets above its highest mapped page.
            ck, cv = cache_k, cache_v
            if pool_bucket is not None:
                ck, cv = ck[:pool_bucket], cv[:pool_bucket]
            attn = _attend_pool(q, ck, cv, pool_owner, pool_base,
                                lengths, window=cfg.attn_window)
        elif use_pallas:
            from fastvlm_tpu.ops.pallas.decode_attention import (
                paged_decode_attention,
            )

            out = paged_decode_attention(
                q[:, 0], cache_k.astype(q.dtype), cache_v.astype(q.dtype),
                block_tables, lengths + 1,
                interpret=jax.default_backend() == "cpu")
            attn = out.reshape(b, 1, -1)
        else:
            keys = gather_pages(cache_k, block_tables)
            values = gather_pages(cache_v, block_tables)

    if attn is None:
        attn = _attend(q, keys.astype(q.dtype), values.astype(q.dtype), mask,
                       bias)
    x = x + _project(attn, lp["o"]).reshape(b, t, d)

    h = _norm(x, lp["ln2"], cfg)
    x = x + _mlp(h, lp, cfg)
    return x, new_cache


# ---------------------------------------------------------------------------
# public forward
# ---------------------------------------------------------------------------


def embed(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embed"], ids, axis=0)


def logits_from_hidden(params: Params, hidden: jnp.ndarray, cfg: Qwen2Config):
    if cfg.tie_word_embeddings:
        w = params["embed"].astype(hidden.dtype)
        return jnp.einsum("btd,vd->btv", hidden, w,
                          preferred_element_type=jnp.float32)
    if "w_q" in params["lm_head"]:
        from fastvlm_tpu.ops.quant import quantized_matmul

        return quantized_matmul(hidden, params["lm_head"]).astype(jnp.float32)
    return jnp.einsum("btd,dv->btv", hidden,
                      params["lm_head"]["w"].astype(hidden.dtype),
                      preferred_element_type=jnp.float32)


def forward(
    params: Params,
    cfg: Qwen2Config,
    inputs_embeds: jnp.ndarray,  # (B, T, D)
    positions: jnp.ndarray,      # (B, T) int32 RoPE positions
    cache: Optional[KVCache] = None,
    mask: Optional[jnp.ndarray] = None,  # (B, T, S) bool, True = attend
    prefill: bool = True,
    prefill_offset=0,  # cache write offset (prefix-reuse continuation)
    remat: bool = False,  # rematerialize layers under grad (training memory)
    seq_sharding=None,  # NamedSharding for (B, T, D) activations (training SP)
    pool_inplace: bool = False,  # paged decode: attend the pool in place
    pool_bucket: Optional[int] = None,  # static page watermark (in-place)
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the decoder stack over embeddings; returns (hidden, new_cache).

    With a cache: S = cache.max_len; prefill writes rows [0,T), decode writes
    at cache.lengths. Without a cache: plain causal self-attention over T
    (training path).

    ``seq_sharding`` (no-cache path only) pins hidden states to e.g.
    P(data, model, None) between layers — Megatron-style sequence
    parallelism: GSPMD turns the tensor-parallel all-reduces into
    reduce-scatter + all-gather pairs around the attention/MLP blocks, so
    the norm/residual regions hold only T/tp tokens per chip.
    """
    x = inputs_embeds
    b, t, _ = x.shape
    if mask is None:
        # plain causal (no cache / full self-attention)
        causal = jnp.tril(jnp.ones((t, t), bool))
        mask = jnp.broadcast_to(causal, (b, t, t))
    cos, sin, bias, mask = pos_terms(cfg, positions, mask)

    lengths = cache.lengths if cache is not None else None

    if cache is None:
        def body(carry, lp):
            if seq_sharding is not None:
                carry = jax.lax.with_sharding_constraint(carry, seq_sharding)
            h, _ = _layer(carry, lp, cfg, cos, sin, None, None, mask, None,
                          prefill, bias)
            return h, None

        if remat:
            # trade FLOPs for memory: recompute each layer in backward
            # (the reference's gradient_checkpointing flag,
            # train_qwen.py:1105-1111)
            body = jax.checkpoint(body)
        x, _ = lax.scan(body, x, params["layers"])
        new_cache = None
    elif isinstance(cache, PagedKVCache):
        tables = cache.block_tables
        owner = basep = None
        if pool_inplace and not prefill:
            # invert the tables ONCE (scan-invariant): per-page owner row +
            # base virtual position drive the in-place pool attention mask
            from fastvlm_tpu.ops.kv_cache import pool_ownership

            owner, basep = pool_ownership(tables, cache.num_pages,
                                          cache.page_size)
            if pool_bucket is not None:
                owner, basep = owner[:pool_bucket], basep[:pool_bucket]

        def body(carry, layer_in):
            lp, ck, cv = layer_in
            h, (nk, nv) = _layer(carry, lp, cfg, cos, sin, ck, cv, mask,
                                 lengths, prefill, bias, prefill_offset,
                                 block_tables=tables,
                                 pool_owner=owner, pool_base=basep,
                                 pool_bucket=pool_bucket)
            return h, (nk, nv)

        x, (nk, nv) = lax.scan(
            body, x, (params["layers"], cache.k_pages, cache.v_pages),
            unroll=cfg.scan_unroll)
        new_lengths = (lengths + t) if prefill else (lengths + 1)
        new_cache = PagedKVCache(k_pages=nk, v_pages=nv,
                                 block_tables=tables, lengths=new_lengths)
    elif cache.k_scale is not None:  # dense int8 KV cache
        def body(carry, layer_in):
            lp, ck, cv, cks, cvs = layer_in
            h, (nk, nv, nks, nvs) = _layer(
                carry, lp, cfg, cos, sin, ck, cv, mask, lengths, prefill,
                bias, prefill_offset, cache_ks=cks, cache_vs=cvs)
            return h, (nk, nv, nks, nvs)

        x, (nk, nv, nks, nvs) = lax.scan(
            body, x, (params["layers"], cache.k, cache.v,
                      cache.k_scale, cache.v_scale),
            unroll=cfg.scan_unroll)
        new_lengths = (lengths + t) if prefill else (lengths + 1)
        new_cache = KVCache(k=nk, v=nv, lengths=new_lengths,
                            k_scale=nks, v_scale=nvs)
    else:
        def body(carry, layer_in):
            lp, ck, cv = layer_in
            h, (nk, nv) = _layer(carry, lp, cfg, cos, sin, ck, cv, mask,
                                 lengths, prefill, bias, prefill_offset)
            return h, (nk, nv)

        x, (nk, nv) = lax.scan(body, x, (params["layers"], cache.k, cache.v),
                               unroll=cfg.scan_unroll)
        new_lengths = (lengths + t) if prefill else (lengths + 1)
        # prefill rows may be padded; caller overrides lengths afterwards if so
        new_cache = KVCache(k=nk, v=nv, lengths=new_lengths)

    x = _norm(x, params["final_norm"], cfg)
    return x, new_cache


def prefill_mask(seq_lens: jnp.ndarray, t: int, s_max: int,
                 window: Optional[int] = None) -> jnp.ndarray:
    """(B, T, S_max) mask for right-padded prefill: causal AND k < seq_len,
    optionally limited to a sliding window (Mistral)."""
    q_pos = jnp.arange(t)[:, None]
    k_pos = jnp.arange(s_max)[None, :]
    causal = k_pos <= q_pos  # (T, S_max)
    if window is not None:
        causal = causal & (q_pos - k_pos < window)
    valid = k_pos[None] < seq_lens[:, None, None]  # (B, 1, S_max)
    return causal[None] & valid


def decode_mask(lengths: jnp.ndarray, s_max: int,
                window: Optional[int] = None) -> jnp.ndarray:
    """(B, 1, S_max) mask for one decode step: attend to k <= lengths[b].

    (the new token is written at index lengths[b] before attending)."""
    k_pos = jnp.arange(s_max)[None, None, :]
    m = k_pos <= lengths[:, None, None]
    if window is not None:
        m = m & (lengths[:, None, None] - k_pos < window)
    return m
