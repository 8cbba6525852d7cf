"""FastViTHD hybrid vision encoder — TPU-native JAX implementation.

Behavioral contract (reference: llava/model/multimodal_encoder/mobileclip/mci.py,
``fastvithd`` factory at mci.py:1454-1478): input (B, H, W, 3) -> token features
(B, (H/64)*(W/64), 3072). At 1024x1024 that is 256 tokens of dim 3072 — the
whole point of the architecture (very low TTFT from few vision tokens).

Only the *reparameterized inference form* is modeled (the released checkpoints
are built with ``inference_mode=True``, mci.py:1472): every MobileOne /
ReparamLargeKernelConv / RepMixer / RepCPE block collapses to one conv+bias.
The BatchNorm inside ConvFFN is folded into its depthwise conv at weight-import
time (see utils/checkpoint.py), so the runtime graph is pure conv/GELU/LN/MHSA.

TPU-first design choices (not present in the reference):
  * NHWC layout end-to-end; HWIO kernels; float32 accumulation.
  * Homogeneous blocks within a stage are stacked and driven by ``lax.scan``
    — one compiled block body per stage instead of 44 unrolled blocks,
    cutting compile time while keeping the sequential dataflow XLA fuses well.
  * Attention runs on flattened (B, N, C) tokens with a fused QKV matmul.

Structure (inference form), stride/dims at 1024 px:
  stem (x4):        conv3x3 s2 (3->96) | dw3x3 s2 | pw1x1        -> 256x256x96
  stage 0:          2 x RepMixerBlock(96)
  down (x2):        dw7x7 s2 RepLK + pw1x1                       -> 128x128x192
  stage 1:          12 x RepMixerBlock(192)
  down (x2):                                                     -> 64x64x384
  stage 2:          24 x RepMixerBlock(384)
  down (x2):                                                     -> 32x32x768
  RepCPE dw7x7; stage 3: 4 x AttentionBlock(768, 24 heads)
  down (x2):                                                     -> 16x16x1536
  RepCPE dw7x7; stage 4: 2 x AttentionBlock(1536, 48 heads)
  conv_exp:         dw3x3 (1536->3072) + SE + GELU               -> 16x16x3072
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax import lax

from fastvlm_tpu.config import FastViTConfig, resolve_dtype
from fastvlm_tpu.ops.conv import conv2d, conv_block, gelu, layer_norm, se_gate

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter initialization (random; real weights come from utils/checkpoint.py)
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin_per_group, cout, dtype, std=0.02):
    kw_, kb_ = jax.random.split(key)
    return {
        "w": (jax.random.normal(kw_, (kh, kw, cin_per_group, cout)) * std).astype(dtype),
        "b": jnp.zeros((cout,), dtype),
    }


def _linear_init(key, cin, cout, dtype, bias=True, std=0.02):
    p = {"w": (jax.random.normal(key, (cin, cout)) * std).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _se_init(key, c, rd_ratio, dtype):
    k1, k2 = jax.random.split(key)
    rd = int(c * rd_ratio)
    return {
        "reduce_w": (jax.random.normal(k1, (1, 1, c, rd)) * 0.02).astype(dtype),
        "reduce_b": jnp.zeros((rd,), dtype),
        "expand_w": (jax.random.normal(k2, (1, 1, rd, c)) * 0.02).astype(dtype),
        "expand_b": jnp.zeros((c,), dtype),
    }


def _ffn_init(key, c, hidden, k, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dw": _conv_init(k1, k, k, 1, c, dtype),
        "fc1": _conv_init(k2, 1, 1, c, hidden, dtype),
        "fc2": _conv_init(k3, 1, 1, hidden, c, dtype),
    }


def _repmixer_block_init(key, c, cfg: FastViTConfig, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "mixer": _conv_init(k1, cfg.repmixer_kernel, cfg.repmixer_kernel, 1, c, dtype),
        "ffn": _ffn_init(k2, c, c * cfg.mlp_ratios[0], cfg.ffn_kernel, dtype),
        "ls": jnp.full((c,), 1e-5, dtype),
    }


def _attention_block_init(key, c, cfg: FastViTConfig, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm_scale": jnp.ones((c,), dtype),
        "norm_bias": jnp.zeros((c,), dtype),
        "qkv": _linear_init(k1, c, 3 * c, dtype, bias=False),
        "proj": _linear_init(k2, c, c, dtype, bias=True),
        "ffn": _ffn_init(k3, c, c * cfg.mlp_ratios[0], cfg.ffn_kernel, dtype),
        "ls1": jnp.full((c,), 1e-5, dtype),
        "ls2": jnp.full((c,), 1e-5, dtype),
    }


def init(key, cfg: FastViTConfig) -> Params:
    """Random params with checkpoint-correct shapes (for tests / benchmarks)."""
    dtype = resolve_dtype(cfg.param_dtype)
    keys = jax.random.split(key, 4 + len(cfg.layers) * 3)
    ki = iter(keys)

    c0 = cfg.embed_dims[0]
    stem = [
        _conv_init(next(ki), 3, 3, 3, c0, dtype),
        _conv_init(next(ki), 3, 3, 1, c0, dtype),
        _conv_init(next(ki), 1, 1, c0, c0, dtype),
    ]

    stages: List[Params] = []
    for i, (n_blocks, c) in enumerate(zip(cfg.layers, cfg.embed_dims)):
        stage: Params = {}
        if cfg.pos_embs[i]:
            stage["cpe"] = _conv_init(
                next(ki), cfg.pos_emb_kernel, cfg.pos_emb_kernel, 1, c, dtype
            )
        block_init = (
            _repmixer_block_init
            if cfg.token_mixers[i] == "repmixer"
            else _attention_block_init
        )
        bkeys = jax.random.split(next(ki), n_blocks)
        blocks = [block_init(bk, c, cfg, dtype) for bk in bkeys]
        stage["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        if i + 1 < len(cfg.layers):
            c_next = cfg.embed_dims[i + 1]
            dk1, dk2 = jax.random.split(next(ki))
            stage["down"] = {
                "lk": _conv_init(dk1, cfg.down_patch_size, cfg.down_patch_size, 1, c_next, dtype),
                "pw": _conv_init(dk2, 1, 1, c_next, c_next, dtype),
            }
        stages.append(stage)

    cexp_key, se_key = jax.random.split(next(ki))
    c_last = cfg.embed_dims[-1]
    conv_exp = _conv_init(cexp_key, 3, 3, 1, cfg.out_channels, dtype)
    conv_exp["se"] = _se_init(se_key, cfg.out_channels, cfg.se_rd_ratio, dtype)

    return {"stem": stem, "stages": stages, "conv_exp": conv_exp}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _ffn(x, p):
    """ConvFFN (reference mci.py:862-927): dw7x7(+folded BN) -> pw GELU MLP."""
    c = x.shape[-1]
    y = conv2d(x, p["dw"]["w"], p["dw"]["b"], groups=c)
    y = conv2d(y, p["fc1"]["w"], p["fc1"]["b"], padding=0)
    y = gelu(y)
    y = conv2d(y, p["fc2"]["w"], p["fc2"]["b"], padding=0)
    return y


def _ffn_residual(x, p, ls, cfg: FastViTConfig):
    """x + ls * ConvFFN(x), optionally via the fused Pallas kernel.

    ls is None when the layer scale was folded into fc2 at import
    (fold_layer_scale) — the residual is then a plain add."""
    c = x.shape[-1]
    if cfg.ffn_backend == "pallas":
        import jax as _jax

        from fastvlm_tpu.ops.pallas.ffn import ffn_block_apply

        if ls is None:
            ls = jnp.ones((x.shape[-1],), x.dtype)
        t = conv2d(x, p["dw"]["w"], p["dw"]["b"], groups=c)
        return ffn_block_apply(
            t, x, p, ls, interpret=_jax.default_backend() == "cpu")
    if ls is None:
        return x + _ffn(x, p)
    return x + ls.astype(x.dtype) * _ffn(x, p)


def _repmixer_block(x, p, cfg: FastViTConfig):
    """Inference RepMixerBlock (reference mci.py:1042-1113): fused dw-conv token
    mixer (identity + layer-scaled mix already folded in, mci.py:819-859),
    then layer-scaled ConvFFN residual."""
    c = x.shape[-1]
    x = conv2d(x, p["mixer"]["w"], p["mixer"]["b"], groups=c)
    return _ffn_residual(x, p["ffn"], p.get("ls"), cfg)


def _mhsa(x, p, head_dim: int):
    """Plain softmax MHSA on (B, N, C) tokens; q scaled pre-matmul, softmax in
    f32 (reference mci.py:626-685: head_dim 32, qkv bias-free, proj bias)."""
    b, n, c = x.shape
    nh = c // head_dim
    qkv = jnp.einsum(
        "bnc,cd->bnd", x, p["qkv"]["w"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    qkv = qkv.reshape(b, n, 3, nh, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, nh, hd)
    scale = head_dim ** -0.5
    attn = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    out = out.reshape(b, n, c)
    out = jnp.einsum(
        "bnc,cd->bnd", out, p["proj"]["w"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return (out + p["proj"]["b"].astype(jnp.float32)).astype(x.dtype)


def _attention_block(x, p, cfg: FastViTConfig):
    """Inference AttentionBlock (reference mci.py:1116-1192):
    x += ls1 * MHSA(LNChannel(x)); x += ls2 * ConvFFN(x)."""
    b, h, w, c = x.shape
    y = layer_norm(x, p["norm_scale"], p["norm_bias"], cfg.ln_eps)
    y = _mhsa(y.reshape(b, h * w, c), p, cfg.attn_head_dim).reshape(b, h, w, c)
    if "ls1" in p:  # absent when folded into proj (fold_layer_scale)
        y = p["ls1"].astype(x.dtype) * y
    x = x + y
    return _ffn_residual(x, p["ffn"], p.get("ls2"), cfg)


def _run_stage(x, stage: Params, mixer_type: str, cfg: FastViTConfig):
    if "cpe" in stage:
        c = x.shape[-1]
        x = conv2d(x, stage["cpe"]["w"], stage["cpe"]["b"], groups=c)

    blocks = stage["blocks"]
    if mixer_type == "repmixer":
        body = lambda carry, bp: (_repmixer_block(carry, bp, cfg), None)
    else:
        body = lambda carry, bp: (_attention_block(carry, bp, cfg), None)
    x, _ = lax.scan(body, x, blocks)

    if "down" in stage:
        # PatchEmbed (reference mci.py:688-741): fused RepLK dw7x7 s2 -> GELU,
        # then pw1x1 -> GELU.
        c_in = x.shape[-1]
        x = conv_block(x, stage["down"]["lk"], stride=cfg.down_stride, groups=c_in)
        x = conv_block(x, stage["down"]["pw"], groups=1)
    return x


def apply(params: Params, x: jnp.ndarray, cfg: FastViTConfig) -> jnp.ndarray:
    """Encode images. x: (B, H, W, 3) -> (B, N, out_channels) token features.

    Equivalent to the reference tower forward + ``feature_select`` reshape
    (mobileclip_encoder.py:60-88): NCHW (B,3072,h,w) -> (B, h*w, 3072); our
    NHWC reshape yields the identical row-major token order.
    """
    cd = resolve_dtype(cfg.compute_dtype)
    x = x.astype(cd)

    # Stem (reference mci.py:553-603): conv3x3 s2, dw3x3 s2, pw1x1 — all GELU.
    c0 = cfg.embed_dims[0]
    x = conv_block(x, params["stem"][0], stride=2, groups=1)
    x = conv_block(x, params["stem"][1], stride=2, groups=c0)
    x = conv_block(x, params["stem"][2], groups=1)

    for i, stage in enumerate(params["stages"]):
        x = _run_stage(x, stage, cfg.token_mixers[i], cfg)

    # conv_exp (reference mci.py:1401-1411): dw3x3 widening + SE + GELU.
    x = conv_block(
        x,
        params["conv_exp"],
        groups=cfg.embed_dims[-1],
        se=params["conv_exp"]["se"],
    )

    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


def fold_layer_scale(params: Params) -> Params:
    """Fold per-channel layer scales into the adjacent projection weights
    (exact: ls ⊙ (W h + b) == (ls ⊙ W) h + ls ⊙ b) and DROP the ls leaves,
    deleting one broadcast-multiply per residual branch from the runtime
    graph (VERDICT r2 #7; the reference applies layer_scale as a separate
    tensor at mci.py:1042-1192 — at inference it is foldable).

      * RepMixerBlock ls   -> ffn.fc2 (w, b)
      * AttentionBlock ls1 -> proj (w, b);  ls2 -> ffn.fc2 (w, b)

    Works on both the stacked (scan) layout and single-block dicts; pure
    host math, applied at import/build time."""

    def scale_into(p, ls):
        # conv fc2 w: (L?, 1, 1, hidden, c); linear proj w: (L?, cin, c);
        # ls: (L?, c) — insert middle 1-dims so ls broadcasts over cout only
        w = p["w"]
        mid = w.ndim - ls.ndim
        ls_exp = ls.reshape(ls.shape[:-1] + (1,) * mid + (ls.shape[-1],))
        out = dict(p)
        out["w"] = (w.astype(jnp.float32)
                    * ls_exp.astype(jnp.float32)).astype(w.dtype)
        if "b" in p:
            out["b"] = (p["b"].astype(jnp.float32)
                        * ls.astype(jnp.float32)).astype(p["b"].dtype)
        return out

    out = dict(params)
    stages = []
    for stage in params["stages"]:
        stage = dict(stage)
        blocks = dict(stage["blocks"])
        if "ls" in blocks:
            ffn = dict(blocks["ffn"])
            ffn["fc2"] = scale_into(ffn["fc2"], blocks["ls"])
            blocks["ffn"] = ffn
            del blocks["ls"]
        if "ls1" in blocks:
            blocks["proj"] = scale_into(blocks["proj"], blocks["ls1"])
            del blocks["ls1"]
        if "ls2" in blocks:
            ffn = dict(blocks["ffn"])
            ffn["fc2"] = scale_into(ffn["fc2"], blocks["ls2"])
            blocks["ffn"] = ffn
            del blocks["ls2"]
        stage["blocks"] = blocks
        stages.append(stage)
    out["stages"] = stages
    return out


def features_grid(params: Params, x: jnp.ndarray, cfg: FastViTConfig) -> jnp.ndarray:
    """Encode but keep the (B, h, w, C) spatial grid (for anyres merge paths)."""
    b = x.shape[0]
    tokens = apply(params, x, cfg)
    g = cfg.image_size // cfg.total_stride
    return tokens.reshape(b, g, g, -1)
