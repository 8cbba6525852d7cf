"""CLIP ViT vision tower (alternative to FastViTHD) + S2 multi-scale wrapper.

Covers the reference's CLIPVisionTower / CLIPVisionTowerS2
(llava/model/multimodal_encoder/clip_encoder.py:7-167): a standard pre-LN
ViT (HF CLIPVisionModel semantics — quick_gelu MLP, CLS token, learned
position embeddings), feature-selected at a configurable hidden layer
(default -2 = penultimate) with 'patch' (drop CLS) or 'cls_patch' selection,
and an S2 variant that concatenates features from multiple input scales
channel-wise (hidden size multiplies by len(scales)).

TPU notes: tokens stay (B, N, C) dense; per-layer params are stacked for
lax.scan; attention is fused-QKV MHSA with f32 softmax.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from fastvlm_tpu.ops.conv import layer_norm

Params = Dict[str, Any]


@dataclass(frozen=True)
class CLIPViTConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    ln_eps: float = 1e-5
    select_layer: int = -2          # hidden_states index (HF convention)
    select_feature: str = "patch"   # 'patch' | 'cls_patch'
    s2_scales: Tuple[int, ...] = ()  # e.g. (336, 672, 1008) for S2

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def out_hidden_size(self) -> int:
        mult = max(len(self.s2_scales), 1)
        return self.hidden_size * mult

    # interface aliases shared with FastViTConfig (vlm/anyres plumbing)
    @property
    def num_tokens(self) -> int:
        n = self.num_patches
        return n + 1 if self.select_feature == "cls_patch" else n

    @property
    def grid_size(self) -> int:
        return self.grid

    @property
    def out_channels(self) -> int:
        return self.out_hidden_size


def quick_gelu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


def _linear_init(key, cin, cout, dtype=jnp.float32):
    return {
        "w": (jax.random.normal(key, (cin, cout)) * 0.02).astype(dtype),
        "b": jnp.zeros((cout,), dtype),
    }


def init(key, cfg: CLIPViTConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4 + cfg.num_layers)
    d = cfg.hidden_size
    layers = []
    for i in range(cfg.num_layers):
        lk = jax.random.split(ks[4 + i], 4)
        layers.append({
            "ln1_s": jnp.ones((d,), dtype), "ln1_b": jnp.zeros((d,), dtype),
            "qkv": _linear_init(lk[0], d, 3 * d, dtype),
            "proj": _linear_init(lk[1], d, d, dtype),
            "ln2_s": jnp.ones((d,), dtype), "ln2_b": jnp.zeros((d,), dtype),
            "fc1": _linear_init(lk[2], d, cfg.intermediate_size, dtype),
            "fc2": _linear_init(lk[3], cfg.intermediate_size, d, dtype),
        })
    return {
        "patch_embed": (jax.random.normal(
            ks[0], (cfg.patch_size, cfg.patch_size, 3, d)) * 0.02).astype(dtype),
        "class_embed": (jax.random.normal(ks[1], (d,)) * 0.02).astype(dtype),
        "pos_embed": (jax.random.normal(
            ks[2], (cfg.num_patches + 1, d)) * 0.02).astype(dtype),
        "pre_ln_s": jnp.ones((d,), dtype), "pre_ln_b": jnp.zeros((d,), dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }


def _attn(x, p, num_heads, eps):
    b, n, d = x.shape
    hd = d // num_heads
    h = layer_norm(x, p["ln1_s"], p["ln1_b"], eps)
    qkv = (jnp.einsum("bnd,df->bnf", h, p["qkv"]["w"].astype(h.dtype),
                      preferred_element_type=jnp.float32)
           + p["qkv"]["b"].astype(jnp.float32)).astype(h.dtype)
    qkv = qkv.reshape(b, n, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    out = out.reshape(b, n, d)
    out = (jnp.einsum("bnd,df->bnf", out, p["proj"]["w"].astype(out.dtype),
                      preferred_element_type=jnp.float32)
           + p["proj"]["b"].astype(jnp.float32)).astype(out.dtype)
    return x + out


def _mlp(x, p, eps):
    h = layer_norm(x, p["ln2_s"], p["ln2_b"], eps)
    h = (jnp.einsum("bnd,df->bnf", h, p["fc1"]["w"].astype(h.dtype),
                    preferred_element_type=jnp.float32)
         + p["fc1"]["b"].astype(jnp.float32)).astype(h.dtype)
    h = quick_gelu(h)
    h = (jnp.einsum("bnd,df->bnf", h, p["fc2"]["w"].astype(h.dtype),
                    preferred_element_type=jnp.float32)
         + p["fc2"]["b"].astype(jnp.float32)).astype(h.dtype)
    return x + h


def _embed(params, x, cfg: CLIPViTConfig):
    b = x.shape[0]
    patches = lax.conv_general_dilated(
        x, params["patch_embed"].astype(x.dtype),
        (cfg.patch_size, cfg.patch_size), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    patches = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(
        params["class_embed"].astype(x.dtype)[None, None],
        (b, 1, cfg.hidden_size))
    tokens = jnp.concatenate([cls, patches], axis=1)
    return tokens + params["pos_embed"].astype(x.dtype)[None]


def hidden_at_layer(params, x, cfg: CLIPViTConfig) -> jnp.ndarray:
    """x (B, S, S, 3) -> hidden states at cfg.select_layer (HF indexing:
    -1 = last layer output, -2 = penultimate; no post-LN applied)."""
    tokens = _embed(params, x, cfg)
    tokens = layer_norm(tokens, params["pre_ln_s"], params["pre_ln_b"],
                        cfg.ln_eps)
    n_run = cfg.num_layers + 1 + cfg.select_layer if cfg.select_layer < 0 \
        else cfg.select_layer
    n_run = max(0, min(n_run, cfg.num_layers))

    def body(carry, lp):
        h = _attn(carry, lp, cfg.num_heads, cfg.ln_eps)
        h = _mlp(h, lp, cfg.ln_eps)
        return h, None

    sliced = jax.tree.map(lambda a: a[:n_run], params["layers"])
    tokens, _ = lax.scan(body, tokens, sliced)
    return tokens


def features(params, x, cfg: CLIPViTConfig) -> jnp.ndarray:
    """Tower features after select (reference clip_encoder.py:36-49):
    (B, N, hidden) with CLS dropped for 'patch'."""
    h = hidden_at_layer(params, x, cfg)
    if cfg.select_feature == "patch":
        return h[:, 1:]
    if cfg.select_feature == "cls_patch":
        return h
    raise ValueError(cfg.select_feature)


def features_s2(params, x, cfg: CLIPViTConfig) -> jnp.ndarray:
    """S2 multi-scale (reference clip_encoder.py:98-167 via s2wrapper):
    for each scale: resize -> tile into base-size crops -> encode -> stitch
    grids -> pool back to base grid; concat channel-wise across scales."""
    assert cfg.s2_scales, "configure s2_scales"
    base = cfg.s2_scales[0]
    assert base == cfg.image_size
    g = cfg.grid
    outs = []
    for s in cfg.s2_scales:
        t = s // base
        if s == x.shape[1]:
            xi = x
        else:
            xi = jax.image.resize(
                x.astype(jnp.float32), (x.shape[0], s, s, 3),
                method="bicubic", antialias=True).astype(x.dtype)
        b = xi.shape[0]
        # (B, t, base, t, base, 3) -> (B*t*t, base, base, 3), row-major tiles
        tiles = xi.reshape(b, t, base, t, base, 3).transpose(0, 1, 3, 2, 4, 5)
        tiles = tiles.reshape(b * t * t, base, base, 3)
        f = features(params, tiles, cfg)            # (B*t*t, g*g, C)
        f = f.reshape(b, t, t, g, g, -1).transpose(0, 1, 3, 2, 4, 5)
        f = f.reshape(b, t * g, t * g, -1)          # stitched feature map
        if t > 1:  # pool back to base grid
            f = jax.image.resize(
                f.astype(jnp.float32), (b, g, g, f.shape[-1]),
                method="bilinear").astype(f.dtype)
        outs.append(f.reshape(b, g * g, -1))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# HF CLIPVisionModel checkpoint conversion
# ---------------------------------------------------------------------------


def convert_from_hf(sd: Dict[str, Any], cfg: CLIPViTConfig,
                    dtype=jnp.float32, prefix: str = "vision_model.") -> Params:
    import numpy as np

    g = lambda n: np.asarray(sd[prefix + n], np.float32)  # noqa: E731

    def lin(name):
        return {"w": jnp.asarray(g(name + ".weight").T, dtype),
                "b": jnp.asarray(g(name + ".bias"), dtype)}

    layers = []
    for i in range(cfg.num_layers):
        base = f"encoder.layers.{i}."
        # fuse separate q/k/v into one qkv matmul
        qw, kw, vw = (g(base + f"self_attn.{n}_proj.weight") for n in "qkv")
        qb, kb, vb = (g(base + f"self_attn.{n}_proj.bias") for n in "qkv")
        import numpy as _np

        layers.append({
            "ln1_s": jnp.asarray(g(base + "layer_norm1.weight"), dtype),
            "ln1_b": jnp.asarray(g(base + "layer_norm1.bias"), dtype),
            "qkv": {"w": jnp.asarray(_np.concatenate([qw, kw, vw], 0).T, dtype),
                    "b": jnp.asarray(_np.concatenate([qb, kb, vb], 0), dtype)},
            "proj": lin(base + "self_attn.out_proj"),
            "ln2_s": jnp.asarray(g(base + "layer_norm2.weight"), dtype),
            "ln2_b": jnp.asarray(g(base + "layer_norm2.bias"), dtype),
            "fc1": lin(base + "mlp.fc1"),
            "fc2": lin(base + "mlp.fc2"),
        })
    import numpy as _np

    return {
        "patch_embed": jnp.asarray(_np.transpose(
            g("embeddings.patch_embedding.weight"), (2, 3, 1, 0)), dtype),
        "class_embed": jnp.asarray(g("embeddings.class_embedding"), dtype),
        "pos_embed": jnp.asarray(
            g("embeddings.position_embedding.weight"), dtype),
        "pre_ln_s": jnp.asarray(g("pre_layrnorm.weight"), dtype),
        "pre_ln_b": jnp.asarray(g("pre_layrnorm.bias"), dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }
