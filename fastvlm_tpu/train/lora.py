"""LoRA adapters for the decoder (reference train_qwen.py:1050-1067,
1113-1129, 1232-1242: peft LoRA fine-tune + split save).

A LoRA'd linear carries extra leaves {"lora_a": (..., cin, r), "lora_b":
(..., r, cout), "lora_scale": (...,)} next to the frozen "w"; the decoder's
``_project`` adds ``scale * (x @ A) @ B`` when present (models/qwen2.py).
All leaves are arrays, so stacked layers stay lax.scan-able and shard like
any other param. ``merge`` folds adapters back into the dense weights for
serving (the reference's merge_and_unload path, model/builder.py:56-65).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

DEFAULT_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def _target_cin(name: str, cfg) -> int:
    """Input width of a decoder linear by name (for quantized layers, whose
    packed int4 w_q can't reveal cin from shape alone)."""
    if name == "o":
        return cfg.q_dim
    if name == "down":
        return cfg.intermediate_size
    return cfg.hidden_size  # q/k/v/gate/up/qkv/gateup


def add_lora(
    decoder_params: Dict[str, Any],
    rng: jax.Array,
    r: int = 8,
    alpha: float = 16.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
    cfg=None,
) -> Dict[str, Any]:
    """Attach zero-initialized adapters (A ~ N(0, 0.02), B = 0 => identity
    at step 0, like peft).

    Also attaches to weight-only-quantized linears ({"w_q","scale"} dicts,
    ops/quant.py) — the QLoRA configuration (reference train_qwen.py:
    1050-1067 bnb 4/8-bit base + :1113-1129 peft adapters +
    prepare_model_for_kbit_training). Pass ``cfg`` (Qwen2Config) for
    quantized bases: packed int4 weights can't reveal cin from shape."""
    out = dict(decoder_params)
    layers = dict(decoder_params["layers"])
    keys = jax.random.split(rng, len(targets))
    for key, name in zip(keys, targets):
        if name not in layers:
            continue
        p = dict(layers[name])
        if "w" in p:
            w = p["w"]  # (L, cin, cout)
            lead, (cin, cout) = w.shape[:-2], w.shape[-2:]
            dtype = w.dtype
        elif "w_q" in p:
            if cfg is None:
                raise ValueError(
                    f"add_lora on quantized layer {name!r} needs cfg= "
                    "(int4 packing hides cin)")
            lead = p["scale"].shape[:-1]
            cin, cout = _target_cin(name, cfg), p["scale"].shape[-1]
            dtype = p["b"].dtype if "b" in p else jnp.bfloat16
        else:
            continue
        p["lora_a"] = (jax.random.normal(key, lead + (cin, r)) * 0.02
                       ).astype(dtype)
        p["lora_b"] = jnp.zeros(lead + (r, cout), dtype)
        p["lora_scale"] = jnp.full(lead + (1,), alpha / r, jnp.float32)
        layers[name] = p
    out["layers"] = layers
    return out


def merge(decoder_params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold adapters into dense weights; drop lora leaves.

    Quantized bases ({"w_q","scale"}): dequantize, add the delta, and
    requantize at the original width — the serving-time equivalent of
    peft merge_and_unload on a kbit model (reference model/builder.py:56-65)."""
    from fastvlm_tpu.ops import quant

    out = dict(decoder_params)
    layers = {}
    for name, p in decoder_params["layers"].items():
        if isinstance(p, dict) and "lora_a" in p:
            p = dict(p)
            delta = jnp.einsum(
                "...ir,...ro->...io", p["lora_a"].astype(jnp.float32),
                p["lora_b"].astype(jnp.float32))
            scale = p["lora_scale"][..., None]
            if "w_q" in p:
                cin = p["lora_a"].shape[-2]
                bits = 8 if p["w_q"].shape[-2] == cin else 4
                w = quant.dequantize(p, cin) + scale * delta
                p["w_q"], p["scale"] = quant._quantize_array(w, bits)
            else:
                p["w"] = (p["w"].astype(jnp.float32) + scale * delta).astype(
                    p["w"].dtype)
            for k in ("lora_a", "lora_b", "lora_scale"):
                del p[k]
        layers[name] = p
    out["layers"] = layers
    return out


def split_lora_state(decoder_params: Dict[str, Any]) -> Dict[str, Any]:
    """Extract only the adapter leaves (the reference's LoRA split save)."""
    lora = {}
    for name, p in decoder_params["layers"].items():
        if isinstance(p, dict) and "lora_a" in p:
            lora[name] = {k: p[k] for k in ("lora_a", "lora_b", "lora_scale")}
    return lora


def lora_label_tree(params: Dict[str, Any]) -> Any:
    """Leaf labels for optax.multi_transform: 'lora' for adapter leaves,
    'frozen' for everything else in the full VLM tree."""

    def label(path, _):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        return "lora" if "lora_" in name else "frozen"

    return jax.tree_util.tree_map_with_path(label, params)


def make_lora_optimizer(params: Dict[str, Any], lr: float = 1e-4,
                        weight_decay: float = 0.0,
                        grad_clip: float = 1.0) -> optax.GradientTransformation:
    """AdamW on adapter leaves only; every dense weight frozen."""
    return optax.multi_transform(
        {
            "lora": optax.chain(
                optax.clip_by_global_norm(grad_clip),
                optax.adamw(lr, weight_decay=weight_decay)),
            "frozen": optax.set_to_zero(),
        },
        lora_label_tree,
    )
