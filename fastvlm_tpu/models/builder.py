"""Tower/decoder builders — dispatch equivalents of the reference's
multimodal_encoder/builder.py:6-19 and the llava_{qwen,llama,mistral}
model-type registry (model/builder.py:26-181).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from fastvlm_tpu.config import FastViTConfig, Qwen2Config, decoder_from_hf_dict
from fastvlm_tpu.models.clip_vit import CLIPViTConfig


def build_vision_tower_config(name: str, **kw):
    """Dispatch on tower name (reference multimodal_encoder/builder.py:6-19):
    'mobileclip*' -> FastViTHD; 'openai'/'laion'/path -> CLIP ViT (+S2 via
    s2_scales kw)."""
    lowered = name.lower()
    if "mobileclip" in lowered:
        image_size = 1024
        tail = name.rsplit("_", 1)[-1]
        if tail.isdigit():
            image_size = int(tail)
        return FastViTConfig(image_size=image_size, **kw)
    if "clip" in lowered or "openai" in lowered or "laion" in lowered \
            or lowered.startswith(("/", ".")):
        return CLIPViTConfig(**kw)
    raise ValueError(f"unknown vision tower: {name}")


_FAMILY_DEFAULTS: Dict[str, Dict[str, Any]] = {
    "qwen2": {},
    "llava_qwen2": {},
    "llama": {"qkv_bias": False},
    "llava_llama": {"qkv_bias": False},
    "mistral": {"qkv_bias": False},
    "llava_mistral": {"qkv_bias": False},
    "mpt": {"qkv_bias": False, "pos_emb": "alibi"},
    "llava_mpt": {"qkv_bias": False, "pos_emb": "alibi"},
}


def build_decoder_config(hf_config: Dict[str, Any], **overrides) -> Qwen2Config:
    """HF config.json dict -> decoder config, honoring model_type family
    defaults (QKV bias, sliding window, ALiBi)."""
    family = hf_config.get("model_type", "qwen2")
    kw = dict(_FAMILY_DEFAULTS.get(family, {}))
    if hf_config.get("sliding_window") and hf_config.get(
            "use_sliding_window", True):
        kw["attn_window"] = hf_config["sliding_window"]
    kw.update(overrides)
    return decoder_from_hf_dict(hf_config, **kw)
