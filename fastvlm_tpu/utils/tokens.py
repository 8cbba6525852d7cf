"""Vision special-token setup: grow the vocabulary + embeddings.

Equivalent of the reference's ``initialize_vision_tokenizer``
(llava_arch.py:334-377): optionally add <im_patch> / <im_start> / <im_end>
to the tokenizer and resize the embedding (and untied LM head) rows, with the
new rows initialized to the mean of the existing embeddings.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from fastvlm_tpu.config import Qwen2Config
from fastvlm_tpu.data.constants import (
    DEFAULT_IM_END_TOKEN, DEFAULT_IM_START_TOKEN, DEFAULT_IMAGE_PATCH_TOKEN)


def _mean_init_rows(mat: jnp.ndarray, n_new: int) -> jnp.ndarray:
    """Append n_new rows equal to the column mean (llava_arch.py:352-360)."""
    mean = jnp.mean(mat.astype(jnp.float32), axis=0, keepdims=True)
    new = jnp.repeat(mean, n_new, axis=0).astype(mat.dtype)
    return jnp.concatenate([mat, new], axis=0)


def add_special_tokens(
    tokenizer,
    decoder_params: Dict[str, Any],
    cfg: Qwen2Config,
    *,
    use_im_patch: bool = False,
    use_im_start_end: bool = False,
) -> Tuple[Dict[str, Any], Qwen2Config, int]:
    """Returns (new_decoder_params, new_cfg, num_added)."""
    tokens: List[str] = []
    if use_im_patch:
        tokens.append(DEFAULT_IMAGE_PATCH_TOKEN)
    if use_im_start_end:
        tokens.extend([DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN])
    if not tokens:
        return decoder_params, cfg, 0

    added = tokenizer.add_tokens(tokens, special_tokens=True) \
        if hasattr(tokenizer, "add_tokens") else len(tokens)
    if added == 0:
        return decoder_params, cfg, 0

    params = dict(decoder_params)
    params["embed"] = _mean_init_rows(params["embed"], added)
    if "lm_head" in params:
        head = dict(params["lm_head"])
        # lm_head w is (D, V): grow columns with the mean column
        w = head["w"]
        mean = jnp.mean(w.astype(jnp.float32), axis=1, keepdims=True)
        head["w"] = jnp.concatenate(
            [w, jnp.repeat(mean, added, axis=1).astype(w.dtype)], axis=1)
        params["lm_head"] = head
    new_cfg = dataclasses.replace(cfg, vocab_size=cfg.vocab_size + added)
    return params, new_cfg, added
