"""Token sampling: greedy, temperature, top-k, top-p — jit-friendly.

Covers the generation knobs the reference exposes through HF ``generate``
(predict.py:57-67: do_sample/temperature/top_p; model_worker.py:140-160 adds
max_new_tokens/stop strings). All ops are static-shape and run on device.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class SamplingParams(NamedTuple):
    temperature: float = 0.0  # 0 => greedy
    top_p: float = 1.0
    top_k: int = 0  # 0 => disabled


def greedy(logits: jnp.ndarray) -> jnp.ndarray:
    """logits (B, V) -> ids (B,)"""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _apply_top_k(logits, k):
    vals, _ = jax.lax.top_k(logits, k)
    kth = vals[..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def _apply_top_p(logits, top_p):
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < top_p; always keep top-1
    keep_sorted = (cum - probs) < top_p
    # threshold = smallest kept logit
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, NEG_INF, logits)


def sample(
    key: jax.Array,
    logits: jnp.ndarray,
    params: SamplingParams = SamplingParams(),
) -> jnp.ndarray:
    """logits (B, V) float -> sampled ids (B,). temperature==0 is greedy."""
    if params.temperature <= 0.0:
        return greedy(logits)
    logits = logits.astype(jnp.float32) / params.temperature
    if params.top_k and params.top_k > 0:
        logits = _apply_top_k(logits, params.top_k)
    if params.top_p < 1.0:
        logits = _apply_top_p(logits, params.top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
