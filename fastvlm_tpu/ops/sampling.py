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


class RowSampling(NamedTuple):
    """Per-row sampling knobs as traced ``(B,)`` arrays.

    ``SamplingParams`` is static under jit (every distinct config keys a
    fresh XLA program and batches can't mix configs — the reference worker
    has the same constraint implicitly, serving one request at a time,
    model_worker.py:140-160). ``RowSampling`` is the batched-serving
    alternative: the knobs are *data*, so ONE compiled decode program
    serves any mix of greedy and sampled rows in the same batch.
    """

    temperature: jnp.ndarray  # (B,) float32; <= 0 => greedy for that row
    top_p: jnp.ndarray        # (B,) float32; 1.0 => disabled
    top_k: jnp.ndarray        # (B,) int32;   0   => disabled

    @staticmethod
    def build(params_per_row, b: int) -> "RowSampling":
        """Stack per-row ``SamplingParams`` (None => greedy pad row)."""
        import numpy as np
        t = np.zeros((b,), np.float32)
        p = np.ones((b,), np.float32)
        k = np.zeros((b,), np.int32)
        for i, sp in enumerate(params_per_row[:b]):
            if sp is None:
                continue
            t[i] = getattr(sp, "temperature", 0.0)
            p[i] = getattr(sp, "top_p", 1.0)
            k[i] = getattr(sp, "top_k", 0)
        return RowSampling(jnp.asarray(t), jnp.asarray(p), jnp.asarray(k))


def sample_rows(key: jax.Array, logits: jnp.ndarray,
                rows: RowSampling) -> jnp.ndarray:
    """Per-row sampling: logits (B, V) -> ids (B,), knobs traced per row.

    Greedy rows (temperature <= 0) take argmax; sampled rows get
    temperature scaling + per-row top-k / top-p masks. The masked path
    needs one descending sort of (B, V) — an all-greedy batch skips it via
    ``lax.cond`` (both branches live in the same compiled program, so a
    batch's config mix never triggers a recompile mid-flight).
    """
    g = greedy(logits)

    def mixed(_):
        v = logits.shape[-1]
        temps = jnp.maximum(rows.temperature, 1e-6)[:, None]
        scaled = logits.astype(jnp.float32) / temps
        srt = jnp.sort(scaled, axis=-1)[..., ::-1]
        ranks = jnp.arange(v)[None, :]
        # per-row top-k in rank space (top_k == 0 keeps all)
        keep_k = (rows.top_k[:, None] <= 0) | (ranks < rows.top_k[:, None])
        srt_m = jnp.where(keep_k, srt, NEG_INF)
        # per-row top-p over the top-k-masked distribution; top-1 always kept
        probs = jax.nn.softmax(srt_m, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_p = (((cum - probs) < rows.top_p[:, None]) | (ranks == 0)) \
            & keep_k
        thresh = jnp.min(jnp.where(keep_p, srt_m, jnp.inf), axis=-1,
                         keepdims=True)
        masked = jnp.where(scaled < thresh, NEG_INF, scaled)
        s = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
        return jnp.where(rows.temperature <= 0.0, g, s)

    return jax.lax.cond(jnp.any(rows.temperature > 0.0), mixed,
                        lambda _: g, None)
