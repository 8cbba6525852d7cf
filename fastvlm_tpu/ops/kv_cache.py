"""Static-shape KV cache for autoregressive decode under jit.

TPU-first design: the cache is a pair of dense (L, B, S_max, H_kv, D) arrays
allocated once (static shapes — XLA requirement), written compactly per
sequence. Each batch row b fills positions [0, len_b) — no left padding, no
ragged shapes. Decode writes token t of row b at index ``lengths[b]`` via a
batch-vmapped dynamic_update_slice, and attention masks keys at
``k >= lengths[b]`` (+1 for the in-flight token).

This replaces the reference's HF DynamicCache (growing python-list cache) with
a compile-once, allocation-free decode step. Paged/block layouts for serving
live in ops/pallas/decode_attention.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, B, S_max, H_kv, D)
    v: jnp.ndarray  # (L, B, S_max, H_kv, D)
    lengths: jnp.ndarray  # (B,) int32 — tokens currently stored per row

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]


def init_cache(num_layers, batch, max_len, num_kv_heads, head_dim, dtype=jnp.bfloat16):
    shape = (num_layers, batch, max_len, num_kv_heads, head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


def write_prompt(layer_k, layer_v, new_k, new_v, offset=0):
    """Prefill write: place (B, T, H, D) keys/values at positions
    [offset, offset+T). offset may be a traced scalar (prefix-reuse paths)."""
    layer_k = lax.dynamic_update_slice_in_dim(
        layer_k, new_k.astype(layer_k.dtype), offset, axis=1)
    layer_v = lax.dynamic_update_slice_in_dim(
        layer_v, new_v.astype(layer_v.dtype), offset, axis=1)
    return layer_k, layer_v


def write_token(layer_k, layer_v, new_k, new_v, lengths):
    """Decode write: row b's (1, H, D) key/value goes to index lengths[b].

    layer_k/v: (B, S_max, H, D); new_k/v: (B, 1, H, D); lengths: (B,)
    """

    def _upd(buf_row, new_row, idx):
        return lax.dynamic_update_slice_in_dim(
            buf_row, new_row.astype(buf_row.dtype), idx, axis=0
        )

    layer_k = jax.vmap(_upd)(layer_k, new_k, lengths)
    layer_v = jax.vmap(_upd)(layer_v, new_v, lengths)
    return layer_k, layer_v
