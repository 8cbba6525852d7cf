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

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, B, S_max, H_kv, D) — bf16/f32, or int8 (quantized)
    v: jnp.ndarray  # (L, B, S_max, H_kv, D)
    lengths: jnp.ndarray  # (B,) int32 — tokens currently stored per row
    # int8 KV (cfg.decoder.kv_cache_dtype="int8"): per-token-per-head scales.
    # Decode at long context is KV-bandwidth-bound; int8 halves that traffic
    # (1.45x attention-scan speedup measured on chip, docs/PERF.md) and the
    # dequant convert fuses into the attention read — unlike the int8 WEIGHT
    # decode pathology, the dots here have a large free dim (S), not M=1.
    k_scale: Optional[jnp.ndarray] = None  # (L, B, S_max, H_kv) f32
    v_scale: Optional[jnp.ndarray] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]


def init_cache(num_layers, batch, max_len, num_kv_heads, head_dim,
               dtype=jnp.bfloat16):
    """dtype=jnp.int8 allocates the quantized layout (+ scale planes)."""
    shape = (num_layers, batch, max_len, num_kv_heads, head_dim)
    ks = vs = None
    if dtype == jnp.int8:
        # two distinct allocations: aliased leaves would break donation
        ks = jnp.ones(shape[:-1], jnp.float32)
        vs = jnp.ones(shape[:-1], jnp.float32)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        lengths=jnp.zeros((batch,), jnp.int32),
        k_scale=ks,
        v_scale=vs,
    )


def quantize_tokens(x):
    """(..., H, D) float -> (int8 values, (..., H) f32 per-token-head scale)."""
    m = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(m == 0, 1.0, m / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_view(x, scale, dtype):
    """int8 (..., H, D) + scale (..., H) -> dtype; XLA fuses the convert
    into the consuming attention read (measured, docs/PERF.md)."""
    if scale is None:
        return x.astype(dtype)
    return x.astype(dtype) * scale[..., None].astype(dtype)


def write_prompt(layer_k, layer_v, new_k, new_v, offset=0,
                 layer_ks=None, layer_vs=None):
    """Prefill write: place (B, T, H, D) keys/values at positions
    [offset, offset+T). offset may be a traced scalar (prefix-reuse paths).

    Returns (k, v) or (k, v, k_scale, v_scale) matching the cache layout."""
    quant = layer_k.dtype == jnp.int8
    if quant:
        new_k, ks = quantize_tokens(new_k)
        new_v, vs = quantize_tokens(new_v)
        layer_ks = lax.dynamic_update_slice_in_dim(layer_ks, ks, offset,
                                                   axis=1)
        layer_vs = lax.dynamic_update_slice_in_dim(layer_vs, vs, offset,
                                                   axis=1)
    layer_k = lax.dynamic_update_slice_in_dim(
        layer_k, new_k.astype(layer_k.dtype), offset, axis=1)
    layer_v = lax.dynamic_update_slice_in_dim(
        layer_v, new_v.astype(layer_v.dtype), offset, axis=1)
    if quant:
        return layer_k, layer_v, layer_ks, layer_vs
    return layer_k, layer_v


def write_token(layer_k, layer_v, new_k, new_v, lengths,
                layer_ks=None, layer_vs=None):
    """Decode write: row b's (1, H, D) key/value goes to index lengths[b].

    layer_k/v: (B, S_max, H, D); new_k/v: (B, 1, H, D); lengths: (B,)
    """

    def _upd(buf_row, new_row, idx):
        return lax.dynamic_update_slice_in_dim(
            buf_row, new_row.astype(buf_row.dtype), idx, axis=0
        )

    quant = layer_k.dtype == jnp.int8
    if quant:
        new_k, ks = quantize_tokens(new_k)
        new_v, vs = quantize_tokens(new_v)
        layer_ks = jax.vmap(_upd)(layer_ks, ks, lengths)
        layer_vs = jax.vmap(_upd)(layer_vs, vs, lengths)
    layer_k = jax.vmap(_upd)(layer_k, new_k, lengths)
    layer_v = jax.vmap(_upd)(layer_v, new_v, lengths)
    if quant:
        return layer_k, layer_v, layer_ks, layer_vs
    return layer_k, layer_v


# ---------------------------------------------------------------------------
# Paged (block-table) cache — the serving layout
# ---------------------------------------------------------------------------
#
# The dense cache above allocates B * S_max rows up front; a batch of mixed-
# length requests pays worst-case HBM for every row. The paged cache is the
# TPU equivalent of the reference app's paged KV decode (SURVEY.md:40-41 —
# the CoreML/MLX decode loop): a single global pool of fixed-size pages
# shared by every sequence, with a per-row block table mapping virtual token
# positions to pool pages. Rows grow page-by-page; finished rows return
# their pages; HBM is bounded by tokens actually in flight, not by
# batch * max_len.
#
# Layout (per layer, scanned over L like the dense cache):
#   k_pages/v_pages: (L, P, page_size, H_kv, D)  — the pool
#   block_tables:    (B, pages_per_seq) int32    — pool page ids, -1 = unmapped
#   lengths:         (B,) int32                  — valid tokens per row
#
# Virtual position t of row b lives at pool page block_tables[b, t // page]
# slot t % page. Writes are scatters into the flattened (P*page, H, D) pool;
# positions whose table entry is -1 scatter out of bounds and are DROPPED
# (jax scatter mode='drop'), so unmapped pages are never touched.


class PagedKVCache(NamedTuple):
    k_pages: jnp.ndarray       # (L, P, page, H_kv, D)
    v_pages: jnp.ndarray       # (L, P, page, H_kv, D)
    block_tables: jnp.ndarray  # (B, pages_per_seq) int32, -1 = unmapped
    lengths: jnp.ndarray       # (B,) int32

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[1]

    @property
    def max_len(self) -> int:
        """Virtual per-sequence capacity (pages_per_seq * page_size)."""
        return self.block_tables.shape[1] * self.k_pages.shape[2]

    @property
    def num_layers(self) -> int:
        return self.k_pages.shape[0]


def init_paged_cache(num_layers, batch, num_pages, page_size, pages_per_seq,
                     num_kv_heads, head_dim, dtype=jnp.bfloat16):
    """Pool of ``num_pages`` pages; every row starts with an empty table."""
    shape = (num_layers, num_pages, page_size, num_kv_heads, head_dim)
    return PagedKVCache(
        k_pages=jnp.zeros(shape, dtype),
        v_pages=jnp.zeros(shape, dtype),
        block_tables=jnp.full((batch, pages_per_seq), -1, jnp.int32),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


def _flat_dest(block_tables, positions, page_size):
    """Virtual positions (B, T) -> flat pool indices (B, T) into (P*page).

    Unmapped pages (table entry -1) map to a far out-of-bounds index
    (positive — negative indices would wrap), which the scatter drops.
    Positions past the table's virtual capacity are dropped the same way
    (take_along_axis would otherwise CLAMP the slot index to the last
    column — a finished row at full length could alias its last page)."""
    slots = positions // page_size
    page_ids = jnp.take_along_axis(
        block_tables, jnp.minimum(slots, block_tables.shape[1] - 1), axis=1)
    dest = page_ids * page_size + positions % page_size
    oob = (page_ids < 0) | (slots >= block_tables.shape[1])
    return jnp.where(oob, jnp.int32(2 ** 30), dest)


def write_prompt_paged(layer_k, layer_v, new_k, new_v, block_tables, offset=0):
    """Prefill write: (B, T, H, D) keys/values to virtual rows
    [offset, offset+T) of each sequence.

    layer_k/v: (P, page, H, D) pool slices for one layer."""
    b, t, h, d = new_k.shape
    page = layer_k.shape[1]
    pos = offset + jnp.arange(t, dtype=jnp.int32)[None, :].repeat(b, 0)
    dest = _flat_dest(block_tables, pos, page).reshape(-1)  # (B*T,)
    flat_shape = (layer_k.shape[0] * page, h, d)
    layer_k = layer_k.reshape(flat_shape).at[dest].set(
        new_k.astype(layer_k.dtype).reshape(-1, h, d), mode="drop")
    layer_v = layer_v.reshape(flat_shape).at[dest].set(
        new_v.astype(layer_v.dtype).reshape(-1, h, d), mode="drop")
    return (layer_k.reshape(-1, page, h, d),
            layer_v.reshape(-1, page, h, d))


def write_token_paged(layer_k, layer_v, new_k, new_v, block_tables, lengths):
    """Decode write: row b's (1, H, D) key/value to virtual position
    lengths[b]. layer_k/v: (P, page, H, D); new_k/v: (B, 1, H, D)."""
    b, _, h, d = new_k.shape
    page = layer_k.shape[1]
    dest = _flat_dest(block_tables, lengths[:, None], page)[:, 0]  # (B,)
    flat_shape = (layer_k.shape[0] * page, h, d)
    layer_k = layer_k.reshape(flat_shape).at[dest].set(
        new_k.astype(layer_k.dtype)[:, 0], mode="drop")
    layer_v = layer_v.reshape(flat_shape).at[dest].set(
        new_v.astype(layer_v.dtype)[:, 0], mode="drop")
    return (layer_k.reshape(-1, page, h, d),
            layer_v.reshape(-1, page, h, d))


def write_tokens_paged_rows(layer_k, layer_v, new_k, new_v, block_tables,
                            row_offsets):
    """Scatter (B, T, H, D) keys/values to per-row virtual positions
    [row_offsets[b], row_offsets[b] + T) — the chunk-view write-back
    (each row's chunk starts at its own length, unlike write_prompt_paged's
    shared scalar offset). layer_k/v: (P, page, H, D) pool slices."""
    b, t, h, d = new_k.shape
    page = layer_k.shape[1]
    pos = row_offsets[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    dest = _flat_dest(block_tables, pos, page).reshape(-1)  # (B*T,)
    flat_shape = (layer_k.shape[0] * page, h, d)
    layer_k = layer_k.reshape(flat_shape).at[dest].set(
        new_k.astype(layer_k.dtype).reshape(-1, h, d), mode="drop")
    layer_v = layer_v.reshape(flat_shape).at[dest].set(
        new_v.astype(layer_v.dtype).reshape(-1, h, d), mode="drop")
    return (layer_k.reshape(-1, page, h, d),
            layer_v.reshape(-1, page, h, d))


def pool_ownership(block_tables, num_pages, page_size):
    """Invert the block tables: per-page (owner row, base virtual position).

    Returns (owner (P,) int32 — batch row owning each pool page, -1 if
    unmapped; base (P,) int32 — virtual position of the page's slot 0 in its
    owner's sequence). This is the whole working state the in-place pool
    attention (models/qwen2._attend_pool) needs to attend the pool WITHOUT
    gathering a dense per-row view: token validity for row b is
    ``owner[p] == b and base[p] + slot <= lengths[b]``.

    Block tables are invariant within a decode chunk (serve/batcher.py maps
    the chunk's pages up front), so callers compute this once per chunk
    inside the jitted chunk fn — a (B * pages_per_seq)-element scatter,
    nothing per token."""
    b, n = block_tables.shape
    pages = block_tables.reshape(-1)
    rows = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    base = jnp.tile(jnp.arange(n, dtype=jnp.int32) * page_size, b)
    idx = jnp.where(pages < 0, jnp.int32(2 ** 30), pages)  # drop unmapped
    owner = jnp.full((num_pages,), -1, jnp.int32).at[idx].set(
        rows, mode="drop")
    basep = jnp.zeros((num_pages,), jnp.int32).at[idx].set(base, mode="drop")
    return owner, basep


def gather_pages(layer_pages, block_tables):
    """Dense (B, pages_per_seq * page, H, D) view of one layer's pool —
    the XLA-attention fallback (the Pallas kernel in
    ops/pallas/paged_attention.py reads pages in place instead).

    Unmapped entries (-1) clamp to page 0; callers mask by length."""
    b, n = block_tables.shape
    tables = jnp.maximum(block_tables, 0)
    gathered = jnp.take(layer_pages, tables.reshape(-1), axis=0)
    _, page, h, d = layer_pages.shape
    return gathered.reshape(b, n * page, h, d)


def gather_pool_view(cache: "PagedKVCache", s_bucket: int):
    """Dense (L, B, s_bucket, H, D) k/v views of each row's first
    ``s_bucket`` virtual positions — the chunk-view decode's working set
    (models/vlm.py:decode_chunk_paged). One gather per CHUNK instead of
    per token: the per-token gather tax (docs/PERF.md, 2.4x at 4096 ctx)
    amortizes to ~2 extra KV passes per k-token chunk.

    ``s_bucket`` must be a multiple of page_size."""
    page = cache.page_size
    tables = cache.block_tables[:, : s_bucket // page]
    k = jax.vmap(lambda p: gather_pages(p, tables))(cache.k_pages)
    v = jax.vmap(lambda p: gather_pages(p, tables))(cache.v_pages)
    return k, v
