"""FastVLM — the fused vision-encode → prefill → decode pipeline.

This is the TPU-native replacement for the reference's LlavaMetaForCausalLM +
HF generate stack (llava/model/llava_arch.py:132-332 splice loop;
llava/model/language_model/llava_qwen.py:30-160 forward/generate): one jitted
prefill that runs the vision tower, projector, embedding overlay, and the full
decoder prompt pass in a single XLA program (TTFT = this one call), and one
jitted whole-generation function whose decode loop is a ``lax.while_loop`` on
device — no per-token host round-trips (the axon/PCIe dispatch latency would
otherwise dominate decode).

Static-shape policy: prompts are right-padded to a bucket length; the image
sentinel is pre-expanded host-side to ``num_image_tokens`` placeholder slots
(ops/splice.py); the KV cache is allocated at prompt_bucket + max_new_tokens.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from fastvlm_tpu.config import FastVLMConfig, resolve_dtype
from fastvlm_tpu.models import fastvit, projector, qwen2
from fastvlm_tpu.ops.kv_cache import KVCache, init_cache
from fastvlm_tpu.ops.sampling import SamplingParams, sample, sample_rows
from fastvlm_tpu.ops.splice import overlay_image_embeds

Params = Dict[str, Any]


def init(key, cfg: FastVLMConfig) -> Params:
    from fastvlm_tpu.models import clip_vit

    kv, kp, kd, kn = jax.random.split(key, 4)
    if isinstance(cfg.vision, clip_vit.CLIPViTConfig):
        vision = clip_vit.init(kv, cfg.vision)
    else:
        vision = fastvit.init(kv, cfg.vision)
    params = {
        "vision": vision,
        "projector": projector.init(kp, cfg.projector),
        "decoder": qwen2.init(kd, cfg.decoder),
    }
    if "unpad" in cfg.mm_patch_merge_type:
        # row separator embedding (reference llava_arch.py:39-47)
        d = cfg.decoder.hidden_size
        params["image_newline"] = (
            jax.random.normal(kn, (d,)) / (d ** 0.5)
        ).astype(resolve_dtype(cfg.decoder.param_dtype))
    return params


def _tower_features(params: Params, cfg: FastVLMConfig, images: jnp.ndarray):
    """Dispatch on the vision config type: FastViTHD or CLIP ViT (+S2)
    (reference build_vision_tower, multimodal_encoder/builder.py:6-19)."""
    from fastvlm_tpu.models import clip_vit

    if isinstance(cfg.vision, clip_vit.CLIPViTConfig):
        if cfg.vision.s2_scales:
            return clip_vit.features_s2(params["vision"], images, cfg.vision)
        return clip_vit.features(params["vision"], images, cfg.vision)
    return fastvit.apply(params["vision"], images, cfg.vision)


def encode_images(params: Params, cfg: FastVLMConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images (B, H, W, 3) -> projected vision embeddings (B, N, hidden).

    Tower forward + feature_select + mm_projector in one fused graph
    (reference llava_arch.py:141-144 ``encode_images``)."""
    feats = _tower_features(params, cfg, images)
    return projector.apply(params["projector"], feats, cfg.projector)


def encode_tile_grids(
    params: Params,
    cfg: FastVLMConfig,
    tiles: jnp.ndarray,                  # (T, S, S, 3) global view + grid tiles
) -> jnp.ndarray:
    """Tower + projector over the [global + tiles] stack -> (T, h, w, hidden)
    feature grids. This is the HEAVY jit unit of the anyres path: its only
    shape key is the tile count T, so every image whose anyres grid has the
    same number of tiles reuses one tower compile regardless of pixel size."""
    grids = fastvit.features_grid(params["vision"], tiles, cfg.vision)
    return projector.apply(params["projector"], grids, cfg.projector)


def merge_tile_grids(
    params: Params,
    cfg: FastVLMConfig,
    grids: jnp.ndarray,                  # (T, h, w, hidden) from encode_tile_grids
    grid_shape: Tuple[int, int],         # (grid_w, grid_h) in tiles
    crop_box: Optional[Tuple[int, int, int, int]] = None,
) -> jnp.ndarray:
    """Merge tile features per cfg.mm_patch_merge_type (reference
    llava_arch.py:154-208) -> (1, N, hidden). A LIGHT jit unit (slice +
    concat): keyed on (grid_shape, crop_box), both host-known; compiles in
    milliseconds, so per-aspect-ratio variation is cheap."""
    from fastvlm_tpu.ops import anyres

    merge = cfg.mm_patch_merge_type
    if merge == "flat":
        feats = anyres.merge_flat(grids)
    else:
        unpad = "unpad" in merge
        feats = anyres.merge_spatial(
            grids, grid_shape,
            # newline separators only exist for unpad merges
            # (reference llava_arch.py:37-47 + merge branch)
            image_newline=params.get("image_newline") if unpad else None,
            crop_box=crop_box if unpad else None,
            unpad=unpad,
        )
    return feats[None]


def anyres_crop_box(cfg: FastVLMConfig, grid_shape: Tuple[int, int],
                    original_size: Optional[Tuple[int, int]]):
    """Unpad crop box for a merged anyres feature grid (shared by
    encode_tiles and Engine._encode_tiles_jit — one definition so the fast
    path can't drift from the convenience path). None when the merge type
    doesn't unpad or the original size is unknown."""
    from fastvlm_tpu.ops import anyres

    if "unpad" not in cfg.mm_patch_merge_type or original_size is None:
        return None
    h = w = cfg.vision.grid_size
    gw, gh = grid_shape
    return anyres.unpad_hw((gh * h, gw * w), original_size)


def encode_tiles(
    params: Params,
    cfg: FastVLMConfig,
    tiles: jnp.ndarray,                  # (T, S, S, 3) global view + grid tiles
    grid_shape: Tuple[int, int],         # (grid_w, grid_h) in tiles
    original_size: Optional[Tuple[int, int]] = None,  # (width, height)
) -> jnp.ndarray:
    """AnyRes encode: tower + projector per tile, then merge per
    cfg.mm_patch_merge_type. Convenience composition of encode_tile_grids +
    merge_tile_grids; the Engine jits the two halves separately so the tower
    compile is NOT keyed on the exact image size (VERDICT r1 #4)."""
    grids = encode_tile_grids(params, cfg, tiles)
    crop_box = anyres_crop_box(cfg, grid_shape, original_size)
    return merge_tile_grids(params, cfg, grids, grid_shape, crop_box)


def _spliced_prompt_embeds(params, cfg, images, ids, image_starts,
                           vision_embeds=None):
    """images: (B, H, W, 3) single image per row, or (B, M, H, W, 3)
    multi-image rows (image_starts then (B, M), -1 for absent slots —
    the reference's list/5-D batch path, llava_arch.py:154-165)."""
    from fastvlm_tpu.ops.splice import overlay_image_embeds_multi

    text = qwen2.embed(params["decoder"], ids)
    cd = resolve_dtype(cfg.decoder.compute_dtype)
    text = text.astype(cd)
    if vision_embeds is not None:
        if vision_embeds.ndim == 4:
            return overlay_image_embeds_multi(
                text, vision_embeds.astype(cd), image_starts)
        return overlay_image_embeds(text, vision_embeds.astype(cd),
                                    image_starts)
    if images is not None:
        if images.ndim == 5:
            b, m = images.shape[:2]
            vis = encode_images(
                params, cfg, images.reshape((b * m,) + images.shape[2:]))
            vis = vis.reshape(b, m, vis.shape[1], vis.shape[2]).astype(cd)
            return overlay_image_embeds_multi(text, vis, image_starts)
        vis = encode_images(params, cfg, images).astype(cd)
        text = overlay_image_embeds(text, vis, image_starts)
    return text


def prefill(
    params: Params,
    cfg: FastVLMConfig,
    images: Optional[jnp.ndarray],  # (B, H, W, 3) or None (text-only)
    ids: jnp.ndarray,               # (B, T) sentinel-expanded, right-padded
    seq_lens: jnp.ndarray,          # (B,)
    image_starts: jnp.ndarray,      # (B,) -1 for text-only rows
    cache: KVCache,
    vision_embeds: Optional[jnp.ndarray] = None,  # (B, N, D) precomputed
) -> Tuple[jnp.ndarray, KVCache]:
    """Fused encode+prefill. Returns (next-token logits (B, V), cache).

    ``vision_embeds`` bypasses the tower (anyres merges, KV-reuse paths)."""
    embeds = _spliced_prompt_embeds(params, cfg, images, ids, image_starts,
                                    vision_embeds)
    b, t, _ = embeds.shape
    positions = jnp.arange(t, dtype=jnp.int32)[None, :].repeat(b, 0)
    # (B, T, T) mask: the cache is empty, so prefill attends the fresh
    # prompt keys directly (qwen2._layer fresh-token path) instead of the
    # S_max-wide cache — prefill attention cost scales with T, not T+max_new
    mask = qwen2.prefill_mask(seq_lens, t, t,
                              window=cfg.decoder.attn_window)
    hidden, cache = qwen2.forward(
        params["decoder"], cfg.decoder, embeds, positions,
        cache=cache, mask=mask, prefill=True,
    )
    cache = cache._replace(lengths=seq_lens)  # padded rows: real lengths
    # logits at each row's last real token
    last = jnp.clip(seq_lens - 1, 0, t - 1)
    last_hidden = jnp.take_along_axis(hidden, last[:, None, None], axis=1)
    logits = qwen2.logits_from_hidden(params["decoder"], last_hidden, cfg.decoder)
    return logits[:, 0], cache


def prefill_continue(
    params: Params,
    cfg: FastVLMConfig,
    images: Optional[jnp.ndarray],
    suffix_ids: jnp.ndarray,     # (B, T') sentinel-expanded suffix tokens
    suffix_lens: jnp.ndarray,    # (B,) real suffix lengths (<= T')
    image_starts: jnp.ndarray,   # (B,) start WITHIN the suffix; -1 if none
    offset: int,                 # static: tokens already cached (the prefix)
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """Continue a prefill after ``offset`` cached prefix tokens.

    The video-QA path (reference app camera loop, ContentView.swift:362-414):
    the system/user prompt prefix before the image span is prefilled once;
    each new frame only encodes the image and runs this suffix prefill +
    decode. Returns (next-token logits, cache)."""
    embeds = _spliced_prompt_embeds(params, cfg, images, suffix_ids,
                                    image_starts)
    b, t, _ = embeds.shape
    positions = offset + jnp.arange(t, dtype=jnp.int32)[None, :].repeat(b, 0)
    # queries at offset+i attend to all keys k <= offset+i (prefix is valid)
    q_pos = offset + jnp.arange(t)[:, None]
    k_pos = jnp.arange(cache.max_len)[None, :]
    mask = (k_pos <= q_pos)[None]
    if cfg.decoder.attn_window is not None:
        mask = mask & (q_pos - k_pos < cfg.decoder.attn_window)[None]
    mask = jnp.broadcast_to(mask, (b, t, cache.max_len))
    hidden, cache = qwen2.forward(
        params["decoder"], cfg.decoder, embeds, positions,
        cache=cache, mask=mask, prefill=True, prefill_offset=offset,
    )
    total = offset + suffix_lens
    cache = cache._replace(lengths=total)
    last = jnp.clip(suffix_lens - 1, 0, t - 1)
    last_hidden = jnp.take_along_axis(hidden, last[:, None, None], axis=1)
    logits = qwen2.logits_from_hidden(params["decoder"], last_hidden, cfg.decoder)
    return logits[:, 0], cache


def decode_step(
    params: Params,
    cfg: FastVLMConfig,
    tokens: jnp.ndarray,  # (B,) last sampled token ids
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step: embed token, attend over cache, return (logits, cache)."""
    embeds = qwen2.embed(params["decoder"], tokens[:, None]).astype(
        resolve_dtype(cfg.decoder.compute_dtype)
    )
    positions = cache.lengths[:, None]
    mask = qwen2.decode_mask(cache.lengths, cache.max_len,
                             window=cfg.decoder.attn_window)
    hidden, cache = qwen2.forward(
        params["decoder"], cfg.decoder, embeds, positions,
        cache=cache, mask=mask, prefill=False,
    )
    logits = qwen2.logits_from_hidden(params["decoder"], hidden, cfg.decoder)
    return logits[:, 0], cache


@functools.partial(jax.jit, static_argnames=("cfg", "k", "eos_ids", "sampling"),
                   donate_argnums=(4,))  # donate the cache: in-place updates
def decode_chunk(
    params: Params,
    cfg: FastVLMConfig,
    last_tok: jnp.ndarray,   # (B,)
    done: jnp.ndarray,       # (B,) bool
    cache: KVCache,
    key: jax.Array,
    *,
    k: int = 8,
    eos_ids: Tuple[int, ...] = (151645,),
    sampling: SamplingParams = SamplingParams(),
    row_sampling=None,
):
    """Decode k tokens in one device call (lax.scan) — the streaming unit.

    Host-side streaming (serve/worker, CLI chat) calls this repeatedly: one
    dispatch per k tokens keeps per-token host overhead at 1/k while still
    yielding text incrementally (the reference streams per-token through HF
    TextIteratorStreamer on a thread, model_worker.py:176-193).

    ``row_sampling`` (ops.sampling.RowSampling, (B,) arrays) is the traced
    per-row alternative to the static ``sampling`` — one compiled program
    serves any mix of greedy/sampled rows (continuous-batching serving).

    Returns (tokens (B, k), done (B,), last_tok (B,), cache, key).
    """
    return _chunk_scan(params, cfg, last_tok, done, cache, key, k, eos_ids,
                       sampling, row_sampling)


def _chunk_scan(params, cfg, last_tok, done, cache, key, k, eos_ids, sampling,
                row_sampling=None):
    eos = jnp.asarray(eos_ids, jnp.int32)

    def body(carry, _):
        tok, done, cache, key = carry
        logits, cache = decode_step(params, cfg, tok, cache)
        key, sub = jax.random.split(key)
        if row_sampling is not None:
            new = sample_rows(sub, logits, row_sampling)
        else:
            new = sample(sub, logits, sampling)
        new = jnp.where(done, 0, new)
        done = done | jnp.isin(new, eos)
        return (new, done, cache, key), new

    (tok, done, cache, key), toks = lax.scan(
        body, (last_tok, done, cache, key), None, length=k)
    return toks.T, done, tok, cache, key


@functools.partial(jax.jit, static_argnames=("cfg", "k", "eos_ids", "sampling",
                                             "s_bucket"),
                   donate_argnums=(4,))  # donate the pool: in-place updates
def decode_chunk_paged(
    params: Params,
    cfg: FastVLMConfig,
    last_tok: jnp.ndarray,   # (B,)
    done: jnp.ndarray,       # (B,) bool
    cache,                   # PagedKVCache
    key: jax.Array,
    *,
    k: int = 8,
    s_bucket: int = 512,
    eos_ids: Tuple[int, ...] = (151645,),
    sampling: SamplingParams = SamplingParams(),
    row_sampling=None,
):
    """Chunk-view paged decode — the gather-free serving decode (VERDICT r2 #1).

    The per-token paged path gathers a dense (B, S, H, D) view of the pool
    PER LAYER PER TOKEN (~3x KV traffic; paged-xla paid up to 2.4x vs dense
    at 4096 ctx, docs/PERF.md). But block tables only change at chunk
    boundaries (serve/batcher.py:_grow_pages maps the next k tokens' pages
    before each chunk), so the mapping is invariant within a chunk:

      1. gather each layer's pool pages ONCE into a dense view bucketed to
         ``s_bucket`` (>= max active row length + k, multiple of page_size);
      2. run the chunk's k decode steps on the view at dense-cache speed;
      3. scatter each row's k new KV columns back to its mapped pool pages.

    Extra traffic per chunk = one pool read + one view write (+ a k-column
    scatter) — amortized over k tokens instead of paid per token. The view
    is transient (lives for one chunk call); peak HBM = pool + L*B*s_bucket
    rows. Rows whose pages were released (finished/truncated; table = -1)
    scatter into the drop sink exactly like write_token_paged.

    Returns (tokens (B, k), done (B,), last_tok (B,), PagedKVCache, key).
    """
    from fastvlm_tpu.ops.kv_cache import (
        gather_pool_view,
        write_tokens_paged_rows,
    )

    start_lens = cache.lengths
    view_k, view_v = gather_pool_view(cache, s_bucket)
    dense = KVCache(k=view_k, v=view_v, lengths=start_lens)
    toks, done, tok, dense, key = _chunk_scan(
        params, cfg, last_tok, done, dense, key, k, eos_ids, sampling,
        row_sampling)

    def writeback(carry, layer_in):
        kp, vp, vk, vv = layer_in
        ext = jax.vmap(
            lambda row_k, row_v, st: (
                lax.dynamic_slice_in_dim(row_k, st, k, axis=0),
                lax.dynamic_slice_in_dim(row_v, st, k, axis=0)))(
                    vk, vv, jnp.clip(start_lens, 0, s_bucket - k))
        kp, vp = write_tokens_paged_rows(kp, vp, ext[0], ext[1],
                                         cache.block_tables, start_lens)
        return carry, (kp, vp)

    _, (new_kp, new_vp) = lax.scan(
        writeback, None, (cache.k_pages, cache.v_pages, dense.k, dense.v))
    new_cache = cache._replace(k_pages=new_kp, v_pages=new_vp,
                               lengths=dense.lengths)
    return toks, done, tok, new_cache, key


@functools.partial(jax.jit, static_argnames=("s_bucket",))
def gather_view(cache, s_bucket: int):
    """Materialize the dense working view of a paged pool as a KVCache —
    the persistent-view decode's (re)gather step. Called ONCE per block-
    table change (admission/release/page growth), not per chunk: in steady
    state decode_chunk_view runs at dense-cache speed with zero gather."""
    from fastvlm_tpu.ops.kv_cache import gather_pool_view

    k, v = gather_pool_view(cache, s_bucket)
    return KVCache(k=k, v=v, lengths=cache.lengths)


@functools.partial(jax.jit, static_argnames=("w",), donate_argnums=(1,))
def sync_pool_from_view(view: KVCache, pool, synced_lens: jnp.ndarray,
                        w: int):
    """Scatter the view's columns [synced_lens[b], synced_lens[b] + w) back
    into the pool — the deferred pool sync of the persistent-view decode.

    Steady-state chunks decode on the dense view ONLY (vlm.decode_chunk —
    zero paged overhead); the pool is brought up to date lazily, right
    before an event that reads it (re-gather after a block-table change,
    prefix-cache registration). ``w`` is a static width ≥ the true number
    of new columns: writing past a row's real length is SAFE because (a)
    slots beyond the row's mapped pages scatter out of bounds and are
    dropped, and (b) mapped-but-future slots are overwritten by real
    writes before any reader unmasks them (all pool reads mask k > length).

    Returns the updated pool (lengths synced to the view's)."""
    from fastvlm_tpu.ops.kv_cache import write_tokens_paged_rows

    s_max = view.max_len
    start = jnp.clip(synced_lens, 0, s_max - w)

    def writeback(carry, layer_in):
        kp, vp, vk, vv = layer_in
        ext = jax.vmap(
            lambda row_k, row_v, st: (
                lax.dynamic_slice_in_dim(row_k, st, w, axis=0),
                lax.dynamic_slice_in_dim(row_v, st, w, axis=0)))(
                    vk, vv, start)
        kp, vp = write_tokens_paged_rows(kp, vp, ext[0], ext[1],
                                         pool.block_tables, start)
        return carry, (kp, vp)

    _, (new_kp, new_vp) = lax.scan(
        writeback, None, (pool.k_pages, pool.v_pages, view.k, view.v))
    return pool._replace(k_pages=new_kp, v_pages=new_vp,
                         lengths=view.lengths)


@functools.partial(jax.jit, donate_argnums=(0,))
def update_view_row(view: KVCache, pool, row: jnp.ndarray) -> KVCache:
    """Refresh ONE row of a persistent dense view from the pool.

    A block-table rebind (a freed slot re-admitted with a new request's
    pages) invalidates exactly that row of the view — every other row's
    dense columns are still authoritative (the view is always AHEAD of the
    pool between syncs; decode appends to the view and the pool catches up
    lazily). Re-gathering the whole pool on every admission, as the
    round-4 serving loop did, therefore moves B× more KV bytes than the
    boundary requires; at b8/4096ctx the full regather made the measured
    admission-boundary pattern 0.86× of dense (docs/PERF.md). This gathers
    the single rebound row's pages and splices them into the view in
    place (donated), so admission boundaries cost 1/B of a regather.

    ``row`` is traced: one compiled program per (batch, view-bucket), the
    same key grid as gather_view — warmup-enumerable."""
    from fastvlm_tpu.ops.kv_cache import gather_pages

    npages = view.max_len // pool.page_size
    tbl = lax.dynamic_slice_in_dim(pool.block_tables, row, 1,
                                   axis=0)[:, :npages]          # (1, npages)
    rk = jax.vmap(lambda p: gather_pages(p, tbl))(pool.k_pages)
    rv = jax.vmap(lambda p: gather_pages(p, tbl))(pool.v_pages)
    zero = jnp.zeros((), jnp.int32)
    k = lax.dynamic_update_slice(view.k, rk, (zero, row, zero, zero, zero))
    v = lax.dynamic_update_slice(view.v, rv, (zero, row, zero, zero, zero))
    row_len = lax.dynamic_slice_in_dim(pool.lengths, row, 1)
    lengths = lax.dynamic_update_slice(view.lengths, row_len, (row,))
    return KVCache(k=k, v=v, lengths=lengths)


@functools.partial(jax.jit, static_argnames=("cfg", "k", "eos_ids", "sampling"),
                   donate_argnums=(4, 5))  # donate view + pool
def decode_chunk_view(
    params: Params,
    cfg: FastVLMConfig,
    last_tok: jnp.ndarray,   # (B,)
    done: jnp.ndarray,       # (B,) bool
    view: KVCache,           # persistent dense view (gather_view)
    pool,                    # PagedKVCache (stays authoritative)
    key: jax.Array,
    *,
    k: int = 8,
    eos_ids: Tuple[int, ...] = (151645,),
    sampling: SamplingParams = SamplingParams(),
    row_sampling=None,
):
    """Persistent-view paged decode — steady-state at dense speed.

    decode_chunk_paged re-gathers the pool into a dense view EVERY chunk
    (~2 extra KV passes per k tokens = the 0.85x-of-dense tax measured in
    docs/PERF.md). But the view only becomes stale when block tables
    change, and the batcher changes tables exclusively at chunk boundaries
    (admission / release / page growth). So the serving loop can carry the
    dense view ACROSS chunks: re-gather via gather_view only on a table
    change, and per chunk pay only a k-column scatter-back that keeps the
    pool authoritative (admission prefill and prefix caching read pool
    pages). Steady-state traffic = dense decode + one k-token scatter.

    Returns (tokens (B, k), done, last_tok, view, pool, key).
    """
    from fastvlm_tpu.ops.kv_cache import write_tokens_paged_rows

    start_lens = view.lengths
    s_bucket = view.max_len
    toks, done, tok, view, key = _chunk_scan(
        params, cfg, last_tok, done, view, key, k, eos_ids, sampling,
        row_sampling)

    def writeback(carry, layer_in):
        kp, vp, vk, vv = layer_in
        ext = jax.vmap(
            lambda row_k, row_v, st: (
                lax.dynamic_slice_in_dim(row_k, st, k, axis=0),
                lax.dynamic_slice_in_dim(row_v, st, k, axis=0)))(
                    vk, vv, jnp.clip(start_lens, 0, s_bucket - k))
        kp, vp = write_tokens_paged_rows(kp, vp, ext[0], ext[1],
                                         pool.block_tables, start_lens)
        return carry, (kp, vp)

    _, (new_kp, new_vp) = lax.scan(
        writeback, None, (pool.k_pages, pool.v_pages, view.k, view.v))
    new_pool = pool._replace(k_pages=new_kp, v_pages=new_vp,
                             lengths=view.lengths)
    return toks, done, tok, view, new_pool, key


@functools.partial(jax.jit, static_argnames=("cfg", "k", "eos_ids", "sampling",
                                             "p_bucket"),
                   donate_argnums=(4,))  # donate the pool: in-place updates
def decode_chunk_pool(
    params: Params,
    cfg: FastVLMConfig,
    last_tok: jnp.ndarray,   # (B,)
    done: jnp.ndarray,       # (B,) bool
    cache,                   # PagedKVCache
    key: jax.Array,
    *,
    k: int = 8,
    eos_ids: Tuple[int, ...] = (151645,),
    sampling: SamplingParams = SamplingParams(),
    row_sampling=None,
    p_bucket: Optional[int] = None,
):
    """In-place pool paged decode — no gather, no dense view, no write-back.

    The third paged-decode formulation (after per-token gather and the
    chunk-view's gather-once-per-chunk): each step attends the WHOLE page
    pool with a per-token ownership mask (qwen2._attend_pool), so the only
    KV traffic is one pool read per step — the same bytes dense decode
    reads, with zero gather/scatter overhead, and it scales with tokens
    actually in flight rather than B × s_bucket. The extra cross-row logit
    FLOPs ride the MXU for free (decode attention is bandwidth-bound).

    Unlike decode_chunk_paged there is no s_bucket: traffic is set by POOL
    size, or — when ``p_bucket`` is given — by the first p_bucket pages
    only (the batcher's page-watermark bucket; requires every mapped page
    id < p_bucket, which a lowest-first allocator guarantees). Attention
    reads pool[:p_bucket] as a fused slice; writes still target the full
    pool, so there is no write-back pass. Returns (tokens (B, k), done,
    last_tok, cache, key) — same contract as decode_chunk_paged.
    """
    eos = jnp.asarray(eos_ids, jnp.int32)
    dtype = resolve_dtype(cfg.decoder.compute_dtype)
    trivial_mask = jnp.ones((last_tok.shape[0], 1, 1), bool)  # attn is set
    # directly by the pool route; pos_terms only needs a shape (rope-only)

    def body(carry, _):
        tok, done, cache, key = carry
        embeds = qwen2.embed(params["decoder"], tok[:, None]).astype(dtype)
        hidden, cache = qwen2.forward(
            params["decoder"], cfg.decoder, embeds, cache.lengths[:, None],
            cache=cache, mask=trivial_mask, prefill=False, pool_inplace=True,
            pool_bucket=p_bucket)
        logits = qwen2.logits_from_hidden(params["decoder"], hidden,
                                          cfg.decoder)[:, 0]
        key, sub = jax.random.split(key)
        if row_sampling is not None:
            new = sample_rows(sub, logits, row_sampling)
        else:
            new = sample(sub, logits, sampling)
        new = jnp.where(done, 0, new)
        done = done | jnp.isin(new, eos)
        return (new, done, cache, key), new

    (tok, done, cache, key), toks = lax.scan(
        body, (last_tok, done, cache, key), None, length=k)
    return toks.T, done, tok, cache, key


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray        # (B, max_new_tokens) int32, pad after EOS
    num_generated: jnp.ndarray  # (B,) int32 (including the EOS token)


_prefill_jit = jax.jit(prefill, static_argnames=("cfg",))
# shared across Engine instances (cfg is static): equal-config engines hit
# one compile cache instead of recompiling per-engine closures
_prefill_continue_jit = jax.jit(prefill_continue, static_argnames=("cfg",))


def spec_cache_len(prompt_bucket: int, max_new_tokens: int,
                   draft_k: int) -> int:
    """KV length a speculative-decode cache must be allocated with: a verify
    pass writes draft_k+1 slots past the committed length before acceptance
    truncates, so the cache needs that much slack past prompt+generation."""
    return prompt_bucket + max_new_tokens + draft_k + 1


def _spec_verify_pass(params, cfg, last_tok, done, num, cache, hist, hist_len,
                      *, k, ngram_n, eos, max_new_tokens, cd):
    """One speculative verify pass: draft k tokens from the history, run the
    decoder over [last_tok, draft] in one step, accept the longest matching
    prefix + the bonus token (EOS/budget-truncated). Shared by the
    whole-generation loop (_spec_loop) and the streaming chunk
    (spec_stream_chunk).

    Returns (g (B, k+1) verified tokens, count (B,) committed, done',
    last_tok', cache', hist', hist_len').
    """
    from fastvlm_tpu.ops.speculative import (
        accept_counts,
        ngram_draft,
        spec_mask,
    )

    active = ~done
    draft = ngram_draft(hist, hist_len, k, n=ngram_n)
    seq = jnp.concatenate([last_tok[:, None], draft], axis=1)  # (B, k+1)
    embeds = qwen2.embed(params["decoder"], seq).astype(cd)
    lengths = cache.lengths
    positions = lengths[:, None] + jnp.arange(k + 1, dtype=jnp.int32)[None]
    mask = spec_mask(lengths, k + 1, cache.max_len,
                     window=cfg.decoder.attn_window)
    hidden, cache = qwen2.forward(
        params["decoder"], cfg.decoder, embeds, positions,
        cache=cache, mask=mask, prefill=False,
    )
    logits = qwen2.logits_from_hidden(params["decoder"], hidden, cfg.decoder)
    g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k+1)

    a = accept_counts(draft, g[:, :k])          # accepted draft prefix
    count = a + 1                               # + the bonus token
    # truncate at the first EOS within the committed span
    j = jnp.arange(k + 1)[None, :]
    is_eos = jnp.isin(g, eos) & (j < count[:, None])
    hit = jnp.any(is_eos, axis=-1)
    count = jnp.where(hit, jnp.argmax(is_eos, axis=-1) + 1, count)
    count = jnp.minimum(count, max_new_tokens - num)  # budget cap
    count = jnp.where(active, count, 0)
    done = done | hit | (num + count >= max_new_tokens)

    from fastvlm_tpu.ops.speculative import masked_window_write
    hist = jax.vmap(
        lambda row, v, s, c: masked_window_write(row, v, s, c, k + 1))(
            hist, g, hist_len, count)
    new_last = jnp.take_along_axis(
        g, jnp.clip(count - 1, 0, k)[:, None], axis=1)[:, 0]
    last_tok = jnp.where(count > 0, new_last, last_tok)
    cache = cache._replace(lengths=lengths + count)
    return g, count, done, last_tok, cache, hist, hist_len + count


def _spec_loop(
    params: Params,
    cfg: FastVLMConfig,
    tok0: jnp.ndarray,       # (B,) first generated token (greedy, from prefill)
    cache: KVCache,          # holds the prompt KV; lengths = prompt lengths
    corpus: jnp.ndarray,     # (B, T) draft-lookup token corpus (prompt ids —
                             # video seeds it with the previous frame's answer)
    corpus_lens: jnp.ndarray,  # (B,)
    max_new_tokens: int,
    eos_ids: Tuple[int, ...],
    draft_k: int,
    ngram_n: int,
):
    """Core speculative-greedy loop shared by spec_decode (serving/predict)
    and spec_decode_from_tok (video). Pure function — jitted by its callers.

    Produces the same tokens as greedy decode (modulo float associativity:
    the verify pass batches k+1 positions into one matmul, so exact argmax
    ties can in principle resolve differently — measured magnitudes in
    docs/PERF.md) in fewer device steps: each verify pass costs ~one decode
    step (b1 decode is weight-bandwidth-bound) but commits 1..draft_k+1
    tokens. The reference reaches the same technique through HF assisted
    decoding (``generate(prompt_lookup_num_tokens=...)``); here it is a
    static-shape ``lax.while_loop`` on device (ops/speculative.py).

    Returns ops.speculative.SpecResult.
    """
    from fastvlm_tpu.ops.speculative import SpecResult

    b, t = corpus.shape
    k = draft_k
    # the KV cache needs k+1 write slack past prompt+generation: callers
    # must allocate spec_cache_len(prompt_bucket, max_new, k) (the prompt
    # part is dynamic, so only the generation+slack term is checkable here)
    assert cache.max_len >= max_new_tokens + k + 1, \
        "spec cache lacks the draft_k+1 verify slack"
    # the history buffer needs the full corpus + generation + slack
    hist_w = t + max_new_tokens + k + 1
    eos = jnp.asarray(eos_ids, jnp.int32)
    cd = resolve_dtype(cfg.decoder.compute_dtype)

    tok0 = tok0.astype(jnp.int32)
    done0 = jnp.isin(tok0, eos) | (max_new_tokens <= 1)

    buf = max_new_tokens + k + 1
    out = jnp.zeros((b, buf), jnp.int32).at[:, 0].set(tok0)
    # token history = corpus + generated, for the n-gram draft lookup
    hist = jnp.zeros((b, hist_w), jnp.int32)
    hist = lax.dynamic_update_slice(hist, corpus, (0, 0))
    hist = jax.vmap(lambda h, v, s: lax.dynamic_update_slice(h, v, (s,)))(
        hist, tok0[:, None], corpus_lens)
    hist_len = corpus_lens + 1

    from fastvlm_tpu.ops.speculative import masked_window_write

    def masked_write(bufrow, vec, start, count):
        return masked_window_write(bufrow, vec, start, count, k + 1)

    def cond(state):
        return ~jnp.all(state[3])

    def body(state):
        step, out, num, done, last_tok, cache, hist, hist_len, dr, ac = state
        active = ~done
        g, count, done, last_tok, cache, hist, hist_len = _spec_verify_pass(
            params, cfg, last_tok, done, num, cache, hist, hist_len,
            k=k, ngram_n=ngram_n, eos=eos, max_new_tokens=max_new_tokens,
            cd=cd)
        out = jax.vmap(masked_write)(out, g, num, count)
        dr = dr + jnp.sum(jnp.where(active, k, 0))
        ac = ac + jnp.sum(jnp.where(active, count - 1, 0))
        return (step + 1, out, num + count, done, last_tok, cache,
                hist, hist_len, dr, ac)

    state = (jnp.int32(0), out, jnp.ones((b,), jnp.int32), done0, tok0,
             cache, hist, hist_len, jnp.int32(0), jnp.int32(0))
    steps, out, num, _, _, _, _, _, dr, ac = lax.while_loop(cond, body, state)

    out = jnp.where(jnp.arange(buf)[None, :] < num[:, None], out, 0)
    return SpecResult(tokens=out[:, :max_new_tokens],
                      num_generated=num.astype(jnp.int32),
                      steps=steps, drafted=dr, accepted=ac)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "eos_ids", "draft_k", "ngram_n"),
)
def spec_decode(
    params: Params,
    cfg: FastVLMConfig,
    logits: jnp.ndarray,     # (B, V) prefill logits
    cache: KVCache,          # max_len >= spec_cache_len(...)
    ids: jnp.ndarray,        # (B, T) prompt ids (the n-gram draft corpus)
    seq_lens: jnp.ndarray,   # (B,)
    *,
    max_new_tokens: int = 256,
    eos_ids: Tuple[int, ...] = (151645,),
    draft_k: int = 8,
    ngram_n: int = 3,
):
    """Greedy speculative decode after prefill (see _spec_loop)."""
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return _spec_loop(params, cfg, tok0, cache, ids, seq_lens,
                      max_new_tokens, eos_ids, draft_k, ngram_n)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "eos_ids", "draft_k", "ngram_n"),
)
def spec_decode_from_tok(
    params: Params,
    cfg: FastVLMConfig,
    tok0: jnp.ndarray,       # (B,) already-sampled first token (greedy)
    cache: KVCache,
    corpus: jnp.ndarray,     # (B, T) draft corpus — e.g. prompt + the
    corpus_lens: jnp.ndarray,  # previous video frame's answer (video.py)
    *,
    max_new_tokens: int = 256,
    eos_ids: Tuple[int, ...] = (151645,),
    draft_k: int = 8,
    ngram_n: int = 3,
):
    """Greedy speculative decode for callers that already fetched the first
    token (the video loop's TTFT sync happens before decode dispatch)."""
    return _spec_loop(params, cfg, tok0, cache, corpus, corpus_lens,
                      max_new_tokens, eos_ids, draft_k, ngram_n)


class SpecCarry(NamedTuple):
    """Resumable speculative-decode state threaded between streaming chunks
    (Engine.stream(spec=True) fetches tokens chunk-by-chunk)."""
    last_tok: jnp.ndarray   # (B,)
    done: jnp.ndarray       # (B,) bool
    num: jnp.ndarray        # (B,) tokens generated so far (incl. tok0)
    cache: KVCache
    hist: jnp.ndarray       # (B, W) corpus + generated tokens
    hist_len: jnp.ndarray   # (B,)


def spec_carry_init(
    cfg: FastVLMConfig,
    tok0: jnp.ndarray,
    cache: KVCache,
    corpus: jnp.ndarray,
    corpus_lens: jnp.ndarray,
    *,
    max_new_tokens: int,
    draft_k: int,
    eos_ids: Tuple[int, ...],
) -> SpecCarry:
    """Build the initial streaming carry after prefill (tok0 already
    sampled/fetched for TTFT). Host-side light ops only."""
    b, t = corpus.shape
    hist_w = t + max_new_tokens + draft_k + 1
    hist = jnp.zeros((b, hist_w), jnp.int32)
    hist = lax.dynamic_update_slice(hist, corpus, (0, 0))
    hist = jax.vmap(lambda h, v, s: lax.dynamic_update_slice(h, v, (s,)))(
        hist, tok0[:, None].astype(jnp.int32), corpus_lens)
    done = jnp.isin(tok0, jnp.asarray(eos_ids, jnp.int32)) \
        | (max_new_tokens <= 1)
    return SpecCarry(last_tok=tok0.astype(jnp.int32), done=done,
                     num=jnp.ones((b,), jnp.int32), cache=cache,
                     hist=hist, hist_len=corpus_lens + 1)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "m", "max_new_tokens", "eos_ids", "draft_k",
                     "ngram_n"),
)
def spec_stream_chunk(
    params: Params,
    cfg: FastVLMConfig,
    carry: SpecCarry,
    *,
    m: int = 4,              # verify passes per dispatch
    max_new_tokens: int = 256,
    eos_ids: Tuple[int, ...] = (151645,),
    draft_k: int = 8,
    ngram_n: int = 3,
):
    """Run up to ``m`` speculative verify passes in ONE device dispatch.

    The streaming analogue of decode_chunk: each dispatch commits between m
    and m*(draft_k+1) tokens (vs exactly k for decode_chunk), so the host
    fetch cadence stays chunky while decode runs 1.5-2x faster
    (docs/PERF.md). Returns (tokens (B, m*(k+1)) zero-padded, counts (B,),
    carry') — tokens/counts cover THIS chunk only.
    """
    k = draft_k
    eos = jnp.asarray(eos_ids, jnp.int32)
    cd = resolve_dtype(cfg.decoder.compute_dtype)
    b = carry.last_tok.shape[0]
    width = m * (k + 1)

    def body(state, _):
        carry, out, off = state
        g, count, done, last_tok, cache, hist, hist_len = _spec_verify_pass(
            params, cfg, carry.last_tok, carry.done, carry.num, carry.cache,
            carry.hist, carry.hist_len, k=k, ngram_n=ngram_n, eos=eos,
            max_new_tokens=max_new_tokens, cd=cd)

        from fastvlm_tpu.ops.speculative import masked_window_write
        out = jax.vmap(
            lambda row, v, s, c: masked_window_write(row, v, s, c, k + 1))(
                out, g, off, count)
        carry = SpecCarry(last_tok=last_tok, done=done,
                          num=carry.num + count, cache=cache,
                          hist=hist, hist_len=hist_len)
        return (carry, out, off + count), None

    out0 = jnp.zeros((b, width + k + 1), jnp.int32)  # +k+1 write slack
    (carry, out, counts), _ = lax.scan(
        body, (carry, out0, jnp.zeros((b,), jnp.int32)), None, length=m)
    return out[:, :width], counts, carry


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "m", "max_new_tokens", "eos_ids", "draft_k",
                     "ngram_n", "s_bucket"),
    donate_argnums=(2,))  # donate the carry: pool + hist update in place
def spec_chunk_paged(
    params: Params,
    cfg: FastVLMConfig,
    carry: "SpecCarry",      # carry.cache is a PagedKVCache here
    *,
    m: int = 2,              # verify passes per dispatch
    max_new_tokens: int = 4096,   # device budget (host caps govern per row)
    eos_ids: Tuple[int, ...] = (151645,),
    draft_k: int = 8,
    ngram_n: int = 3,
    s_bucket: int = 512,
):
    """Speculative verify passes over the paged pool via the chunk view —
    the continuous batcher's greedy fast path (decode_chunk_paged x
    spec_stream_chunk). The pool is gathered ONCE into a dense
    (L, B, s_bucket, H, D) view, m verify passes run on the view (each
    writes k+1 KV slots past the row's length; acceptance advances lengths
    by 1..k+1), and each row's m*(k+1)-column window from its start length
    scatters back to its mapped pages.

    Correctness under rejection/capacity (why garbage can't leak):
      * slots beyond a row's committed count hold rejected-draft KV — the
        next chunk's passes overwrite the same virtual positions, and
        attention masks key positions >= lengths, so they are never read;
      * a key position can only influence committed token t if it is
        strictly below t's position (causal mask), and all write-drop /
        clamp effects live at positions >= the row's live region, so every
        token the HOST keeps is exact-greedy (ops/speculative.py docstring).

    Caller contract: ``s_bucket >= max(live lengths) + m*(k+1) + k + 1``
    (the batcher buckets with that slack) so live rows' in-view writes never
    clamp; rows whose pages were released (block table -1) may clamp/slice
    garbage but scatter into the drop sink.

    Returns (tokens (B, m*(k+1)) zero-padded, counts (B,), carry') with
    carry'.cache the updated PagedKVCache.
    """
    from fastvlm_tpu.ops.kv_cache import (
        gather_pool_view,
        write_tokens_paged_rows,
    )
    from fastvlm_tpu.ops.speculative import masked_window_write

    k = draft_k
    eos = jnp.asarray(eos_ids, jnp.int32)
    cd = resolve_dtype(cfg.decoder.compute_dtype)
    b = carry.last_tok.shape[0]
    width = m * (k + 1)
    paged = carry.cache
    start_lens = paged.lengths
    view_k, view_v = gather_pool_view(paged, s_bucket)
    carry = carry._replace(cache=KVCache(k=view_k, v=view_v,
                                         lengths=start_lens))

    def body(state, _):
        carry, out, off = state
        g, count, done, last_tok, cache, hist, hist_len = _spec_verify_pass(
            params, cfg, carry.last_tok, carry.done, carry.num, carry.cache,
            carry.hist, carry.hist_len, k=k, ngram_n=ngram_n, eos=eos,
            max_new_tokens=max_new_tokens, cd=cd)
        out = jax.vmap(
            lambda row, v, s, c: masked_window_write(row, v, s, c, k + 1))(
                out, g, off, count)
        carry = SpecCarry(last_tok=last_tok, done=done,
                          num=carry.num + count, cache=cache,
                          hist=hist, hist_len=hist_len)
        return (carry, out, off + count), None

    out0 = jnp.zeros((b, width + k + 1), jnp.int32)  # +k+1 write slack
    (carry, out, counts), _ = lax.scan(
        body, (carry, out0, jnp.zeros((b,), jnp.int32)), None, length=m)

    def writeback(_, layer_in):
        kp, vp, vk, vv = layer_in
        ext = jax.vmap(
            lambda row_k, row_v, st: (
                lax.dynamic_slice_in_dim(row_k, st, width, axis=0),
                lax.dynamic_slice_in_dim(row_v, st, width, axis=0)))(
                    vk, vv, jnp.clip(start_lens, 0, s_bucket - width))
        kp, vp = write_tokens_paged_rows(kp, vp, ext[0], ext[1],
                                         paged.block_tables, start_lens)
        return _, (kp, vp)

    dense = carry.cache
    _, (new_kp, new_vp) = lax.scan(
        writeback, None, (paged.k_pages, paged.v_pages, dense.k, dense.v))
    new_paged = paged._replace(k_pages=new_kp, v_pages=new_vp,
                               lengths=dense.lengths)
    return out[:, :width], counts, carry._replace(cache=new_paged)


def generate_spec(
    params: Params,
    cfg: FastVLMConfig,
    images: Optional[jnp.ndarray],
    ids: jnp.ndarray,
    seq_lens: jnp.ndarray,
    image_starts: jnp.ndarray,
    *,
    max_new_tokens: int = 256,
    eos_ids: Tuple[int, ...] = (151645,),
    draft_k: int = 8,
    ngram_n: int = 3,
):
    """Whole-generation speculative greedy decode: prefill + spec_decode.

    Convenience composition mirroring ``generate``; the Engine calls the two
    halves separately so its own prefill jit (anyres tiles, precomputed
    vision embeds) is reused."""
    b, t = ids.shape
    cache = init_cache(
        cfg.decoder.num_layers, b,
        spec_cache_len(t, max_new_tokens, draft_k),
        cfg.decoder.num_kv_heads, cfg.decoder.head_dim,
        dtype=(jnp.int8 if cfg.decoder.kv_cache_dtype == "int8"
               else resolve_dtype(cfg.decoder.compute_dtype)),
    )
    logits, cache = _prefill_jit(params, cfg, images, ids, seq_lens,
                                 image_starts, cache)
    return spec_decode(params, cfg, logits, cache, ids, seq_lens,
                       max_new_tokens=max_new_tokens, eos_ids=eos_ids,
                       draft_k=draft_k, ngram_n=ngram_n)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "eos_ids", "sampling"),
)
def generate(
    params: Params,
    cfg: FastVLMConfig,
    images: Optional[jnp.ndarray],
    ids: jnp.ndarray,
    seq_lens: jnp.ndarray,
    image_starts: jnp.ndarray,
    key: jax.Array,
    *,
    max_new_tokens: int = 256,
    eos_ids: Tuple[int, ...] = (151645,),  # <|im_end|>
    sampling: SamplingParams = SamplingParams(),
) -> GenerateResult:
    """Whole-generation on device: prefill + while_loop greedy/sampled decode.

    Functional equivalent of HF ``generate`` with KeywordsStoppingCriteria
    (reference mm_utils.py:218-250) for token-level stop ids.
    """
    b, t = ids.shape
    max_len = t + max_new_tokens
    cache = init_cache(
        cfg.decoder.num_layers, b, max_len,
        cfg.decoder.num_kv_heads, cfg.decoder.head_dim,
        dtype=(jnp.int8 if cfg.decoder.kv_cache_dtype == "int8"
               else resolve_dtype(cfg.decoder.compute_dtype)),
    )
    logits, cache = prefill(params, cfg, images, ids, seq_lens, image_starts, cache)

    eos = jnp.asarray(eos_ids, jnp.int32)

    def sample_tok(logits, k):
        tok = sample(k, logits, sampling)
        return tok

    k0, key = jax.random.split(key)
    tok0 = sample_tok(logits, k0)

    out = jnp.zeros((b, max_new_tokens), jnp.int32)
    out = out.at[:, 0].set(tok0)
    done0 = jnp.isin(tok0, eos)

    State = Tuple  # (step, tokens_out, last_tok, done, cache, key)

    def cond(state):
        step, _, _, done, _, _ = state
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, out, last_tok, done, cache, key = state
        logits, cache = decode_step(params, cfg, last_tok, cache)
        key, sub = jax.random.split(key)
        tok = sample_tok(logits, sub)
        tok = jnp.where(done, 0, tok)
        out = lax.dynamic_update_slice(out, tok[:, None], (0, step))
        done = done | jnp.isin(tok, eos)
        return (step + 1, out, tok, done, cache, key)

    state = (jnp.int32(1), out, tok0, done0, cache, key)
    steps, out, _, done, _, _ = lax.while_loop(cond, body, state)

    # count tokens per row: generated until first EOS (inclusive) or cap
    is_eos = jnp.isin(out, eos)
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    num = jnp.where(any_eos, first_eos + 1, steps)
    return GenerateResult(tokens=out, num_generated=num.astype(jnp.int32))
