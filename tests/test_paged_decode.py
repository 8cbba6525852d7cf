"""Paged-cache decode parity: the block-table serving layout must produce
exactly the dense cache's logits through qwen2.forward / vlm decode, on both
attention backends (XLA gather fallback and the Pallas paged kernel).

This pins VERDICT r1 #3's correctness bar ("correctness tests vs dense") —
the paged cache is the TPU equivalent of the reference app's paged-KV decode
loop (SURVEY.md:40-41).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvlm_tpu.config import Qwen2Config
from fastvlm_tpu.models import qwen2
from fastvlm_tpu.ops.kv_cache import (
    PagedKVCache,
    init_cache,
    init_paged_cache,
)

TINY = Qwen2Config(
    vocab_size=128,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    intermediate_size=64,
    tie_word_embeddings=True,
)

PAGE = 8


def _alloc_tables(batch, pages_per_seq, seed=0):
    """Collision-free shuffled page assignment (allocator simulation)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(batch * pages_per_seq).astype(np.int32)
    return jnp.asarray(perm.reshape(batch, pages_per_seq))


def _run_pair(cfg, b=2, t=12, steps=5, seed=0):
    """Prefill + greedy-ish decode on dense and paged caches; return the
    per-step logits of both."""
    key = jax.random.PRNGKey(seed)
    params = qwen2.init(key, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(seed + 1), (b, t), 0,
                             cfg.vocab_size)
    seq_lens = jnp.asarray([t, t - 3][:b], jnp.int32)
    max_len = t + steps + 3
    pages_per_seq = -(-max_len // PAGE)

    dense = init_cache(cfg.num_layers, b, pages_per_seq * PAGE,
                       cfg.num_kv_heads, cfg.head_dim, jnp.float32)
    paged = init_paged_cache(cfg.num_layers, b, b * pages_per_seq, PAGE,
                             pages_per_seq, cfg.num_kv_heads, cfg.head_dim,
                             jnp.float32)
    paged = paged._replace(block_tables=_alloc_tables(b, pages_per_seq, seed))

    embeds = qwen2.embed(params, ids)
    positions = jnp.arange(t, dtype=jnp.int32)[None].repeat(b, 0)
    mask = qwen2.prefill_mask(seq_lens, t, t)

    outs = []
    for cache in (dense, paged):
        hidden, cache = qwen2.forward(params, cfg, embeds, positions,
                                      cache=cache, mask=mask, prefill=True)
        cache = cache._replace(lengths=seq_lens)
        logits_steps = [np.asarray(
            qwen2.logits_from_hidden(params, hidden, cfg))]
        tok = jnp.argmax(logits_steps[0][:, -1], axis=-1).astype(jnp.int32)
        for _ in range(steps):
            emb = qwen2.embed(params, tok[:, None])
            pos = cache.lengths[:, None]
            dmask = qwen2.decode_mask(cache.lengths, cache.max_len)
            hidden, cache = qwen2.forward(params, cfg, emb, pos, cache=cache,
                                          mask=dmask, prefill=False)
            step_logits = qwen2.logits_from_hidden(params, hidden, cfg)
            logits_steps.append(np.asarray(step_logits))
            tok = jnp.argmax(step_logits[:, 0], axis=-1).astype(jnp.int32)
        outs.append(logits_steps)
    return outs


def test_paged_forward_matches_dense_xla():
    dense_logits, paged_logits = _run_pair(TINY)
    for d, p in zip(dense_logits, paged_logits):
        np.testing.assert_allclose(p, d, atol=1e-5)


@pytest.mark.slow
def test_paged_forward_matches_dense_pallas():
    cfg = dataclasses.replace(TINY, attn_backend="pallas")
    dense_logits, paged_logits = _run_pair(cfg)
    ref_logits, _ = _run_pair(TINY)
    for d, p, r in zip(dense_logits, paged_logits, ref_logits):
        np.testing.assert_allclose(p, d, atol=1e-4)
        np.testing.assert_allclose(d, r, atol=1e-4)  # pallas == xla too


def test_paged_decode_chunk_and_generate_parity():
    """vlm.decode_chunk (the serving streaming unit) must run unchanged on a
    paged cache and agree with the dense path token-for-token."""
    from fastvlm_tpu.config import FastViTConfig, FastVLMConfig, ProjectorConfig
    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.ops.sampling import SamplingParams

    vis = FastViTConfig(layers=(1, 1, 1, 1, 1), embed_dims=(8, 16, 24, 32, 40),
                        image_size=256)
    cfg = FastVLMConfig(
        vision=vis,
        projector=ProjectorConfig(mm_hidden_size=80, hidden_size=32),
        decoder=TINY,
    )
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    b, t = 2, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, 100)
    seq_lens = jnp.asarray([t, t - 5], jnp.int32)
    starts = jnp.asarray([-1, -1], jnp.int32)
    steps = 8
    pages_per_seq = -(-(t + steps) // PAGE)

    dense = init_cache(TINY.num_layers, b, pages_per_seq * PAGE,
                       TINY.num_kv_heads, TINY.head_dim, jnp.float32)
    paged = init_paged_cache(TINY.num_layers, b, b * pages_per_seq + 1, PAGE,
                             pages_per_seq, TINY.num_kv_heads, TINY.head_dim,
                             jnp.float32)
    paged = paged._replace(
        block_tables=_alloc_tables(b, pages_per_seq, 3) + 1)  # page 0 unused

    toks = {}
    for name, cache in (("dense", dense), ("paged", paged)):
        # decode_chunk donates the cache (and prefill aliases seq_lens into
        # cache.lengths) — give each run its own arrays
        seq_lens = jnp.asarray([t, t - 5], jnp.int32)
        logits, cache = vlm.prefill(params, cfg, None, ids, seq_lens, starts,
                                    cache)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        done = jnp.zeros((b,), bool)
        key = jax.random.PRNGKey(7)
        out, done, tok, cache, key = vlm.decode_chunk(
            params, cfg, tok, done, cache, key, k=steps, eos_ids=(127,),
            sampling=SamplingParams(temperature=0.0))
        toks[name] = np.asarray(out)
    np.testing.assert_array_equal(toks["paged"], toks["dense"])


def test_chunk_view_paged_decode_matches_dense_across_chunks():
    """vlm.decode_chunk_paged (gather-once-per-chunk serving decode) must
    produce the dense path's tokens AND leave the pool consistent for the
    next chunk (the write-back is what a later chunk's gathered view reads)."""
    from fastvlm_tpu.config import FastViTConfig, FastVLMConfig, ProjectorConfig
    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.ops.sampling import SamplingParams

    vis = FastViTConfig(layers=(1, 1, 1, 1, 1), embed_dims=(8, 16, 24, 32, 40),
                        image_size=256)
    cfg = FastVLMConfig(
        vision=vis,
        projector=ProjectorConfig(mm_hidden_size=80, hidden_size=32),
        decoder=TINY,
    )
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    b, t, k, chunks = 2, 16, 4, 3
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, 100)
    starts = jnp.asarray([-1, -1], jnp.int32)
    pages_per_seq = -(-(t + k * chunks) // PAGE)

    dense = init_cache(TINY.num_layers, b, pages_per_seq * PAGE,
                       TINY.num_kv_heads, TINY.head_dim, jnp.float32)
    paged = init_paged_cache(TINY.num_layers, b, b * pages_per_seq + 1, PAGE,
                             pages_per_seq, TINY.num_kv_heads, TINY.head_dim,
                             jnp.float32)
    paged = paged._replace(
        block_tables=_alloc_tables(b, pages_per_seq, 5) + 1)

    outs = {}
    for name, cache in (("dense", dense), ("paged-view", paged)):
        seq_lens = jnp.asarray([t, t - 5], jnp.int32)
        logits, cache = vlm.prefill(params, cfg, None, ids, seq_lens, starts,
                                    cache)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        done = jnp.zeros((b,), bool)
        key = jax.random.PRNGKey(7)
        got = []
        for ci in range(chunks):
            if name == "paged-view":
                # grow the bucket across chunks like the batcher does
                s_bucket = -(-(t + (ci + 1) * k) // PAGE) * PAGE
                out, done, tok, cache, key = vlm.decode_chunk_paged(
                    params, cfg, tok, done, cache, key, k=k,
                    s_bucket=s_bucket, eos_ids=(127,),
                    sampling=SamplingParams(temperature=0.0))
            else:
                out, done, tok, cache, key = vlm.decode_chunk(
                    params, cfg, tok, done, cache, key, k=k, eos_ids=(127,),
                    sampling=SamplingParams(temperature=0.0))
            got.append(np.asarray(out))
        outs[name] = np.concatenate(got, axis=1)
    np.testing.assert_array_equal(outs["paged-view"], outs["dense"])


def test_unmapped_tail_pages_do_not_change_logits():
    """Pages past the final token may be unmapped (-1): decode must mask
    them, not read pool page 0 (which belongs to another row)."""
    cfg = TINY
    b, t, steps = 1, 6, 2
    key = jax.random.PRNGKey(2)
    params = qwen2.init(key, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(3), (b, t), 0, cfg.vocab_size)
    seq_lens = jnp.asarray([t], jnp.int32)
    pages_per_seq = 3  # capacity 24 >> t + steps

    def run(tables):
        cache = init_paged_cache(cfg.num_layers, b, 8, PAGE, pages_per_seq,
                                 cfg.num_kv_heads, cfg.head_dim, jnp.float32)
        # poison the pool so reads of unmapped pages would show
        cache = cache._replace(
            k_pages=jnp.full_like(cache.k_pages, 3.0),
            v_pages=jnp.full_like(cache.v_pages, -3.0),
            block_tables=jnp.asarray(tables, jnp.int32))
        embeds = qwen2.embed(params, ids)
        pos = jnp.arange(t, dtype=jnp.int32)[None]
        mask = qwen2.prefill_mask(seq_lens, t, t)
        hidden, cache = qwen2.forward(params, cfg, embeds, pos, cache=cache,
                                      mask=mask, prefill=True)
        cache = cache._replace(lengths=seq_lens)
        outs = []
        tok = jnp.argmax(
            qwen2.logits_from_hidden(params, hidden, cfg)[:, -1], -1
        ).astype(jnp.int32)
        for _ in range(steps):
            emb = qwen2.embed(params, tok[:, None])
            dmask = qwen2.decode_mask(cache.lengths, cache.max_len)
            hidden, cache = qwen2.forward(params, cfg, emb,
                                          cache.lengths[:, None], cache=cache,
                                          mask=dmask, prefill=False)
            logits = qwen2.logits_from_hidden(params, hidden, cfg)
            outs.append(np.asarray(logits))
            tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
        return outs

    full = run([[1, 2, 4]])
    tail_unmapped = run([[1, -1, -1]])  # t + steps fits in one page
    for a, b_ in zip(full, tail_unmapped):
        np.testing.assert_allclose(a, b_, atol=1e-5)


def test_pool_inplace_decode_matches_dense_across_chunks():
    """vlm.decode_chunk_pool (in-place pool attention, zero gather/scatter)
    must produce the dense path's tokens with a poisoned, oversized pool
    (extra unmapped pages must be masked out by ownership, and rows must
    never see each other's pages)."""
    from fastvlm_tpu.config import FastViTConfig, FastVLMConfig, ProjectorConfig
    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.ops.sampling import SamplingParams

    vis = FastViTConfig(layers=(1, 1, 1, 1, 1), embed_dims=(8, 16, 24, 32, 40),
                        image_size=256)
    cfg = FastVLMConfig(
        vision=vis,
        projector=ProjectorConfig(mm_hidden_size=80, hidden_size=32),
        decoder=TINY,
    )
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    b, t, k, chunks = 2, 16, 4, 3
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, 100)
    starts = jnp.asarray([-1, -1], jnp.int32)
    pages_per_seq = -(-(t + k * chunks) // PAGE)

    dense = init_cache(TINY.num_layers, b, pages_per_seq * PAGE,
                       TINY.num_kv_heads, TINY.head_dim, jnp.float32)
    # pool with 5 extra never-mapped pages, poisoned so ownership leaks show
    paged = init_paged_cache(TINY.num_layers, b, b * pages_per_seq + 5, PAGE,
                             pages_per_seq, TINY.num_kv_heads, TINY.head_dim,
                             jnp.float32)
    paged = paged._replace(
        k_pages=jnp.full_like(paged.k_pages, 7.0),
        v_pages=jnp.full_like(paged.v_pages, -7.0),
        block_tables=_alloc_tables(b, pages_per_seq, 11) + 5)  # 0-4 unused

    outs = {}
    for name, cache in (("dense", dense), ("pool-inplace", paged)):
        seq_lens = jnp.asarray([t, t - 5], jnp.int32)
        logits, cache = vlm.prefill(params, cfg, None, ids, seq_lens, starts,
                                    cache)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        done = jnp.zeros((b,), bool)
        key = jax.random.PRNGKey(7)
        got = []
        for _ in range(chunks):
            if name == "pool-inplace":
                out, done, tok, cache, key = vlm.decode_chunk_pool(
                    params, cfg, tok, done, cache, key, k=k, eos_ids=(127,),
                    sampling=SamplingParams(temperature=0.0))
            else:
                out, done, tok, cache, key = vlm.decode_chunk(
                    params, cfg, tok, done, cache, key, k=k, eos_ids=(127,),
                    sampling=SamplingParams(temperature=0.0))
            got.append(np.asarray(out))
        outs[name] = np.concatenate(got, axis=1)
    np.testing.assert_array_equal(outs["pool-inplace"], outs["dense"])


def test_pool_inplace_freed_row_stays_inert():
    """A row whose pages were freed mid-flight (table = -1, finished) must
    not poison live rows: all-invalid softmax is guarded to zeros and the
    dead row keeps emitting pad while the live row's tokens match dense."""
    from fastvlm_tpu.config import FastViTConfig, FastVLMConfig, ProjectorConfig
    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.ops.sampling import SamplingParams

    vis = FastViTConfig(layers=(1, 1, 1, 1, 1), embed_dims=(8, 16, 24, 32, 40),
                        image_size=256)
    cfg = FastVLMConfig(
        vision=vis,
        projector=ProjectorConfig(mm_hidden_size=80, hidden_size=32),
        decoder=TINY,
    )
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    b, t, k = 2, 16, 4
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, 100)
    starts = jnp.asarray([-1, -1], jnp.int32)
    pages_per_seq = -(-(t + 2 * k) // PAGE)

    dense = init_cache(TINY.num_layers, b, pages_per_seq * PAGE,
                       TINY.num_kv_heads, TINY.head_dim, jnp.float32)
    paged = init_paged_cache(TINY.num_layers, b, b * pages_per_seq, PAGE,
                             pages_per_seq, TINY.num_kv_heads, TINY.head_dim,
                             jnp.float32)
    paged = paged._replace(block_tables=_alloc_tables(b, pages_per_seq, 13))

    outs = {}
    for name, cache in (("dense", dense), ("pool-inplace", paged)):
        seq_lens = jnp.asarray([t, t - 5], jnp.int32)
        logits, cache = vlm.prefill(params, cfg, None, ids, seq_lens, starts,
                                    cache)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        done = jnp.asarray([False, True])  # row 1 finished at admission
        key = jax.random.PRNGKey(7)
        if name == "pool-inplace":
            # free row 1's pages like the batcher does on finish
            cache = cache._replace(block_tables=cache.block_tables.at[1].set(-1))
            out, done, tok, cache, key = vlm.decode_chunk_pool(
                params, cfg, tok, done, cache, key, k=k, eos_ids=(127,),
                sampling=SamplingParams(temperature=0.0))
        else:
            out, done, tok, cache, key = vlm.decode_chunk(
                params, cfg, tok, done, cache, key, k=k, eos_ids=(127,),
                sampling=SamplingParams(temperature=0.0))
        outs[name] = np.asarray(out)
    np.testing.assert_array_equal(outs["pool-inplace"][0], outs["dense"][0])
    np.testing.assert_array_equal(outs["pool-inplace"][1], 0)


def test_pool_inplace_bucketed_matches_unbucketed():
    """p_bucket (page-watermark slice) must not change tokens when every
    mapped page id is below the bucket."""
    from fastvlm_tpu.config import FastViTConfig, FastVLMConfig, ProjectorConfig
    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.ops.sampling import SamplingParams

    vis = FastViTConfig(layers=(1, 1, 1, 1, 1), embed_dims=(8, 16, 24, 32, 40),
                        image_size=256)
    cfg = FastVLMConfig(
        vision=vis,
        projector=ProjectorConfig(mm_hidden_size=80, hidden_size=32),
        decoder=TINY,
    )
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    b, t, k = 2, 16, 4
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, 100)
    starts = jnp.asarray([-1, -1], jnp.int32)
    pages_per_seq = -(-(t + k) // PAGE)
    used = b * pages_per_seq  # lowest-first allocator: pages [0, used)

    def run(p_bucket):
        # pool 3x larger than needed, poisoned above the watermark
        cache = init_paged_cache(TINY.num_layers, b, 3 * used, PAGE,
                                 pages_per_seq, TINY.num_kv_heads,
                                 TINY.head_dim, jnp.float32)
        cache = cache._replace(
            k_pages=jnp.full_like(cache.k_pages, 9.0),
            v_pages=jnp.full_like(cache.v_pages, -9.0),
            block_tables=_alloc_tables(b, pages_per_seq, 17))
        seq_lens = jnp.asarray([t, t - 5], jnp.int32)
        logits, cache = vlm.prefill(params, cfg, None, ids, seq_lens, starts,
                                    cache)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        done = jnp.zeros((b,), bool)
        out, *_ = vlm.decode_chunk_pool(
            params, cfg, tok, done, cache, jax.random.PRNGKey(7), k=k,
            eos_ids=(127,), sampling=SamplingParams(temperature=0.0),
            p_bucket=p_bucket)
        return np.asarray(out)

    np.testing.assert_array_equal(run(used), run(None))


def test_persistent_view_with_deferred_sync_matches_dense():
    """The steady-state serving loop: decode chunks on a persistent dense
    view (vlm.decode_chunk — zero paged overhead), lazily sync the pool at
    a simulated table-change boundary (vlm.sync_pool_from_view), re-gather
    (vlm.gather_view) and continue. Tokens must match the dense baseline
    across the re-gather, proving the deferred sync left the pool exact."""
    from fastvlm_tpu.config import FastViTConfig, FastVLMConfig, ProjectorConfig
    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.ops.sampling import SamplingParams

    vis = FastViTConfig(layers=(1, 1, 1, 1, 1), embed_dims=(8, 16, 24, 32, 40),
                        image_size=256)
    cfg = FastVLMConfig(
        vision=vis,
        projector=ProjectorConfig(mm_hidden_size=80, hidden_size=32),
        decoder=TINY,
    )
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    b, t, k, chunks = 2, 16, 4, 4
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, 100)
    starts = jnp.asarray([-1, -1], jnp.int32)
    pages_per_seq = -(-(t + k * chunks) // PAGE)
    s_bucket = pages_per_seq * PAGE

    # dense baseline
    dense = init_cache(TINY.num_layers, b, s_bucket, TINY.num_kv_heads,
                       TINY.head_dim, jnp.float32)
    seq_lens = jnp.asarray([t, t - 5], jnp.int32)
    logits, dense = vlm.prefill(params, cfg, None, ids, seq_lens, starts,
                                dense)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    done = jnp.zeros((b,), bool)
    key = jax.random.PRNGKey(7)
    want = []
    dt, dd, dk = tok, done, key
    dcache = dense
    for _ in range(chunks):
        out, dd, dt, dcache, dk = vlm.decode_chunk(
            params, cfg, dt, dd, dcache, dk, k=k, eos_ids=(127,),
            sampling=SamplingParams(temperature=0.0))
        want.append(np.asarray(out))
    want = np.concatenate(want, axis=1)

    # persistent-view loop with a mid-run sync + re-gather
    paged = init_paged_cache(TINY.num_layers, b, b * pages_per_seq + 3, PAGE,
                             pages_per_seq, TINY.num_kv_heads, TINY.head_dim,
                             jnp.float32)
    paged = paged._replace(block_tables=_alloc_tables(b, pages_per_seq, 23))
    seq_lens = jnp.asarray([t, t - 5], jnp.int32)
    logits, paged = vlm.prefill(params, cfg, None, ids, seq_lens, starts,
                                paged)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    done = jnp.zeros((b,), bool)
    key = jax.random.PRNGKey(7)
    view = vlm.gather_view(paged, s_bucket)
    synced = paged.lengths
    got = []
    for ci in range(chunks):
        out, done, tok, view, key = vlm.decode_chunk(
            params, cfg, tok, done, view, key, k=k, eos_ids=(127,),
            sampling=SamplingParams(temperature=0.0))
        got.append(np.asarray(out))
        if ci == 1:  # simulated table-change boundary: sync + re-gather
            paged = vlm.sync_pool_from_view(view, paged, synced, w=2 * k)
            synced = paged.lengths
            view = vlm.gather_view(paged, s_bucket)
    got = np.concatenate(got, axis=1)
    np.testing.assert_array_equal(got, want)

    # final sync leaves the pool exactly equal to the view's live columns
    paged = vlm.sync_pool_from_view(view, paged, synced, w=2 * k)
    view2 = vlm.gather_view(paged, s_bucket)
    lens = np.asarray(view.lengths)
    vk, v2k = np.asarray(view.k), np.asarray(view2.k)
    for row in range(b):
        np.testing.assert_allclose(v2k[:, row, :lens[row]],
                                   vk[:, row, :lens[row]], atol=0)


def test_wide_flush_matches_per_chunk_syncs():
    """flush_view's round-5 dispatch shape: a multi-chunk backlog synced in
    ceil(total/w) WIDE windows (w = min(8k, view width)) must leave the pool
    byte-identical to one sync per chunk — including the over-rounded final
    window whose clamped start (sync_pool_from_view's clip) re-writes
    earlier columns with their own view values."""
    from fastvlm_tpu.models import vlm

    b, pages_per_seq, k, chunks = 3, 8, 4, 10
    s_bucket = pages_per_seq * PAGE  # 64

    def mk_pool(seed):
        pool = init_paged_cache(TINY.num_layers, b, b * pages_per_seq + 2,
                                PAGE, pages_per_seq, TINY.num_kv_heads,
                                TINY.head_dim, jnp.float32)
        kk, kv = jax.random.split(jax.random.PRNGKey(seed))
        return pool._replace(
            k_pages=jax.random.normal(kk, pool.k_pages.shape, jnp.float32),
            v_pages=jax.random.normal(kv, pool.v_pages.shape, jnp.float32),
            block_tables=_alloc_tables(b, pages_per_seq, 9),
            lengths=jnp.asarray([16, 11, 16], jnp.int32))

    pool_a, pool_b = mk_pool(3), mk_pool(3)
    base = np.asarray(pool_a.lengths).copy()
    view = vlm.gather_view(pool_a, s_bucket)
    # simulate `chunks` decode chunks appended to the view only (the
    # steady-state persist loop): every row advances k per chunk
    rng = np.random.default_rng(11)
    vk, vv = np.array(view.k), np.array(view.v)
    for row in range(b):
        lo, hi = base[row], base[row] + chunks * k
        vk[:, row, lo:hi] = rng.standard_normal(vk[:, row, lo:hi].shape)
        vv[:, row, lo:hi] = rng.standard_normal(vv[:, row, lo:hi].shape)
    view = view._replace(k=jnp.asarray(vk), v=jnp.asarray(vv),
                         lengths=jnp.asarray(base + chunks * k))

    # (a) per-chunk syncs, w = k
    for j in range(chunks):
        pool_a = vlm.sync_pool_from_view(view, pool_a,
                                         jnp.asarray(base + j * k), w=k)
    # (b) wide windows, w = min(8k, view width) — 2 dispatches for 10
    # chunks; the second window over-rounds past the view end and clamps
    w = min(8 * k, s_bucket)
    total, off = chunks * k, 0
    while off < total:
        pool_b = vlm.sync_pool_from_view(view, pool_b,
                                         jnp.asarray(base + off), w=w)
        off += w

    np.testing.assert_array_equal(np.asarray(pool_a.lengths),
                                  np.asarray(pool_b.lengths))
    va, vb_ = vlm.gather_view(pool_a, s_bucket), vlm.gather_view(pool_b,
                                                                 s_bucket)
    lens = np.asarray(pool_a.lengths)
    for row in range(b):
        np.testing.assert_allclose(
            np.asarray(vb_.k)[:, row, :lens[row]],
            np.asarray(va.k)[:, row, :lens[row]], atol=0)
        np.testing.assert_allclose(
            np.asarray(vb_.v)[:, row, :lens[row]],
            np.asarray(va.v)[:, row, :lens[row]], atol=0)
        # and both equal the view's authoritative columns
        np.testing.assert_allclose(
            np.asarray(vb_.k)[:, row, :lens[row]],
            np.asarray(view.k)[:, row, :lens[row]], atol=0)


def test_update_view_row_matches_regather():
    """vlm.update_view_row (the admission-boundary single-row refresh,
    round 5) must reproduce exactly what a full gather_view would put in
    that row — and leave every other row's columns untouched."""
    from fastvlm_tpu.models import vlm

    b, pages_per_seq = 3, 4
    s_bucket = pages_per_seq * PAGE
    paged = init_paged_cache(TINY.num_layers, b, b * pages_per_seq + 2, PAGE,
                             pages_per_seq, TINY.num_kv_heads, TINY.head_dim,
                             jnp.float32)
    kk, kv = jax.random.split(jax.random.PRNGKey(3))
    paged = paged._replace(
        k_pages=jax.random.normal(kk, paged.k_pages.shape, jnp.float32),
        v_pages=jax.random.normal(kv, paged.v_pages.shape, jnp.float32),
        block_tables=_alloc_tables(b, pages_per_seq, 5),
        lengths=jnp.asarray([7, 12, 3], jnp.int32))
    full = vlm.gather_view(paged, s_bucket)
    # a view whose row 1 predates the admission that rebound its slot:
    # poisoned columns, zeroed length
    stale = full._replace(k=full.k.at[:, 1].set(-1.0),
                          v=full.v.at[:, 1].set(-1.0),
                          lengths=full.lengths.at[1].set(0))
    fixed = vlm.update_view_row(stale, paged, jnp.asarray(1, jnp.int32))
    np.testing.assert_array_equal(np.asarray(fixed.lengths),
                                  np.asarray(full.lengths))
    np.testing.assert_allclose(np.asarray(fixed.k), np.asarray(full.k),
                               atol=0)
    np.testing.assert_allclose(np.asarray(fixed.v), np.asarray(full.v),
                               atol=0)
