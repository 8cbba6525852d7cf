"""Paged (block-table) KV cache primitives vs the dense cache.

The paged cache is the serving layout (SURVEY.md:40-41 paged-KV decode);
these tests pin its write/gather semantics to the dense cache's on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvlm_tpu.ops.kv_cache import (
    PagedKVCache,
    gather_pages,
    init_cache,
    init_paged_cache,
    write_prompt,
    write_prompt_paged,
    write_token,
    write_token_paged,
)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def _alloc_tables(batch, pages_per_seq, rng):
    """Random (but collision-free) page assignment, like a real allocator."""
    total = batch * pages_per_seq
    perm = rng.permutation(total)
    return perm.reshape(batch, pages_per_seq).astype(np.int32)


def test_prompt_write_matches_dense():
    rng = np.random.default_rng(0)
    b, t, h, d, page = 3, 10, 2, 4, 4
    pages_per_seq = 5  # virtual capacity 20
    key = jax.random.PRNGKey(1)
    new_k, new_v = _rand(key, (b, t, h, d)), _rand(jax.random.PRNGKey(2), (b, t, h, d))

    tables = jnp.asarray(_alloc_tables(b, pages_per_seq, rng))
    pool_k = jnp.zeros((b * pages_per_seq, page, h, d))
    pool_v = jnp.zeros_like(pool_k)
    pk, pv = write_prompt_paged(pool_k, pool_v, new_k, new_v, tables)

    dense_k = jnp.zeros((b, pages_per_seq * page, h, d))
    dense_v = jnp.zeros_like(dense_k)
    dk, dv = write_prompt(dense_k, dense_v, new_k, new_v)

    np.testing.assert_allclose(gather_pages(pk, tables), dk, atol=0)
    np.testing.assert_allclose(gather_pages(pv, tables), dv, atol=0)


def test_prompt_write_with_offset():
    rng = np.random.default_rng(1)
    b, t, h, d, page = 2, 6, 1, 4, 4
    pages_per_seq = 4
    new_k = _rand(jax.random.PRNGKey(3), (b, t, h, d))
    tables = jnp.asarray(_alloc_tables(b, pages_per_seq, rng))
    pool = jnp.zeros((b * pages_per_seq, page, h, d))
    offset = 5  # crosses a page boundary mid-span
    pk, _ = write_prompt_paged(pool, pool, new_k, new_k, tables, offset=offset)

    dense = np.zeros((b, pages_per_seq * page, h, d), np.float32)
    dense[:, offset:offset + t] = np.asarray(new_k)
    np.testing.assert_allclose(gather_pages(pk, tables), dense, atol=0)


def test_token_write_matches_dense():
    rng = np.random.default_rng(2)
    b, h, d, page = 4, 2, 4, 8
    pages_per_seq = 3
    lengths = jnp.asarray([0, 7, 8, 15], jnp.int32)  # incl. page boundaries
    new_k = _rand(jax.random.PRNGKey(4), (b, 1, h, d))
    new_v = _rand(jax.random.PRNGKey(5), (b, 1, h, d))

    tables = jnp.asarray(_alloc_tables(b, pages_per_seq, rng))
    pool = jnp.zeros((b * pages_per_seq, page, h, d))
    pk, pv = write_token_paged(pool, pool, new_k, new_v, tables, lengths)

    dense = jnp.zeros((b, pages_per_seq * page, h, d))
    dk, dv = write_token(dense, dense, new_k, new_v, lengths)
    np.testing.assert_allclose(gather_pages(pk, tables), dk, atol=0)
    np.testing.assert_allclose(gather_pages(pv, tables), dv, atol=0)


def test_unmapped_pages_are_dropped():
    """Writes whose virtual page has no pool page (-1) must not land
    anywhere — the allocator only maps pages the sequence actually needs."""
    b, t, h, d, page = 1, 8, 1, 2, 4
    tables = jnp.asarray([[2, -1]], jnp.int32)  # second page unmapped
    pool = jnp.ones((4, page, h, d))
    new = jnp.full((b, t, h, d), 7.0)
    pk, _ = write_token_paged(  # write at pos 5 -> page 1 -> unmapped
        pool, pool, new[:, :1], new[:, :1], tables, jnp.asarray([5], jnp.int32))
    np.testing.assert_allclose(pk, pool, atol=0)  # untouched
    pk, _ = write_prompt_paged(pool, pool, new, new, tables)
    # tokens 0-3 land in page 2; tokens 4-7 dropped
    assert float(jnp.sum(pk[2] == 7.0)) == page * h * d
    np.testing.assert_allclose(pk[jnp.asarray([0, 1, 3])],
                               pool[jnp.asarray([0, 1, 3])], atol=0)


def test_pool_is_shared_across_rows():
    """Two rows with interleaved page ids must not clobber each other."""
    h, d, page = 1, 2, 4
    tables = jnp.asarray([[1, 3], [2, 0]], jnp.int32)
    pool = jnp.zeros((4, page, h, d))
    new = jnp.stack([jnp.full((6, h, d), 1.0), jnp.full((6, h, d), 2.0)])
    pk, _ = write_prompt_paged(pool, pool, new, new, tables)
    dense = gather_pages(pk, tables)
    np.testing.assert_allclose(dense[0, :6], 1.0)
    np.testing.assert_allclose(dense[1, :6], 2.0)
    np.testing.assert_allclose(dense[:, 6:], 0.0)


def test_init_paged_cache_shapes():
    c = init_paged_cache(num_layers=2, batch=3, num_pages=16, page_size=8,
                         pages_per_seq=4, num_kv_heads=2, head_dim=4)
    assert isinstance(c, PagedKVCache)
    assert c.k_pages.shape == (2, 16, 8, 2, 4)
    assert c.page_size == 8 and c.num_pages == 16
    assert c.max_len == 32 and c.num_layers == 2
    assert c.block_tables.shape == (3, 4)
    assert int(c.block_tables.max()) == -1


def test_writes_compile_under_jit_and_scan():
    """The per-layer writes must trace inside lax.scan (the decoder drives
    them through the stacked-layer scan)."""
    L, b, h, d, page, pps = 3, 2, 1, 4, 4, 2
    pool_k = jnp.zeros((L, 8, page, h, d))
    tables = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    lengths = jnp.asarray([1, 5], jnp.int32)
    new = jnp.ones((L, b, 1, h, d))

    @jax.jit
    def step(pool_k, new):
        def body(_, xs):
            layer, nk = xs
            lk, _ = write_token_paged(layer, layer, nk, nk, tables, lengths)
            return None, lk
        _, out = jax.lax.scan(body, None, (pool_k, new))
        return out

    out = step(pool_k, new)
    assert out.shape == pool_k.shape
    dense = gather_pages(out[0], tables)
    np.testing.assert_allclose(np.asarray(dense[0, 1]), 1.0)
    np.testing.assert_allclose(np.asarray(dense[1, 5]), 1.0)
    assert float(jnp.sum(out[0])) == b * h * d  # exactly one slot per row
