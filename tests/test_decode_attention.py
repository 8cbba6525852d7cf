"""Blocked decode-attention kernel vs dense reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvlm_tpu.ops.pallas.decode_attention import decode_attention


def _dense_reference(q, k, v, lengths):
    """Straightforward masked GQA attention (the XLA path's math)."""
    b, hq, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    qf = np.asarray(q, np.float32) * d ** -0.5
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    out = np.zeros((b, hq, d), np.float32)
    for bi in range(b):
        for h in range(hq):
            kh = h // g
            scores = kf[bi, :, kh] @ qf[bi, h]           # (S,)
            scores[np.arange(s) >= lengths[bi]] = -1e30
            p = np.exp(scores - scores.max())
            p /= p.sum()
            out[bi, h] = p @ vf[bi, :, kh]
    return out


@pytest.mark.parametrize("b,hq,hkv,d,s,block", [
    (1, 4, 2, 16, 64, 32),
    (2, 8, 2, 32, 96, 32),   # ragged lengths, non-pow2 block count
    (2, 4, 4, 16, 64, 64),   # MHA (g=1)
])
def test_matches_dense_reference(b, hq, hkv, d, s, block):
    rng = np.random.RandomState(0)
    q = rng.randn(b, hq, d).astype(np.float32)
    k = rng.randn(b, s, hkv, d).astype(np.float32)
    v = rng.randn(b, s, hkv, d).astype(np.float32)
    lengths = np.array([s // 2, s][:b], np.int32)

    got = np.asarray(decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(lengths), block_size=block, interpret=True))
    want = _dense_reference(q, k, v, lengths)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_length_one_and_full():
    rng = np.random.RandomState(1)
    b, hq, hkv, d, s = 2, 4, 2, 16, 32
    q = rng.randn(b, hq, d).astype(np.float32)
    k = rng.randn(b, s, hkv, d).astype(np.float32)
    v = rng.randn(b, s, hkv, d).astype(np.float32)
    lengths = np.array([1, s], np.int32)
    got = np.asarray(decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(lengths), block_size=16, interpret=True))
    want = _dense_reference(q, k, v, lengths)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # length=1 row attends only to key 0
    np.testing.assert_allclose(got[0, 0], np.asarray(v)[0, 0, 0],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("b,hq,hkv,d,page,pps", [
    (2, 4, 2, 16, 32, 3),
    (3, 8, 2, 32, 16, 4),   # more rows than a pow2, small pages
    (1, 4, 4, 16, 64, 2),   # MHA (g=1)
])
def test_paged_matches_dense_reference(b, hq, hkv, d, page, pps):
    """Paged kernel (block-table BlockSpec index map) vs the same dense
    reference, with shuffled pool pages and unmapped (-1) tail entries."""
    from fastvlm_tpu.ops.kv_cache import gather_pages
    from fastvlm_tpu.ops.pallas.decode_attention import paged_decode_attention

    rng = np.random.RandomState(2)
    P = b * pps + 2  # pool bigger than needed; extra pages are decoys
    q = rng.randn(b, hq, d).astype(np.float32)
    kp = rng.randn(P, page, hkv, d).astype(np.float32)
    vp = rng.randn(P, page, hkv, d).astype(np.float32)
    tables = rng.permutation(P)[:b * pps].reshape(b, pps).astype(np.int32)
    lengths = np.array([page + 3, pps * page, 1][:b], np.int32)
    # unmap every page fully past each row's length (allocator behavior)
    for i in range(b):
        tables[i, -(-int(lengths[i]) // page):] = -1

    got = np.asarray(paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(tables), jnp.asarray(lengths), interpret=True))
    dense_k = np.asarray(gather_pages(jnp.asarray(kp), jnp.asarray(tables)))
    dense_v = np.asarray(gather_pages(jnp.asarray(vp), jnp.asarray(tables)))
    want = _dense_reference(q, dense_k, dense_v, lengths)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
