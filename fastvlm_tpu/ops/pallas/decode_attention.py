"""Blocked decode attention kernels: one query token vs. a long KV cache.

The XLA decode path materializes (B, H, 1, S_max) score/mask tensors each
step; at serving context lengths the masked tail still burns bandwidth.
These kernels stream the KV cache in blocks with an online-softmax
accumulator and take the per-row valid length as a scalar-prefetch operand,
so keys past ``length`` are masked before the running max/denominator and no
(S_max)-wide mask tensor is ever materialized.

Layout is the whole game on this hardware (VMEM tiles are (8 sublanes, 128
lanes)): a (BS, Hkv=2, D=64) block wastes 8x of every tile, which made the
round-1 kernel 9x slower than XLA. Both kernels therefore view the cache as
(S, Hkv*D) — KV heads side by side in the lane dimension, the array's
natural flat layout, so the reshape is free — and embed the GQA queries
block-diagonally into (Hq, Hkv*D): query head i carries its 64 lanes in its
KV head's slot and zeros elsewhere. One (Hq, W) @ (W, BS) MXU dot then
yields every head's scores at once (the zero lanes mask cross-head terms
exactly), and one (Hq, BS) @ (BS, W) dot accumulates PV; the caller slices
each head's D lanes back out of the (Hq, W) output. No per-head loops, no
padded tiles.

The paged variant reads the ops/kv_cache.PagedKVCache pool IN PLACE: the
block-table lookup happens in the BlockSpec index map (scalar prefetch), so
each grid step DMAs exactly one pool page into VMEM — the TPU-native
equivalent of the reference app's paged-KV decode loop (SURVEY.md:40-41).

Opt-in via Qwen2Config.attn_backend = "pallas" (XLA remains the default).
Correctness is tested in interpret mode against the dense reference
(tests/test_decode_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _embed_queries(q, hkv):
    """(B, Hq, D) -> (B, Hq, Hkv*D) block-diagonal by KV head: query head i
    occupies lanes [(i//g)*D, (i//g+1)*D), zeros elsewhere."""
    b, hq, d = q.shape
    g = hq // hkv
    eye = jnp.eye(hkv, dtype=q.dtype)
    qe = jnp.einsum("bkgd,kh->bkghd", q.reshape(b, hkv, g, d), eye)
    return qe.reshape(b, hq, hkv * d)


def _extract_outputs(o, hkv):
    """(B, Hq, Hkv*D) -> (B, Hq, D): keep each query head's own lane block."""
    b, hq, w = o.shape
    g = hq // hkv
    d = w // hkv
    eye = jnp.eye(hkv, dtype=o.dtype)
    out = jnp.einsum("bkghd,kh->bkgd", o.reshape(b, hkv, g, hkv, d), eye)
    return out.reshape(b, hq, d)


def _block_step(j, valid, q_block, k_block, v_block, o_ref, m_ref, den_ref,
                acc_ref):
    """One online-softmax update over a KV block.

    q_block (Hq, W) embedded+pre-scaled queries; k_block/v_block (BS, W);
    valid (BS,) bool; scratch: m/den (Hq, 1) running max/denominator,
    acc (Hq, W)."""

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        den_ref[:] = jnp.zeros_like(den_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_block.astype(jnp.float32)
    k = k_block.astype(jnp.float32)

    s2 = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (Hq, BS)
    s2 = jnp.where(valid[None, :], s2, NEG_INF)

    m_new = jnp.maximum(m_ref[:], jnp.max(s2, axis=-1, keepdims=True))
    p = jnp.exp(s2 - m_new)                      # (Hq, BS)
    corr = jnp.exp(m_ref[:] - m_new)             # (Hq, 1)
    den_ref[:] = den_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.dot(p, v_block.astype(jnp.float32),
                 preferred_element_type=jnp.float32)  # (Hq, W)
    acc_ref[:] = acc_ref[:] * corr + pv
    m_ref[:] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _finish():
        denom = jnp.maximum(den_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def _make_kernel(bs: int):
    def kernel(length_ref, q_ref, k_ref, v_ref, o_ref, m_ref, den_ref, acc_ref):
        """Grid (B, S_max // BS): one KV block of one batch row per step."""
        i = pl.program_id(0)
        j = pl.program_id(1)
        length = length_ref[i]
        key_idx = j * bs + jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)
        valid = (key_idx < length)[:, 0]  # (BS,)
        _block_step(j, valid, q_ref[0], k_ref[0], v_ref[0],
                    o_ref, m_ref, den_ref, acc_ref)

    return kernel


def _make_paged_kernel(page: int):
    def kernel(length_ref, bt_ref, q_ref, k_ref, v_ref, o_ref,
               m_ref, den_ref, acc_ref):
        """Grid (B, pages_per_seq): the BlockSpec index map streams row i's
        j-th *pool page* into VMEM (block_tables scalar-prefetch); unmapped
        pages (-1) clamp to pool page 0 and are fully masked by ``length``."""
        i = pl.program_id(0)
        j = pl.program_id(1)
        length = length_ref[i]
        key_idx = j * page + jax.lax.broadcasted_iota(jnp.int32, (page, 1), 0)
        valid = (key_idx < length)[:, 0]  # (page,)
        _block_step(j, valid, q_ref[0], k_ref[0], v_ref[0],
                    o_ref, m_ref, den_ref, acc_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def decode_attention(q, k, v, lengths, *, block_size: int = 512,
                     interpret: bool = False):
    """q: (B, Hq, D) single-step queries; k/v: (B, S_max, Hkv, D) cache;
    lengths: (B,) valid key counts (incl. the just-written token).
    Returns (B, Hq, D)."""
    b, hq, d = q.shape
    s_max, hkv = k.shape[1], k.shape[2]
    w = hkv * d
    bs = min(block_size, s_max)
    while s_max % bs:
        bs -= 1

    qe = _embed_queries(q, hkv) * (d ** -0.5)
    kf = k.reshape(b, s_max, w)  # free: (S, Hkv, D) is already lane-flat
    vf = v.reshape(b, s_max, w)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, s_max // bs),
        in_specs=[
            pl.BlockSpec((1, hq, w), lambda i, j, L: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, w), lambda i, j, L: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, w), lambda i, j, L: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hq, w), lambda i, j, L: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, w), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        _make_kernel(bs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, w), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qe, kf, vf)
    return _extract_outputs(out, hkv)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention(q, k_pages, v_pages, block_tables, lengths, *,
                           interpret: bool = False):
    """Decode attention over a paged cache, pages read IN PLACE.

    q: (B, Hq, D) single-step queries; k_pages/v_pages: (P, page, Hkv, D)
    one layer's pool (ops/kv_cache.PagedKVCache); block_tables:
    (B, pages_per_seq) int32 pool page ids (-1 = unmapped); lengths: (B,)
    valid key counts (incl. the just-written token). Returns (B, Hq, D)."""
    b, hq, d = q.shape
    p_total, page, hkv = k_pages.shape[0], k_pages.shape[1], k_pages.shape[2]
    w = hkv * d
    pages_per_seq = block_tables.shape[1]

    qe = _embed_queries(q, hkv) * (d ** -0.5)
    kf = k_pages.reshape(p_total, page, w)
    vf = v_pages.reshape(p_total, page, w)

    def page_map(i, j, L, BT):
        return (jnp.maximum(BT[i, j], 0), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # lengths, block_tables
        grid=(b, pages_per_seq),
        in_specs=[
            pl.BlockSpec((1, hq, w), lambda i, j, L, BT: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page, w), page_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page, w), page_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hq, w), lambda i, j, L, BT: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, w), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        _make_paged_kernel(page),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, w), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), block_tables.astype(jnp.int32), qe, kf, vf)
    return _extract_outputs(out, hkv)
