"""Blocked decode attention kernel: one query token vs. a long KV cache.

The XLA decode path materializes (B, H, 1, S_max) score/mask tensors each
step; at serving context lengths the masked tail still burns bandwidth. This
kernel streams the KV cache in blocks with an online-softmax accumulator and
takes the per-row valid length as a scalar-prefetch operand, so:

  * keys past ``length`` are masked before the running max/denominator,
  * no (S_max)-wide mask tensor is ever materialized,
  * GQA is computed in grouped form: (G, D) queries per KV head.

Opt-in (qwen2 decode uses XLA by default): on this environment the XLA path
is competitive at bench context lengths; the kernel targets long-cache
serving and real-hardware pipelining. Correctness is tested in interpret
mode against the dense reference (tests/test_decode_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _make_kernel(hq: int, hkv: int, d: int, bs: int):
    g = hq // hkv
    scale = d ** -0.5

    def kernel(length_ref, q_ref, k_ref, v_ref, o_ref, m_ref, den_ref, acc_ref):
        """Grid (B, S_max // BS): one KV block of one batch row per step.

        q_ref (1, Hq, D); k_ref/v_ref (1, BS, Hkv, D); o_ref (1, Hq, D);
        scratch: m (Hq, 1) running max, den (Hq, 1) denom, acc (Hq, D)."""
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            den_ref[:] = jnp.zeros_like(den_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        length = length_ref[i]
        key_idx = j * bs + jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)
        valid = (key_idx < length)[:, 0]  # (BS,)

        q = q_ref[0].astype(jnp.float32) * scale     # (Hq, D)
        k = k_ref[0].astype(jnp.float32)             # (BS, Hkv, D)
        v = v_ref[0].astype(jnp.float32)

        # per-KV-head 2-D matmuls (Mosaic has no mismatched-batch dots)
        score_rows = []
        for h in range(hkv):
            qh = q[h * g:(h + 1) * g]                 # (G, D)
            kh = k[:, h]                              # (BS, D)
            score_rows.append(jnp.dot(qh, kh.T,
                                      preferred_element_type=jnp.float32))
        s2 = jnp.concatenate(score_rows, axis=0)      # (Hq, BS)
        s2 = jnp.where(valid[None, :], s2, NEG_INF)

        m_new = jnp.maximum(m_ref[:], jnp.max(s2, axis=-1, keepdims=True))
        p = jnp.exp(s2 - m_new)                      # (Hq, BS)
        corr = jnp.exp(m_ref[:] - m_new)             # (Hq, 1)
        den_ref[:] = den_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv_rows = []
        for h in range(hkv):
            ph = p[h * g:(h + 1) * g]                 # (G, BS)
            vh = v[:, h]                              # (BS, D)
            pv_rows.append(jnp.dot(ph, vh,
                                   preferred_element_type=jnp.float32))
        pv = jnp.concatenate(pv_rows, axis=0)         # (Hq, D)
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new

        @pl.when(j == pl.num_programs(1) - 1)
        def _finish():
            denom = jnp.maximum(den_ref[:], 1e-30)
            o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def decode_attention(q, k, v, lengths, *, block_size: int = 128,
                     interpret: bool = False):
    """q: (B, Hq, D) single-step queries; k/v: (B, S_max, Hkv, D) cache;
    lengths: (B,) valid key counts (incl. the just-written token).
    Returns (B, Hq, D)."""
    b, hq, d = q.shape
    s_max, hkv = k.shape[1], k.shape[2]
    bs = min(block_size, s_max)
    while s_max % bs:
        bs -= 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, s_max // bs),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda i, j, L: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, hkv, d), lambda i, j, L: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, hkv, d), lambda i, j, L: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda i, j, L: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, d), jnp.float32),
        ],
    )

    return pl.pallas_call(
        _make_kernel(hq, hkv, d, bs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k, v)
