"""Fused ConvFFN pointwise kernel: out = residual + ls * (gelu(t@W1+b1)@W2+b2).

Why: the encoder's dominant FLOPs are the per-block fc1/gelu/fc2 pairs
(mlp ratio 4). Through XLA these are two separate convolutions with the
(N, 4C) intermediate round-tripping HBM each block — measured ~30% of MXU
peak on the stage-2 shapes. This kernel keeps the intermediate in a VMEM
scratch tile, fuses the exact-GELU epilogue and the layer-scaled residual
add, and streams rows: one HBM read of t/residual and one write of out per
block, plus one read of the (small) weights.

Grid: row tiles of the flattened token matrix. Weights live whole in VMEM
(C ≤ 768 -> ≤ 9.4 MB bf16), so this covers FastViTHD stages 0-3 and the
attention-stage FFNs; the 16x16x1536 stage-4 FFN stays on XLA (weights
exceed VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf, |err| <= 1.5e-7 — Mosaic has
    no erf/erfc lowering; exp is available."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _erf_gelu(x):
    # exact GELU via erf (accurate to ~1e-7, well inside the 1e-3 parity bar)
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _kernel(t_ref, res_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref,
            out_ref, h_scratch):
    t = t_ref[:]
    h = jnp.dot(t, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    h_scratch[:] = _erf_gelu(h).astype(t.dtype)
    o = jnp.dot(h_scratch[:], w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[:].astype(jnp.float32)
    out = res_ref[:].astype(jnp.float32) + ls_ref[:].astype(jnp.float32) * o
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_ffn(t, residual, w1, b1, w2, b2, ls, *, block_rows: int = 256,
              interpret: bool = False):
    """t, residual: (N, C); w1: (C, Ch); w2: (Ch, C); b1: (Ch,); b2, ls: (C,).

    Returns residual + ls * fc2(gelu(fc1(t))). N must be a multiple of
    block_rows (token grids here are powers of two >= 256)."""
    n, c = t.shape
    ch = w1.shape[1]
    assert n % block_rows == 0, (n, block_rows)
    grid = (n // block_rows,)

    row_spec = pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda r, cc: pl.BlockSpec((r, cc), lambda i: (0, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    vec = lambda cc: pl.BlockSpec((cc,), lambda i: (0,),  # noqa: E731
                                  memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, full(c, ch), vec(ch), full(ch, c),
                  vec(c), vec(c)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n, c), residual.dtype),
        scratch_shapes=[pltpu.VMEM((block_rows, ch), t.dtype)],
        interpret=interpret,
    )(t, residual, w1, b1, w2, b2, ls)


def ffn_block_apply(t_grid, residual_grid, ffn_params, ls, *,
                    block_rows: int = 256, interpret: bool = False):
    """NHWC wrapper: t/residual (B, H, W, C) -> (B, H, W, C).

    ffn_params: {"fc1": {"w": (1,1,C,Ch), "b"}, "fc2": ...} as stored by the
    encoder; 1x1 conv kernels are reshaped to matmul weights."""
    b, h, w, c = t_grid.shape
    w1 = ffn_params["fc1"]["w"].reshape(c, -1)
    w2 = ffn_params["fc2"]["w"].reshape(-1, c)
    n = b * h * w
    # block_rows must divide n (e.g. 24x24 grids at 1536px give n=576):
    # take the largest divisor of n not exceeding the request
    br = min(block_rows, n)
    while n % br:
        br -= 1
    out = fused_ffn(
        t_grid.reshape(n, c), residual_grid.reshape(n, c),
        w1, ffn_params["fc1"]["b"], w2, ffn_params["fc2"]["b"], ls,
        block_rows=br, interpret=interpret)
    return out.reshape(b, h, w, c)
