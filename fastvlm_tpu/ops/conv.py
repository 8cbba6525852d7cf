"""Core NHWC conv / norm ops for the TPU compute path.

All convolutions run in NHWC with HWIO kernels — the layout XLA:TPU tiles
directly onto the MXU. Padding is explicit-symmetric (k//2 per side) so
shapes match the reference's torch ``Conv2d(padding=k//2)`` semantics for
every kernel/stride combination used by FastViTHD (reference mci.py blocks),
including the stride-2 even-input cases where XLA 'SAME' padding would shift
the sampling grid.

Accumulation is always float32 (``preferred_element_type``) regardless of the
bf16/fp32 storage dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

DIMS = ("NHWC", "HWIO", "NHWC")


def gelu(x):
    """GELU matching torch nn.GELU (erf) to within output rounding.

    f32 compute uses the exact erf form (parity with the reference's
    torch default). bf16 compute uses the tanh approximation: its error is
    <= 4.8e-4 absolute (at x~2.7), below one bf16 ulp of the output there
    (~8e-3), so bf16 results differ from exact-erf-then-round by at most
    1 ulp — while erf costs ~1.7 ms per RepMixer stage on v5e (measured;
    tanh is as cheap as relu)."""
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


# Depthwise strategy: 'xla' lowers to a grouped conv; 'shift' decomposes a
# stride-1 depthwise conv into k*k shifted multiply-adds on the VPU (fuses
# into neighbouring elementwise work and avoids XLA's grouped-conv path).
_DW_STRATEGY = "xla"


def set_depthwise_strategy(name: str) -> None:
    global _DW_STRATEGY
    assert name in ("xla", "shift")
    _DW_STRATEGY = name


def _dw_shift(x, w, b, padding):
    k = w.shape[0]
    h, w_ = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), padding[0], padding[1], (0, 0)))
    acc = jnp.zeros(x.shape[:1] + (h + sum(padding[0]) - k + 1,
                                   w_ + sum(padding[1]) - k + 1, x.shape[3]),
                    jnp.float32)
    oh, ow = acc.shape[1], acc.shape[2]
    wf = w.astype(jnp.float32)
    for di in range(k):
        for dj in range(k):
            acc = acc + xp[:, di:di + oh, dj:dj + ow, :].astype(jnp.float32) \
                * wf[di, dj, 0, :]
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    return acc.astype(x.dtype)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv_f32acc(x, w, stride, padding, groups):
    """conv_general_dilated with f32 accumulation AND a working gradient
    under mixed precision: jax 0.9's transpose rule rejects the f32
    cotangent against bf16 operands ("requires arguments to have the same
    dtypes"), so the backward recomputes the VJP through an all-f32 conv
    (backward-only 2x bandwidth; training-path cost, inference unchanged)."""
    return lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=DIMS, feature_group_count=groups,
        preferred_element_type=jnp.float32)


def _conv_fwd(x, w, stride, padding, groups):
    return _conv_f32acc(x, w, stride, padding, groups), (x, w)


def _conv_bwd(stride, padding, groups, res, ct):
    x, w = res
    _, vjp = jax.vjp(
        lambda a, b: lax.conv_general_dilated(
            a, b, window_strides=stride, padding=padding,
            dimension_numbers=DIMS, feature_group_count=groups),
        x.astype(jnp.float32), w.astype(jnp.float32))
    dx, dw = vjp(ct.astype(jnp.float32))
    return dx.astype(x.dtype), dw.astype(w.dtype)


_conv_f32acc.defvjp(_conv_fwd, _conv_bwd)


def conv2d(x, w, b=None, *, stride=1, padding=None, groups=1):
    """NHWC conv. ``w`` is HWIO with I = C_in // groups.

    padding defaults to k//2 per side (torch-style 'same' for odd kernels).
    """
    k = w.shape[0]
    if padding is None:
        padding = k // 2
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    if isinstance(stride, int):
        stride = (stride, stride)

    depthwise_identity = (
        groups == x.shape[-1] and groups == w.shape[-1] and w.shape[2] == 1
    )
    if _DW_STRATEGY == "shift" and depthwise_identity and stride == (1, 1):
        return _dw_shift(x, w, b, padding)

    out = _conv_f32acc(x, w.astype(x.dtype), tuple(stride),
                       tuple(map(tuple, padding)), groups)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def conv_block(x, p, *, stride=1, groups=1, act=True, se=None):
    """Fused conv(+bias) -> optional SE gate -> optional exact GELU.

    This is the inference-time form of every reparameterized block in
    FastViTHD (MobileOneBlock / ReparamLargeKernelConv after fusion —
    reference mci.py:196-216, 443-451).
    """
    out = conv2d(x, p["w"], p.get("b"), stride=stride, groups=groups)
    if se is not None:
        out = se_gate(out, se)
    if act:
        out = gelu(out)
    return out


def se_gate(x, p):
    """Squeeze-excite: global-mean -> 1x1 reduce -> relu -> 1x1 expand -> sigmoid
    gate (reference mci.py:42-81 SEBlock)."""
    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
    z = conv2d(pooled.astype(x.dtype), p["reduce_w"], p["reduce_b"], padding=0)
    z = jax.nn.relu(z)
    z = conv2d(z, p["expand_w"], p["expand_b"], padding=0)
    return x * jax.nn.sigmoid(z.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x, scale, bias, eps=1e-5):
    """LayerNorm over the trailing (channel) axis, computed in float32.

    In NHWC this is exactly the reference's LayerNormChannel on NCHW
    (reference mci.py:606-623): normalize each spatial position over channels.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x, scale, eps=1e-6):
    """RMSNorm over trailing axis in float32 (Qwen2 decoder norm)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)
