"""Weight-only quantization: int8 and packed int4, per-output-channel scales.

The reference ships on-device quantization presets — 0.5B fp16, 1.5B int8,
7B int4 (README.md:68-70, via mlx-vlm convert -q). TPU equivalent: decoder
matmul weights stored as int8/int4 with float scales, dequantized inside the
matmul. On this platform int8 is the SPEED format (W8A8 prefill rides the
MXU's 2x int8 path; weight-only int8 halves the b1 prefill weight read)
while int4 is a MEMORY format only — the nibble unpack defeats operand
fusion and measures 5x slower than int8 at 7B b1 (docs/PERF.md int4
section), so use it for fitting/export, not latency.

A quantized linear param dict is {"w_q": int8, "scale": f32 (..., cout),
"b"?: float}. int4 packs two values per byte along cin, so the format is
inferred from shapes at the call site (w_q cin == x cin -> int8; half -> int4)
— keeping every leaf an array so stacked-layer dicts stay lax.scan-able.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _quantize_array(w: jnp.ndarray, bits: int):
    """w (..., cin, cout) -> (w_q int8 (..., cin', cout), scale (..., cout)).

    Pure jnp: runs on host or device, and traces under jax.eval_shape/jit."""
    qmax = 127.0 if bits == 8 else 7.0
    w = w.astype(jnp.float32)
    scale = jnp.abs(w).max(axis=-2) / qmax              # (..., cout)
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -qmax - 1, qmax)
    q = q.astype(jnp.int8)
    if bits == 8:
        return q, scale.astype(jnp.float32)
    if q.shape[-2] % 2:
        pad = [(0, 0)] * (q.ndim - 2) + [(0, 1), (0, 0)]
        q = jnp.pad(q, pad)
    low = q[..., 0::2, :] & 0x0F
    high = (q[..., 1::2, :] & 0x0F) << 4
    return (low | high).astype(jnp.int8), scale.astype(jnp.float32)


def quantize_linear(p: Dict[str, Any], bits: int = 8,
                    act_quant: bool = False) -> Dict[str, Any]:
    """{"w": (..., cin, cout) float, "b"?} -> {"w_q", "scale", "b"?}.

    act_quant=True marks the linear for W8A8 execution (dynamic per-token
    int8 activations -> int8xint8 MXU dot, ~2.2x bf16 FLOP throughput on
    v5e — see docs/PERF.md). The marker is an array leaf shaped to follow
    the stacked-layer leading axes so lax.scan can slice it."""
    w_q, scale = _quantize_array(jnp.asarray(p["w"]), bits)
    out: Dict[str, Any] = {"w_q": w_q, "scale": scale}
    if act_quant:
        out["a8"] = jnp.ones(scale.shape[:-1] + (1,), jnp.int8)
    if "b" in p:
        out["b"] = p["b"]
    for k in ("lora_a", "lora_b", "lora_scale"):  # QLoRA: adapters ride on
        if k in p:                                # the quantized base
            out[k] = p[k]
    return out


def is_quantized(p: Any) -> bool:
    return isinstance(p, dict) and "w_q" in p


def _unpack_int4(w_q: jnp.ndarray, cin: int) -> jnp.ndarray:
    """(..., cin/2, cout) packed -> (..., cin, cout) int8 in [-8, 7]."""
    low = (w_q << 4).astype(jnp.int8) >> 4   # sign-extend low nibble
    high = w_q >> 4                           # arithmetic shift -> high nibble
    stacked = jnp.stack([low, high], axis=-2)  # (..., half, 2, cout)
    shape = w_q.shape[:-2] + (w_q.shape[-2] * 2, w_q.shape[-1])
    return stacked.reshape(shape)[..., :cin, :]


def unpacked_weight(p: Dict[str, Any], cin: int) -> jnp.ndarray:
    """int8 weight matrix (..., cin, cout), unpacking int4 if needed."""
    w_q = p["w_q"]
    if w_q.shape[-2] == cin:
        return w_q
    return _unpack_int4(w_q, cin)


def dequantize(p: Dict[str, Any], cin: int) -> jnp.ndarray:
    return unpacked_weight(p, cin).astype(jnp.float32) * p["scale"][..., None, :]


def quantized_matmul(x: jnp.ndarray, p: Dict[str, Any]) -> jnp.ndarray:
    """x (..., cin) @ dequant(w) + b; f32 accumulation, per-cout scales on
    the output (exact for per-channel weight-only quantization).

    With the "a8" marker (quantize_linear(act_quant=True)): dynamic
    per-token symmetric int8 activation quantization and an int8 x int8 ->
    int32 dot — the MXU's 2x-rate integer path. Output = int32 accumulator
    * x_scale (per token) * w_scale (per channel)."""
    w = unpacked_weight(p, x.shape[-1])
    if "a8" in p:
        xf = x.astype(jnp.float32)
        x_scale = jnp.abs(xf).max(axis=-1, keepdims=True) / 127.0
        x_scale = jnp.where(x_scale == 0, 1.0, x_scale)
        x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
        acc = jnp.einsum("...d,df->...f", x_q, w,
                         preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * x_scale * p["scale"]
    else:
        out = jnp.einsum("...d,df->...f", x, w.astype(x.dtype),
                         preferred_element_type=jnp.float32)
        out = out * p["scale"]
    if "b" in p:
        out = out + p["b"].astype(jnp.float32)
    return out.astype(x.dtype)


def quantize_decoder(params: Dict[str, Any], bits: int = 8,
                     skip: tuple = (), act_quant: bool = False) -> Dict[str, Any]:
    """Quantize every linear in a (stacked-layer) decoder param tree.

    Embeddings and norms stay full precision (the embed doubles as the tied
    LM head). Stacked (L, cin, cout) weights quantize per layer+channel.
    act_quant=True additionally runs those linears W8A8 (int8 MXU)."""
    out = dict(params)
    qlayers = {}
    for name, sub in params["layers"].items():
        if name.startswith("ln") or name in skip or not (
                isinstance(sub, dict) and "w" in sub):
            qlayers[name] = sub
        else:
            qlayers[name] = quantize_linear(sub, bits, act_quant=act_quant)
    out["layers"] = qlayers
    if "lm_head" in params and "lm_head" not in skip:
        out["lm_head"] = quantize_linear(params["lm_head"], bits,
                                         act_quant=act_quant)
    return out
