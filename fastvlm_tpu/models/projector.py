"""Multimodal projector (reference llava/model/multimodal_projector/builder.py:17-35).

FastVLM ships ``mlp2x_gelu``: Linear(3072 -> hidden) -> GELU -> Linear(hidden
-> hidden) (layer names confirmed by the Swift port, reference
app/FastVLM/FastVLM.swift:428-452). ``linear`` and ``identity`` are also
supported for parity with the builder's dispatch.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from fastvlm_tpu.config import ProjectorConfig, resolve_dtype
from fastvlm_tpu.ops.conv import gelu

Params = Dict[str, Any]


def init(key, cfg: ProjectorConfig) -> Params:
    dtype = resolve_dtype("float32")
    if cfg.projector_type == "identity":
        return {"layers": []}
    dims = [cfg.mm_hidden_size] + [cfg.hidden_size] * max(cfg.mlp_depth, 1)
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for k, cin, cout in zip(keys, dims[:-1], dims[1:]):
        layers.append({
            "w": (jax.random.normal(k, (cin, cout)) * 0.02).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
        })
    return {"layers": layers}


def apply(params: Params, x: jnp.ndarray, cfg: ProjectorConfig) -> jnp.ndarray:
    """x: (..., mm_hidden) -> (..., hidden). GELU between layers, none after last."""
    layers = params["layers"]
    for i, lp in enumerate(layers):
        if i > 0:
            x = gelu(x)
        x = (
            jnp.einsum("...d,df->...f", x, lp["w"].astype(x.dtype),
                       preferred_element_type=jnp.float32)
            + lp["b"].astype(jnp.float32)
        ).astype(x.dtype)
    return x
