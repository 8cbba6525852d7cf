"""Named shardings for FastVLM parameter pytrees.

Tensor-parallel layout for the Qwen2 decoder (megatron-style, over the
"model" mesh axis):
  q/k/v projections  — shard the head (output) dim;
  o projection       — shard the input dim (row-parallel; XLA inserts the psum);
  gate/up            — shard intermediate (output) dim;
  down               — shard intermediate (input) dim;
  embed / lm_head    — shard the vocab dim;
  norms, biases on replicated dims — replicated.

The vision tower + projector are small (≲ 130M params even for the 7B model)
and stay replicated — encoding is DP-parallel across the batch. This mirrors
the design target in SURVEY.md §2.4 ("TPU-native equivalents to build").

Param pytrees carry a stacked leading layer axis (lax.scan), so every decoder
layer spec is prefixed with None for that axis.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastvlm_tpu.config import FastVLMConfig, Qwen2Config
from fastvlm_tpu.parallel.mesh import MODEL_AXIS


def decoder_specs(cfg: Qwen2Config) -> Dict[str, Any]:
    m = MODEL_AXIS
    col = {"w": P(None, None, m), "b": P(None, m)} if cfg.qkv_bias else {"w": P(None, None, m)}
    col_nobias = {"w": P(None, None, m)}
    row = {"w": P(None, m, None)}
    specs: Dict[str, Any] = {
        "embed": P(m, None),
        "final_norm": P(None),
        "layers": {
            "ln1": P(None, None),
            "q": dict(col),
            "k": dict(col),
            "v": dict(col),
            "o": dict(row),
            "ln2": P(None, None),
            "gate": dict(col_nobias),
            "up": dict(col_nobias),
            "down": dict(row),
        },
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = {"w": P(None, m)}
    return specs


def vlm_specs(cfg: FastVLMConfig, params: Any) -> Any:
    """Full-tree PartitionSpecs: decoder TP'd, everything else replicated
    (vision/projector/image_newline and any future top-level params)."""
    specs = {
        k: jax.tree.map(lambda _: P(), v)
        for k, v in params.items() if k != "decoder"
    }
    specs["decoder"] = decoder_specs(cfg.decoder)
    return specs


def fit_spec(x, spec: P, mesh: Mesh) -> P:
    """Drop mesh axes a leaf's dims can't honor (dim % axis_size != 0):
    real checkpoints shard fully (Qwen2 dims are all multiples of any sane
    tp), while tiny test configs silently replicate the offending leaf
    instead of raising — the GSPMD computation is identical either way."""
    dims = []
    for i, ax in enumerate(spec):
        if ax is None:
            dims.append(None)
            continue
        axes = ax if isinstance(ax, tuple) else (ax,)
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        dims.append(ax if x.shape[i] % size == 0 else None)
    return P(*dims)


def shard_vlm(params: Any, cfg: FastVLMConfig, mesh: Mesh) -> Any:
    """device_put the param tree with NamedShardings on the mesh."""
    specs = vlm_specs(cfg, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, fit_spec(x, s, mesh))),
        params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_vlm_fsdp(params: Any, mesh: Mesh, min_size: int = 2 ** 14) -> Any:
    """FSDP-style fully-sharded parameters (the reference wraps the tower for
    torch FSDP, llava_arch.py:61-68 / train_qwen.py:1168-1171; ZeRO-3 via
    DeepSpeed): every large param is sharded over the "data" axis on its
    largest divisible dim. GSPMD all-gathers just-in-time at each use site
    and reduce-scatters gradients — the XLA-native form of FSDP."""
    from fastvlm_tpu.parallel.mesh import DATA_AXIS

    dp = mesh.shape[DATA_AXIS]

    def shard_leaf(x):
        if not hasattr(x, "shape") or x.size < min_size:
            return jax.device_put(x, NamedSharding(mesh, P()))
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % dp == 0:
                spec = [None] * x.ndim
                spec[d] = DATA_AXIS
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(shard_leaf, params)


def shard_opt_state_zero1(opt_state: Any, mesh: Mesh) -> Any:
    """ZeRO-1-style optimizer-state sharding (SURVEY.md §2.4: the TPU
    equivalent of the reference's DeepSpeed ZeRO optimizer partitioning).

    Adam moments are as large as the params; with pure DP they are
    replicated. This shards every moment leaf whose leading axis divides the
    "data" axis across DP ranks — GSPMD inserts the gathers/scatters around
    the (elementwise) optimizer update. Scalars/counts stay replicated."""
    import numpy as np

    from fastvlm_tpu.parallel.mesh import DATA_AXIS

    dp = mesh.shape[DATA_AXIS]

    def shard_leaf(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return x
        if x.shape[0] % dp == 0 and x.shape[0] >= dp:
            spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(shard_leaf, opt_state)
