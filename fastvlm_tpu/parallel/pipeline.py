"""Pipeline parallelism (GPipe schedule) over the stacked-layer decoder.

The decoder's parameters carry a stacked leading layer axis (lax.scan), so
pipeline staging is a pure data layout: shard that axis over the mesh's
"model" dimension (S stages of L/S layers each) and stream microbatches
through the stages with `ppermute` under `shard_map`. This is the
TPU-native form of the reference ecosystem's pipeline configs (DeepSpeed
stages): no process groups, no send/recv — one SPMD program where XLA
overlaps each stage's compute with the ring transfer of activations.

Schedule (classic GPipe, bubble fraction (S-1)/(M+S-1)):

    step t:  stage s applies its layers to microbatch (t - s), then the
             activations rotate one stage forward.

Every device computes at every step (off-schedule results are discarded),
which keeps the program free of data-dependent control flow — the XLA-
friendly formulation. Gradients flow through ppermute (differentiable), so
the same forward serves training.

Mean-loss note: microbatches are stacked on a leading axis; callers compute
the loss over the reassembled (M*b, T, V) logits, so padding/masking
semantics match the unpipelined step exactly.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastvlm_tpu.config import Qwen2Config
from fastvlm_tpu.models import qwen2
from fastvlm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def stage_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpecs placing each decoder layer-stack leaf on its pipeline
    stage (leading L axis over "model"); everything else replicated."""
    specs = {k: jax.tree.map(lambda _: P(), v)
             for k, v in params.items() if k != "layers"}
    specs["layers"] = jax.tree.map(lambda _: P(MODEL_AXIS), params["layers"])
    return specs


def shard_decoder_pipeline(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put the decoder tree with the stage layout (L axis sharded)."""
    specs = stage_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, P))


def forward_pipelined(
    params: Dict[str, Any],
    cfg: Qwen2Config,
    embeds: jnp.ndarray,     # (M, b, T, D) microbatched inputs
    positions: jnp.ndarray,  # (M, b, T)
    mask: jnp.ndarray,       # (M, b, T, T) bool
    mesh: Mesh,
    remat: bool = True,
) -> jnp.ndarray:
    """GPipe forward over the mesh's "model" axis; returns (M, b, T, D)
    final hidden states (post final-norm). Embedding lookup / logits stay
    outside (replicated, same as the unpipelined path). The microbatch
    batch dim b is sharded over the "data" axis — dp composes with pp.

    Requires cfg.num_layers % n_stages == 0 and b % dp == 0; the caller
    picks M (more microbatches -> smaller bubble). remat rematerializes
    each stage in backward (mirrors loss_fn's default)."""
    n_stages = mesh.shape[MODEL_AXIS]
    dp = mesh.shape[DATA_AXIS]
    assert cfg.num_layers % n_stages == 0, (
        f"{cfg.num_layers} layers not divisible by {n_stages} stages")
    assert embeds.shape[1] % dp == 0, (
        f"microbatch size {embeds.shape[1]} not divisible by dp={dp}")
    m = embeds.shape[0]

    def stage_apply(layers_local, x, pos, msk):
        """Run this device's L/S layers over one microbatch (no cache)."""
        cos, sin, bias, msk4 = qwen2.pos_terms(cfg, pos, msk)

        def body(carry, lp):
            h, _ = qwen2._layer(carry, lp, cfg, cos, sin, None, None, msk4,
                                None, True, bias)
            return h, None

        x, _ = lax.scan(body, x, layers_local)
        return x

    if remat:
        # recompute each stage in backward: the pipelined counterpart of
        # loss_fn's layer remat (train memory ~ one stage's activations)
        stage_apply = jax.checkpoint(stage_apply)

    def pp(layers_local, emb, pos, msk):
        # shard_map gives each device its (L/S, ...) stage and the FULL
        # replicated microbatch stack
        s_idx = lax.axis_index(MODEL_AXIS)
        b, t, d = emb.shape[1:]
        state = jnp.zeros((b, t, d), emb.dtype)
        out = jnp.zeros_like(emb)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        for step in range(m + n_stages - 1):
            inject = emb[step] if step < m else jnp.zeros((b, t, d), emb.dtype)
            x_in = jnp.where(s_idx == 0, inject, state)
            # every stage processes the microbatch scheduled for it at this
            # step: stage s holds microbatch (step - s); off-schedule slots
            # compute garbage that is simply never collected
            mb = jnp.clip(step - s_idx, 0, m - 1)
            x_out = stage_apply(layers_local, x_in, pos[mb], msk[mb])
            done_mb = step - (n_stages - 1)
            if 0 <= done_mb < m:
                take = (s_idx == n_stages - 1)
                out = out.at[done_mb].set(
                    jnp.where(take, x_out, out[done_mb]))
            state = lax.ppermute(x_out, MODEL_AXIS, perm)

        # results live on the last stage only -> one psum broadcasts them
        # (off-stage contributions are zero)
        out = jnp.where(s_idx == n_stages - 1, out, jnp.zeros_like(out))
        return lax.psum(out, MODEL_AXIS)

    import inspect

    kw = {}
    if "check_rep" in inspect.signature(shard_map).parameters:
        kw["check_rep"] = False  # legacy experimental API
    data = P(None, DATA_AXIS)  # (M, b, ...): microbatch rows over dp
    hidden = shard_map(
        pp, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(MODEL_AXIS), params["layers"]),
                  data, data, data),
        out_specs=data,
        **kw,
    )(params["layers"], embeds, positions, mask)

    return qwen2._norm(hidden, params["final_norm"], cfg)
