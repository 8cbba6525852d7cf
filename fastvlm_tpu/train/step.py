"""SFT training step: multimodal forward + masked CE loss + optax update.

Replaces the reference's HF-Trainer forward/backward (train_qwen.py train())
with a single jitted step. The splice is the same static-shape overlay as
inference (ops/splice.py); labels carry IGNORE_INDEX(-100) on instruction
spans and image-placeholder slots, exactly like the reference's preprocessors
(train_qwen.py:284-888).

Freeze policy (reference train_qwen.py:1167-1202: tune adapter only / freeze
adapter / unfreeze tower) is expressed through optax.multi_transform label
routing in ``make_optimizer`` — frozen groups get ``optax.set_to_zero``.
Per-module LRs (mm_projector_lr / vision_tower_lr, llava_trainer.py:154-242)
map to per-group adamw transforms.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from fastvlm_tpu.config import FastVLMConfig, resolve_dtype
from fastvlm_tpu.models import qwen2, vlm

IGNORE_INDEX = -100


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Token-mean CE over positions where label != IGNORE_INDEX.

    logits: (B, T, V) float; labels: (B, T) int32 (already shifted by caller).
    """
    mask = labels != IGNORE_INDEX
    safe = jnp.where(mask, labels, 0)
    logits = logits.astype(jnp.float32)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    nll = (logz - gold) * mask
    return nll.sum() / jnp.maximum(mask.sum(), 1)


def loss_fn(
    params: Any,
    cfg: FastVLMConfig,
    batch: Dict[str, jnp.ndarray],
    remat: bool = True,
    seq_sharding=None,
    anyres=None,
) -> jnp.ndarray:
    """batch: images (B,H,W,3) | None, ids (B,T), labels (B,T),
    image_starts (B,), attn_lens (B,).

    seq_sharding: optional NamedSharding for (B, T, D) hidden states —
    sequence-parallel training (see qwen2.forward).

    anyres: static (grid_shape, crop_box) for anyres training batches
    (reference trains with image_aspect_ratio == 'anyres' via
    process_anyres_image, train_qwen.py:957-958). The batch then carries
    ``tiles`` (B, T, S, S, 3) — grid-uniform, so the tower runs one
    static-shape pass over B*T tiles and the spatial merge vmaps over the
    batch; gradients flow through tower + projector exactly like the
    single-image path."""
    vision_embeds = None
    if anyres is not None:
        grid_shape, crop_box = anyres
        tiles = batch["tiles"]
        b, t = tiles.shape[:2]
        grids = vlm.encode_tile_grids(
            params, cfg, tiles.reshape((b * t,) + tiles.shape[2:]))
        grids = grids.reshape((b, t) + grids.shape[1:])
        vision_embeds = jax.vmap(
            lambda g: vlm.merge_tile_grids(params, cfg, g, grid_shape,
                                           crop_box)[0])(grids)
    embeds = vlm._spliced_prompt_embeds(
        params, cfg, batch.get("images"), batch["ids"],
        batch["image_starts"], vision_embeds=vision_embeds)
    b, t, _ = embeds.shape
    positions = jnp.arange(t, dtype=jnp.int32)[None].repeat(b, 0)
    # causal mask restricted to real tokens (right padding)
    mask = qwen2.prefill_mask(batch["attn_lens"], t, t,
                              window=cfg.decoder.attn_window)
    hidden, _ = qwen2.forward(
        params["decoder"], cfg.decoder, embeds, positions, mask=mask,
        remat=remat, seq_sharding=seq_sharding)
    logits = qwen2.logits_from_hidden(params["decoder"], hidden, cfg.decoder)
    # next-token prediction: logits[t] predicts labels[t+1]
    return cross_entropy(logits[:, :-1], batch["labels"][:, 1:])


def make_optimizer(
    lr: float = 2e-5,
    *,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    warmup_steps: int = 0,
    total_steps: int = 10_000,
    projector_lr: Optional[float] = None,
    vision_lr: Optional[float] = None,
    freeze_vision: bool = True,
    freeze_decoder: bool = False,
    freeze_projector: bool = False,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    """Cosine-decay AdamW with per-module groups (reference
    llava_trainer.py:154-242) and freeze routing (train_qwen.py:1167-1202)."""

    def sched(peak):
        if warmup_steps:
            return optax.warmup_cosine_decay_schedule(
                0.0, peak, warmup_steps, max(total_steps, warmup_steps + 1))
        return optax.cosine_decay_schedule(peak, max(total_steps, 1))

    def adamw(peak):
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(sched(peak), b1=b1, b2=b2, weight_decay=weight_decay),
        )

    # explicit None checks: an explicit 0.0 LR must not fall back to lr
    transforms = {
        "decoder": optax.set_to_zero() if freeze_decoder else adamw(lr),
        "projector": optax.set_to_zero() if freeze_projector else adamw(
            projector_lr if projector_lr is not None else lr),
        "vision": optax.set_to_zero() if freeze_vision else adamw(
            vision_lr if vision_lr is not None else lr),
    }

    def labeler(params):
        # extra top-level params (e.g. image_newline for unpad merges) train
        # with the decoder group
        return {
            k: jax.tree.map(
                lambda _: k if k in transforms else "decoder", v)
            for k, v in params.items()
        }

    return optax.multi_transform(transforms, labeler)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _value_and_grad(fn):
    """value_and_grad over trees that may hold integer leaves (QLoRA: the
    frozen int8/int4 base under float LoRA adapters, reference
    train_qwen.py:1050-1067 + 1113-1129). Integer leaves get float0
    tangents (allow_int); we rewrite those to typed zeros so optax's
    set_to_zero/apply_updates can flow them (float0 supports no arithmetic)."""

    def wrapped(params, *args, **kw):
        val, grads = jax.value_and_grad(fn, allow_int=True)(
            params, *args, **kw)
        grads = jax.tree.map(
            lambda g, p: jnp.zeros_like(p)
            if g.dtype == jax.dtypes.float0 else g, grads, params)
        return val, grads

    return wrapped


def make_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.int32(0))


def loss_fn_pp(
    params: Any,
    cfg: FastVLMConfig,
    batch: Dict[str, jnp.ndarray],
    mesh,
    n_micro: int,
) -> jnp.ndarray:
    """Pipeline-parallel loss: decoder layers staged over the mesh's model
    axis (parallel/pipeline.py GPipe schedule); vision/projector/embedding
    stay replicated. Mathematically identical to loss_fn — only the
    collective layout differs."""
    from fastvlm_tpu.parallel import pipeline as pp

    embeds = vlm._spliced_prompt_embeds(
        params, cfg, batch.get("images"), batch["ids"], batch["image_starts"])
    b, t, d = embeds.shape
    assert b % n_micro == 0, f"batch {b} not divisible by {n_micro} microbatches"
    positions = jnp.arange(t, dtype=jnp.int32)[None].repeat(b, 0)
    mask = qwen2.prefill_mask(batch["attn_lens"], t, t,
                              window=cfg.decoder.attn_window)
    hidden = pp.forward_pipelined(
        params["decoder"], cfg.decoder,
        embeds.reshape(n_micro, -1, t, d),
        positions.reshape(n_micro, -1, t),
        mask.reshape(n_micro, -1, t, t), mesh)
    hidden = hidden.reshape(b, t, d)
    logits = qwen2.logits_from_hidden(params["decoder"], hidden, cfg.decoder)
    return cross_entropy(logits[:, :-1], batch["labels"][:, 1:])


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tx", "mesh", "n_micro"),
                   donate_argnums=(0,))
def train_step_pp(
    state: TrainState,
    cfg: FastVLMConfig,
    tx: optax.GradientTransformation,
    batch: Dict[str, jnp.ndarray],
    mesh,
    n_micro: int = 2,
) -> Tuple[TrainState, jnp.ndarray]:
    """One SGD step with the decoder pipelined over the model mesh axis.
    Layer params/grads/optimizer moments all live stage-local (L axis
    sharded) — use parallel.pipeline.shard_decoder_pipeline on the decoder
    tree before make_train_state."""
    loss, grads = _value_and_grad(loss_fn_pp)(
        state.params, cfg, batch, mesh, n_micro)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


@functools.partial(jax.jit, static_argnames=("cfg", "tx", "seq_sharding",
                                              "anyres"),
                   donate_argnums=(0,))
def train_step(
    state: TrainState,
    cfg: FastVLMConfig,
    tx: optax.GradientTransformation,
    batch: Dict[str, jnp.ndarray],
    seq_sharding=None,
    anyres=None,
) -> Tuple[TrainState, jnp.ndarray]:
    loss, grads = _value_and_grad(loss_fn)(
        state.params, cfg, batch, seq_sharding=seq_sharding, anyres=anyres)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss
