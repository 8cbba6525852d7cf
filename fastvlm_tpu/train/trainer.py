"""Training loop: dataloading, sharded steps, Orbax checkpointing, resume.

The TPU-native replacement for the reference's HF Trainer + DeepSpeed stack
(llava/train/llava_trainer.py, train_qwen.py): same observable behaviors —
length/modality-grouped sampling, per-module LRs + freeze policy (in
train/step.py), auto-resume from the latest checkpoint (train_qwen.py:
1224-1227), adapter-only checkpoints when tuning just the projector
(llava_trainer.py:244-265) — but sharding comes from the (data, model) mesh
+ NamedShardings instead of ZeRO/FSDP, and checkpoints are Orbax (sharded,
async-capable) instead of torch.save.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from dataclasses import dataclass
from typing import Any, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastvlm_tpu.config import FastVLMConfig
from fastvlm_tpu.data.sft import SupervisedDataset, collate
from fastvlm_tpu.train import step as step_mod
from fastvlm_tpu.train.sampler import LengthGroupedSampler

logger = logging.getLogger(__name__)


@dataclass
class TrainingArguments:
    output_dir: str = "./checkpoints/run"
    num_epochs: int = 1
    batch_size: int = 4
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    save_steps: int = 500
    log_steps: int = 10
    seed: int = 0
    lora_enable: bool = False
    lora_r: int = 8
    lora_alpha: float = 16.0
    bits: Optional[int] = None  # 4/8: freeze an int-quantized decoder base
    #                             under the LoRA adapters (QLoRA; reference
    #                             train_qwen.py:1050-1067 + 1113-1129)
    zero1: bool = False  # shard optimizer state over the data axis
    group_by_modality_length: bool = False
    tune_mm_mlp_adapter: bool = False   # adapter-only training + checkpoints
    freeze_mm_mlp_adapter: bool = False
    unfreeze_mm_vision_tower: bool = False
    mm_projector_lr: Optional[float] = None
    mm_vision_tower_lr: Optional[float] = None
    grad_clip: float = 1.0
    max_steps: Optional[int] = None


def batches(dataset: SupervisedDataset, sampler: LengthGroupedSampler,
            batch_size: int, num_image_tokens: int,
            cfg=None) -> Iterator[Dict[str, np.ndarray]]:
    if cfg is not None and getattr(dataset, "_anyres", False):
        yield from _anyres_batches(dataset, sampler, batch_size, cfg)
        return
    buf: List[Any] = []
    for idx in sampler:
        buf.append(dataset[idx])
        if len(buf) == batch_size:
            yield collate(buf, num_image_tokens)
            buf = []
    # drop ragged tail (static shapes)


def _anyres_batches(dataset: SupervisedDataset, sampler, batch_size: int,
                    cfg) -> Iterator[Dict[str, np.ndarray]]:
    """Grid-uniform anyres batching: samples bucket by their static merge
    key (grid_shape, crop_box) — read from the image HEADER, no pixel
    decode — so each batch stacks tiles to one (B, T, S, S, 3) array and
    train_step compiles once per distinct grid (anyres-as-long-context,
    the same static-shape discipline as the inference path; the reference
    instead pads ragged token rows dynamically, train_qwen.py:994-1026)."""
    from fastvlm_tpu.models.vlm import anyres_crop_box

    buckets: dict = {}
    for idx in sampler:
        meta = dataset.anyres_meta(idx)
        grid_shape, original_size = meta
        key = (grid_shape, anyres_crop_box(cfg, grid_shape, original_size))
        buf = buckets.setdefault(key, [])
        buf.append(idx)
        if len(buf) == batch_size:
            yield collate([dataset[i] for i in buf], cfg.num_image_tokens,
                          cfg=cfg)
            buckets[key] = []
    # ragged per-grid tails are dropped (static shapes)


class Trainer:
    def __init__(self, cfg: FastVLMConfig, params: Any,
                 dataset: SupervisedDataset, args: TrainingArguments,
                 mesh=None, pp_micro=None, seq_parallel=False):
        self.cfg = cfg
        self.args = args
        self.dataset = dataset
        self.mesh = mesh
        # parallel schedule: pipeline microbatches (decoder staged over the
        # model axis) or sequence-parallel activations; default plain dp/tp
        self.pp_micro = pp_micro
        self._seq_sharding = None
        if seq_parallel and mesh is not None:
            from fastvlm_tpu.parallel.mesh import seq_sharding

            self._seq_sharding = seq_sharding(mesh)

        steps_per_epoch = len(dataset) // args.batch_size
        total = args.max_steps or max(steps_per_epoch * args.num_epochs, 1)
        self.total_steps = total

        if args.bits and not args.lora_enable:
            raise ValueError("--bits trains a frozen quantized base and "
                             "needs --lora-enable (QLoRA); a full fine-tune "
                             "of int weights is not meaningful")
        if args.lora_enable:
            from fastvlm_tpu.train import lora

            params = dict(params)
            dec = params["decoder"]
            if args.bits:
                # QLoRA: int8/int4 frozen base (embeddings/norms/lm_head
                # stay float — the reference keeps lm_head out of kbit too)
                from fastvlm_tpu.ops.quant import quantize_decoder

                dec = quantize_decoder(dec, bits=args.bits,
                                       skip=("lm_head",))
            params["decoder"] = lora.add_lora(
                dec, jax.random.PRNGKey(args.seed),
                r=args.lora_r, alpha=args.lora_alpha, cfg=cfg.decoder)
            self.tx = lora.make_lora_optimizer(
                params, lr=args.learning_rate,
                weight_decay=args.weight_decay, grad_clip=args.grad_clip)
            self.state = step_mod.make_train_state(params, self.tx)
            self.sampler = LengthGroupedSampler(
                dataset.modality_lengths if args.group_by_modality_length
                else dataset.lengths,
                args.batch_size,
                group_by_modality=args.group_by_modality_length,
                seed=args.seed)
            return

        self.tx = step_mod.make_optimizer(
            args.learning_rate,
            weight_decay=args.weight_decay,
            warmup_steps=int(args.warmup_ratio * total),
            total_steps=total,
            projector_lr=args.mm_projector_lr,
            vision_lr=args.mm_vision_tower_lr,
            freeze_vision=not args.unfreeze_mm_vision_tower,
            freeze_decoder=args.tune_mm_mlp_adapter,
            grad_clip=args.grad_clip,
        )
        if args.freeze_mm_mlp_adapter:
            self.tx = step_mod.make_optimizer(
                args.learning_rate, weight_decay=args.weight_decay,
                warmup_steps=int(args.warmup_ratio * total), total_steps=total,
                freeze_vision=not args.unfreeze_mm_vision_tower,
                freeze_decoder=args.tune_mm_mlp_adapter,
                freeze_projector=True,
                grad_clip=args.grad_clip,
            )
        self.state = step_mod.make_train_state(params, self.tx)
        if args.zero1 and mesh is not None:
            from fastvlm_tpu.parallel.sharding import shard_opt_state_zero1

            self.state = self.state._replace(
                opt_state=shard_opt_state_zero1(self.state.opt_state, mesh))
        self.sampler = LengthGroupedSampler(
            dataset.modality_lengths if args.group_by_modality_length
            else dataset.lengths,
            args.batch_size,
            group_by_modality=args.group_by_modality_length,
            seed=args.seed,
        )

    # ---------------- checkpointing ----------------

    def _ckpt_dir(self, step: int) -> str:
        return os.path.join(os.path.abspath(self.args.output_dir),
                            f"checkpoint-{step}")

    def latest_checkpoint(self) -> Optional[str]:
        out = os.path.abspath(self.args.output_dir)
        if not os.path.isdir(out):
            return None
        steps = []
        for d in os.listdir(out):
            if d.startswith("checkpoint-") and d[11:].isdigit():
                steps.append(int(d[11:]))
        return self._ckpt_dir(max(steps)) if steps else None

    def save(self, step: int) -> None:
        import orbax.checkpoint as ocp

        path = self._ckpt_dir(step)
        if self.args.lora_enable:
            # LoRA split save (reference train_qwen.py:1232-1242)
            from fastvlm_tpu.train import lora

            with ocp.StandardCheckpointer() as ck:
                ck.save(os.path.join(path, "lora_adapters"),
                        lora.split_lora_state(self.state.params["decoder"]),
                        force=True)
            logger.info("saved LoRA adapters %s", path)
            return
        if self.args.tune_mm_mlp_adapter:
            # adapter-only checkpoint (reference llava_trainer.py:244-265)
            with ocp.StandardCheckpointer() as ck:
                ck.save(os.path.join(path, "mm_projector"),
                        self.state.params["projector"], force=True)
        else:
            with ocp.StandardCheckpointer() as ck:
                ck.save(os.path.join(path, "params"), self.state.params,
                        force=True)
                # full checkpoints also carry optimizer state so resume
                # continues the schedule/moments (HF Trainer behavior)
                ck.save(os.path.join(path, "opt_state"),
                        self.state.opt_state, force=True)
        logger.info("saved checkpoint %s", path)

    def resume(self) -> int:
        """Auto-resume from latest checkpoint-* (reference train_qwen.py:1224-1227)."""
        import orbax.checkpoint as ocp

        path = self.latest_checkpoint()
        if path is None:
            return 0
        step = int(os.path.basename(path).split("-")[1])
        with ocp.StandardCheckpointer() as ck:
            if self.args.lora_enable:
                from fastvlm_tpu.train import lora

                dec = self.state.params["decoder"]
                adapters = ck.restore(
                    os.path.join(path, "lora_adapters"),
                    lora.split_lora_state(dec))
                layers = dict(dec["layers"])
                for name, leaf in adapters.items():
                    layers[name] = {**layers[name], **leaf}
                params = dict(self.state.params)
                params["decoder"] = {**dec, "layers": layers}
            elif self.args.tune_mm_mlp_adapter:
                proj = ck.restore(os.path.join(path, "mm_projector"),
                                  self.state.params["projector"])
                params = dict(self.state.params)
                params["projector"] = proj
            else:
                params = ck.restore(os.path.join(path, "params"),
                                    self.state.params)
                opt_path = os.path.join(path, "opt_state")
                if os.path.isdir(opt_path):
                    opt_state = ck.restore(opt_path, self.state.opt_state)
                    self.state = self.state._replace(opt_state=opt_state)
        self.state = self.state._replace(params=params,
                                         step=jnp.int32(step))
        logger.info("resumed from %s (step %d)", path, step)
        return step

    # ---------------- loop ----------------

    def train(self) -> Dict[str, float]:
        args = self.args
        start_step = self.resume()
        step = start_step
        last_loss = float("nan")
        t0 = time.time()
        # with max_steps set, keep cycling epochs until the step budget is
        # spent (the reference's HF Trainer max_steps semantics)
        epoch = 0
        while step < self.total_steps:
            if args.max_steps is None and epoch >= args.num_epochs:
                break
            epoch += 1
            for batch in batches(self.dataset, self.sampler, args.batch_size,
                                 self.cfg.num_image_tokens, cfg=self.cfg):
                if step >= self.total_steps:
                    break
                # anyres merge meta is a STATIC jit key (grid_shape,
                # crop_box), not batch data — pop before array conversion
                anyres = batch.pop("_anyres", None)
                jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
                if self.pp_micro:
                    if anyres is not None:
                        raise ValueError(
                            "anyres training composes with dp/tp/sp but not "
                            "--pp-micro (loss_fn_pp has no tile path); drop "
                            "--pp-micro or use image_aspect_ratio=pad")
                    self.state, loss = step_mod.train_step_pp(
                        self.state, self.cfg, self.tx, jbatch, self.mesh,
                        self.pp_micro)
                else:
                    self.state, loss = step_mod.train_step(
                        self.state, self.cfg, self.tx, jbatch,
                        seq_sharding=self._seq_sharding, anyres=anyres)
                step += 1
                if step % args.log_steps == 0 or step == self.total_steps:
                    last_loss = float(np.asarray(loss))
                    logger.info("step %d/%d loss %.4f (%.2f s/step)",
                                step, self.total_steps, last_loss,
                                (time.time() - t0) / max(step - start_step, 1))
                if args.save_steps and step % args.save_steps == 0:
                    self.save(step)
        if np.isnan(last_loss) and step > start_step:
            last_loss = float(np.asarray(loss))
        self.save(step)
        return {"final_loss": last_loss, "steps": step}
