"""SFT training driver CLI — the TPU equivalent of the reference's
llava/train/train_qwen.py ``train()``.

Wires: checkpoint/config load (or random init for dry runs) -> dataset ->
freeze policy -> mesh sharding -> Trainer loop with Orbax save/resume.

Example:
  python -m fastvlm_tpu.train.train_sft \
      --model-path ckpts/llava-fastvithd_0.5b_stage2 \
      --data-path data/sft.json --image-folder data/images \
      --output-dir ckpts/run1 --batch-size 8 --tp 1
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    parser = argparse.ArgumentParser()
    # model
    parser.add_argument("--model-path", default=None)
    parser.add_argument("--random-tiny", action="store_true",
                        help="random tiny model (pipeline dry runs)")
    parser.add_argument("--dtype", default="float32")
    # data
    parser.add_argument("--data-path", required=True)
    parser.add_argument("--image-folder", default=None)
    parser.add_argument("--image-aspect-ratio", default="pad")
    parser.add_argument("--conv-version", default="qwen_2")
    parser.add_argument("--max-len", type=int, default=2048)
    # training
    parser.add_argument("--output-dir", default="./checkpoints/run")
    parser.add_argument("--num-epochs", type=int, default=1)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--learning-rate", type=float, default=2e-5)
    parser.add_argument("--warmup-ratio", type=float, default=0.03)
    parser.add_argument("--save-steps", type=int, default=500)
    parser.add_argument("--log-steps", type=int, default=10)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--group-by-modality-length", action="store_true")
    parser.add_argument("--tune-mm-mlp-adapter", action="store_true")
    parser.add_argument("--freeze-mm-mlp-adapter", action="store_true")
    parser.add_argument("--unfreeze-mm-vision-tower", action="store_true")
    parser.add_argument("--mm-projector-lr", type=float, default=None)
    parser.add_argument("--mm-vision-tower-lr", type=float, default=None)
    parser.add_argument("--lora-enable", action="store_true")
    parser.add_argument("--lora-r", type=int, default=8)
    parser.add_argument("--lora-alpha", type=float, default=16.0)
    parser.add_argument("--bits", type=int, default=None, choices=[4, 8],
                        help="QLoRA: freeze an int4/int8-quantized decoder "
                             "base under the LoRA adapters (fits 7B "
                             "fine-tuning on one 16 GB chip)")
    # parallelism
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--sp", action="store_true",
                        help="sequence-parallel activations (T over the "
                             "model axis; requires --tp > 1)")
    parser.add_argument("--pp-micro", type=int, default=None,
                        help="pipeline-parallel decoder: stage layers over "
                             "the model axis (--tp = stages) and stream N "
                             "microbatches (GPipe)")
    parser.add_argument("--zero1", action="store_true",
                        help="shard optimizer state over the data axis")
    parser.add_argument("--fsdp", action="store_true",
                        help="fully shard params over the data axis")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed before device use")
    parser.add_argument("--coordinator", default=None,
                        help="coordinator host:port (omit on TPU pods — "
                             "autodetected from the pod metadata)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.multihost or args.coordinator:
        from fastvlm_tpu.parallel.distributed import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)

    from fastvlm_tpu.data.preprocessing import ByteTokenizer, ImageProcessor
    from fastvlm_tpu.data.sft import DataArguments, SupervisedDataset
    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.parallel import make_mesh, sharding
    from fastvlm_tpu.train.trainer import Trainer, TrainingArguments

    if args.random_tiny:
        from fastvlm_tpu.config import (
            FastViTConfig, FastVLMConfig, ProjectorConfig, Qwen2Config)

        vision = FastViTConfig(layers=(1, 1, 1, 1, 1),
                               embed_dims=(8, 16, 32, 64, 128),
                               image_size=128, attn_head_dim=16)
        decoder = Qwen2Config(vocab_size=258, hidden_size=64, num_layers=2,
                              num_heads=4, num_kv_heads=2, head_dim=16,
                              intermediate_size=128)
        # anyres tiny runs get a 128px tile grid so the anyres SFT path
        # (reference train_qwen.py:957-958) is exercisable without weights
        pins = (((128, 256), (256, 128), (256, 256))
                if args.image_aspect_ratio == "anyres" else None)
        cfg = FastVLMConfig(
            vision=vision, decoder=decoder,
            projector=ProjectorConfig(mm_hidden_size=vision.out_channels,
                                      hidden_size=64),
            image_aspect_ratio=args.image_aspect_ratio,
            image_grid_pinpoints=pins)
        params = vlm.init(jax.random.PRNGKey(0), cfg)
        tokenizer = ByteTokenizer()
    else:
        from transformers import AutoTokenizer

        from fastvlm_tpu.config import resolve_dtype
        from fastvlm_tpu.utils.checkpoint import load_vlm

        cfg, params = load_vlm(args.model_path,
                               dtype=resolve_dtype(args.dtype))
        tokenizer = AutoTokenizer.from_pretrained(args.model_path)

    if args.pp_micro and args.tp <= 1:
        parser.error("--pp-micro needs --tp > 1 (stages on the model axis)")
    mesh = None
    if args.tp > 1 or len(jax.devices()) > 1:
        mesh = make_mesh(tp=args.tp)
        if args.pp_micro:
            # pipeline layout: decoder layers staged on the model axis,
            # everything else replicated (parallel/pipeline.py)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from fastvlm_tpu.parallel.pipeline import shard_decoder_pipeline

            if cfg.decoder.num_layers % args.tp:
                parser.error(f"--pp-micro needs num_layers "
                             f"({cfg.decoder.num_layers}) divisible by "
                             f"--tp ({args.tp}) stages")
            from fastvlm_tpu.parallel.mesh import DATA_AXIS

            dp = mesh.shape[DATA_AXIS]
            if args.batch_size % args.pp_micro or \
                    (args.batch_size // args.pp_micro) % dp:
                parser.error(
                    f"--pp-micro: batch {args.batch_size} must split into "
                    f"{args.pp_micro} microbatches divisible by dp={dp}")
            params = dict(params)
            params["decoder"] = shard_decoder_pipeline(params["decoder"],
                                                       mesh)
            rep = NamedSharding(mesh, P())
            for k in list(params):
                if k != "decoder":
                    params[k] = jax.tree.map(
                        lambda x: jax.device_put(x, rep), params[k])
        elif args.fsdp:
            params = sharding.shard_vlm_fsdp(params, mesh)
        else:
            params = sharding.shard_vlm(params, cfg, mesh)

    data_args = DataArguments(
        data_path=args.data_path,
        image_folder=args.image_folder,
        image_aspect_ratio=args.image_aspect_ratio,
        image_grid_pinpoints=cfg.image_grid_pinpoints,
        conv_version=args.conv_version,
        max_len=args.max_len,
    )
    dataset = SupervisedDataset(
        data_args, tokenizer, ImageProcessor(cfg.vision.image_size))

    train_args = TrainingArguments(
        output_dir=args.output_dir,
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        warmup_ratio=args.warmup_ratio,
        save_steps=args.save_steps,
        log_steps=args.log_steps,
        max_steps=args.max_steps,
        group_by_modality_length=args.group_by_modality_length,
        tune_mm_mlp_adapter=args.tune_mm_mlp_adapter,
        freeze_mm_mlp_adapter=args.freeze_mm_mlp_adapter,
        unfreeze_mm_vision_tower=args.unfreeze_mm_vision_tower,
        mm_projector_lr=args.mm_projector_lr,
        mm_vision_tower_lr=args.mm_vision_tower_lr,
        lora_enable=args.lora_enable,
        lora_r=args.lora_r,
        lora_alpha=args.lora_alpha,
        bits=args.bits,
        zero1=args.zero1,
    )
    trainer = Trainer(cfg, params, dataset, train_args, mesh=mesh,
                      pp_micro=args.pp_micro, seq_parallel=args.sp)
    result = trainer.train()
    print(result)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
