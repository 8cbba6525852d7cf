"""Model export: compiled vision encoder + quantized serving bundles.

TPU-native equivalent of the reference's export story (model_export/):
  * export_vision_encoder.py (torch.jit.trace -> CoreML mlprogram,
    :70-100)  ->  here: jax.export -> serialized StableHLO of the jitted
    encoder, plus the same metadata sidecars (preprocessor_config.json /
    processor_config.json with patch_size and the image token,
    export_vision_encoder.py:29-68).
  * mlx-vlm ``convert --only-llm -q`` quantization presets (0.5B fp16,
    1.5B int8, 7B int4 — README.md:68-70)  ->  here: weight-only int8/int4
    decoder quantization (ops/quant.py) saved as a native Orbax bundle.

CLI:
  python -m fastvlm_tpu.export vision --model-path CKPT --output DIR
  python -m fastvlm_tpu.export quantize --model-path CKPT --bits 8 --output DIR
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional


def write_metadata(output_dir: str, image_size: int, patch_size: int = 64):
    """Sidecar configs matching the reference exporter
    (export_vision_encoder.py:29-68)."""
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "preprocessor_config.json"), "w") as f:
        json.dump({
            "crop_size": {"height": image_size, "width": image_size},
            "size": {"shortest_edge": image_size},
            "image_mean": [0.0, 0.0, 0.0],
            "image_std": [1.0, 1.0, 1.0],
            "do_normalize": True,
            "do_resize": True,
            "do_center_crop": True,
            "do_rescale": True,
            "rescale_factor": 1.0 / 255,
            "image_processor_type": "CLIPImageProcessor",
            "processor_class": "LlavaProcessor",
        }, f, indent=2)
    with open(os.path.join(output_dir, "processor_config.json"), "w") as f:
        json.dump({
            "image_token": "<image>",
            "num_additional_image_tokens": 0,
            "patch_size": patch_size,
            "processor_class": "LlavaProcessor",
        }, f, indent=2)


def export_vision_encoder(cfg, vision_params, output_dir: str,
                          batch: int = 1) -> str:
    """Serialize the jitted FastViTHD encoder as StableHLO. Portable across
    JAX/XLA runtimes (PJRT), the TPU analogue of a traced CoreML program."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from fastvlm_tpu.config import resolve_dtype
    from fastvlm_tpu.models import fastvit

    vcfg = cfg.vision
    dtype = resolve_dtype(vcfg.compute_dtype)

    def encode(params, images):
        return fastvit.apply(params, images, vcfg)

    spec = jax.ShapeDtypeStruct(
        (batch, vcfg.image_size, vcfg.image_size, 3), dtype)
    pspec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), vision_params)
    exported = jexport.export(jax.jit(encode))(pspec, spec)

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "fastvithd.stablehlo")
    with open(path, "wb") as f:
        f.write(exported.serialize())
    write_metadata(output_dir, vcfg.image_size, vcfg.total_stride)

    from fastvlm_tpu.utils.checkpoint import save_native

    save_native(os.path.join(output_dir, "vision_params"), vision_params)
    return path


def load_exported_encoder(path: str):
    """Deserialize and return a callable (params, images) -> features."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def quantize_checkpoint(cfg, params, bits: int, output_dir: str) -> None:
    """Quantize the decoder and save a native serving bundle."""
    from fastvlm_tpu.ops.quant import quantize_decoder
    from fastvlm_tpu.utils.checkpoint import save_native

    qparams = dict(params)
    qparams["decoder"] = quantize_decoder(params["decoder"], bits)
    os.makedirs(output_dir, exist_ok=True)
    save_native(os.path.join(output_dir, "params"), qparams)
    with open(os.path.join(output_dir, "quantization.json"), "w") as f:
        json.dump({"bits": bits, "scheme": "weight-only per-channel",
                   "quantized": ["decoder.layers.*", "decoder.lm_head"]}, f)


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    pv = sub.add_parser("vision")
    pv.add_argument("--model-path", required=True)
    pv.add_argument("--output", required=True)
    pv.add_argument("--batch", type=int, default=1)
    pv.add_argument("--dtype", default="float32")

    pq = sub.add_parser("quantize")
    pq.add_argument("--model-path", required=True)
    pq.add_argument("--output", required=True)
    pq.add_argument("--bits", type=int, default=8, choices=[4, 8])
    pq.add_argument("--dtype", default="float32")
    args = parser.parse_args(argv)

    from fastvlm_tpu.config import resolve_dtype
    from fastvlm_tpu.utils.checkpoint import load_vlm

    cfg, params = load_vlm(args.model_path, dtype=resolve_dtype(args.dtype))
    if args.cmd == "vision":
        path = export_vision_encoder(cfg, params["vision"], args.output,
                                     args.batch)
        print(f"exported {path}")
    else:
        quantize_checkpoint(cfg, params, args.bits, args.output)
        print(f"quantized ({args.bits}-bit) -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
