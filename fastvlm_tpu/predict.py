"""Single-image inference CLI — drop-in equivalent of the reference predict.py.

Same flags (--model-path/--image-file/--prompt/--conv-mode/--temperature/
--top_p), same prompt construction (DEFAULT_IMAGE_TOKEN + '\\n' + prompt under
the qwen_2 template, reference predict.py:33-42), same preprocessing, but the
whole encode->prefill->decode path is one jitted TPU program.

Extra TPU-side knobs:
  --random-weights   smoke mode: random params + byte tokenizer (no checkpoint)
  --max-new-tokens   generation cap (reference hardcodes 256)
  --timing           print TTFT / decode tok/s to stderr

Usage:
  python -m fastvlm_tpu.predict --model-path ckpts/llava-fastvithd_0.5b_stage3 \
      --image-file img.jpg --prompt "Describe the image."
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_prompt(user_prompt: str, conv_mode: str = "qwen_2",
                 use_im_start_end: bool = False) -> str:
    from fastvlm_tpu.data.constants import (
        DEFAULT_IM_END_TOKEN, DEFAULT_IM_START_TOKEN, DEFAULT_IMAGE_TOKEN)
    from fastvlm_tpu.data.conversation import conv_templates

    if use_im_start_end:
        qs = (DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN
              + DEFAULT_IM_END_TOKEN + "\n" + user_prompt)
    else:
        qs = DEFAULT_IMAGE_TOKEN + "\n" + user_prompt
    conv = conv_templates[conv_mode].copy()
    conv.append_message(conv.roles[0], qs)
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", type=str, default=None)
    parser.add_argument("--image-file", type=str, default=None)
    parser.add_argument("--prompt", type=str, default="Describe the image.")
    parser.add_argument("--conv-mode", type=str, default="qwen_2")
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--top_p", type=float, default=None)
    parser.add_argument("--num_beams", type=int, default=1)
    parser.add_argument("--spec-decode", action="store_true",
                        help="prompt-lookup speculative decoding (greedy "
                             "only; same tokens, fewer device steps — "
                             "extension beyond the reference CLI)")
    parser.add_argument("--draft-k", type=int, default=8,
                        help="speculative draft length (with --spec-decode)")
    parser.add_argument("--max-new-tokens", type=int, default=256)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--random-weights", action="store_true",
                        help="smoke mode: tiny random model, byte tokenizer")
    parser.add_argument("--timing", action="store_true")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree (decoder sharded over "
                             "a (1, tp) mesh; 7B bf16 needs tp >= 2)")
    parser.add_argument("--verify-checkpoint", action="store_true",
                        help="audit --model-path instead of generating: "
                             "key-map completeness (every state-dict key "
                             "consumed), per-stage encoder stats, and the "
                             "1e-3 golden comparison when --goldens is given")
    parser.add_argument("--goldens", type=str, default=None,
                        help=".npz with 'input'/'features' arrays produced "
                             "by the reference encoder")
    args = parser.parse_args(argv)

    from fastvlm_tpu.engine import build_engine
    from fastvlm_tpu.ops.sampling import SamplingParams

    if args.verify_checkpoint:
        if not args.model_path:
            parser.error("--verify-checkpoint requires --model-path")
        from fastvlm_tpu.utils.checkpoint import verify_checkpoint

        report = verify_checkpoint(args.model_path, args.goldens)
        print(json.dumps(report, indent=2))
        ok = (not report["unused_keys"]
              and report["features_finite"]
              and report.get("golden_pass_1e-3", True))
        print(("PASS" if ok else "FAIL"), file=sys.stderr)
        return 0 if ok else 1

    # Route through the Engine: Engine.prepare handles pad AND anyres
    # checkpoints (tile stacks + merged token counts); calling vlm.generate
    # directly would mis-splice anyres tile batches (ADVICE r1).
    mesh = None
    if args.tp > 1:
        import jax

        from fastvlm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=1, tp=args.tp, devices=jax.devices()[:args.tp])
    if args.random_weights:
        engine = build_engine(random_tiny=True, conv_mode=args.conv_mode,
                              mesh=mesh)
    else:
        if not args.model_path:
            parser.error("--model-path required (or use --random-weights)")
        engine = build_engine(args.model_path, dtype=args.dtype,
                              conv_mode=args.conv_mode, mesh=mesh)
    cfg = engine.cfg

    prompt = build_prompt(args.prompt, args.conv_mode)

    if args.image_file:
        from PIL import Image

        image = Image.open(args.image_file).convert("RGB")
    else:
        # blank image (keeps the CLI usable for smoke tests without a file)
        image = np.zeros(
            (cfg.vision.image_size, cfg.vision.image_size, 3), np.float32)

    sampling = SamplingParams(
        temperature=args.temperature if args.temperature > 0 else 0.0,
        top_p=args.top_p if args.top_p else 1.0,
    )

    t0 = time.perf_counter()
    if args.num_beams > 1:
        # beam decode is deterministic (the reference's HF generate also
        # ignores sampling when beams are used without do_sample)
        text, stats = engine.generate_beam(
            prompt, image, num_beams=args.num_beams,
            max_new_tokens=args.max_new_tokens)
    elif args.spec_decode:
        if sampling.temperature > 0:
            parser.error("--spec-decode is greedy-only; use --temperature 0")
        text, stats = engine.generate_spec(
            prompt, image, max_new_tokens=args.max_new_tokens,
            draft_k=args.draft_k)
    else:
        text, stats = engine.generate(
            prompt, image, max_new_tokens=args.max_new_tokens,
            sampling=sampling)
    elapsed = time.perf_counter() - t0
    print(text.strip())

    if args.timing:
        print(json.dumps({
            "total_s": round(elapsed, 3),
            "ttft_ms": stats.get("ttft_ms"),
            "tokens": stats.get("decode_tokens"),
            "tok_per_s": stats.get("tok_per_s"),
        }), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
