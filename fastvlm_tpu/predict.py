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
    parser.add_argument("--max-new-tokens", type=int, default=256)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--random-weights", action="store_true",
                        help="smoke mode: tiny random model, byte tokenizer")
    parser.add_argument("--timing", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fastvlm_tpu.engine import enable_compilation_cache

    enable_compilation_cache()

    from fastvlm_tpu.config import (
        FastViTConfig, FastVLMConfig, ProjectorConfig, Qwen2Config)
    from fastvlm_tpu.data.preprocessing import (
        ByteTokenizer, ImageProcessor, process_images, tokenizer_image_token)
    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.ops.sampling import SamplingParams
    from fastvlm_tpu.ops.splice import expand_image_ids, pad_batch

    if args.random_weights:
        vision = FastViTConfig(layers=(1, 1, 1, 1, 1),
                               embed_dims=(8, 16, 32, 64, 128),
                               image_size=256, attn_head_dim=16)
        decoder = Qwen2Config(vocab_size=258, hidden_size=64, num_layers=2,
                              num_heads=4, num_kv_heads=2, head_dim=16,
                              intermediate_size=128)
        cfg = FastVLMConfig(
            vision=vision, decoder=decoder,
            projector=ProjectorConfig(mm_hidden_size=vision.out_channels,
                                      hidden_size=64))
        params = vlm.init(jax.random.PRNGKey(0), cfg)
        tokenizer = ByteTokenizer()
        eos_ids = (tokenizer.eos_token_id,)
    else:
        if not args.model_path:
            parser.error("--model-path required (or use --random-weights)")
        from transformers import AutoTokenizer

        from fastvlm_tpu.utils.checkpoint import load_vlm

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
        cfg, params = load_vlm(args.model_path, dtype=dtype)
        tokenizer = AutoTokenizer.from_pretrained(args.model_path)
        eos = [tokenizer.eos_token_id]
        im_end = tokenizer.convert_tokens_to_ids("<|im_end|>")
        unk = getattr(tokenizer, "unk_token_id", None)
        if im_end is not None and im_end not in (tokenizer.eos_token_id, unk):
            eos.append(im_end)
        eos_ids = tuple(i for i in eos if i is not None)

    prompt = build_prompt(args.prompt, args.conv_mode)
    ids = tokenizer_image_token(prompt, tokenizer)
    row, start = expand_image_ids(ids, cfg.num_image_tokens)
    bucket = round_up(len(row) + 1, 64)
    ids_arr, lens, starts = pad_batch([row], [start], bucket)

    if args.image_file:
        from PIL import Image

        image = Image.open(args.image_file).convert("RGB")
        proc = ImageProcessor(cfg.vision.image_size)
        images = jnp.asarray(process_images([image], proc, cfg))
    else:
        # blank image (keeps the CLI usable for smoke tests without a file)
        images = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))

    sampling = SamplingParams(
        temperature=args.temperature if args.temperature > 0 else 0.0,
        top_p=args.top_p if args.top_p else 1.0,
    )

    t0 = time.perf_counter()
    res = vlm.generate(
        params, cfg, images, jnp.asarray(ids_arr), jnp.asarray(lens),
        jnp.asarray(starts), jax.random.PRNGKey(int(time.time()) % 2**31),
        max_new_tokens=args.max_new_tokens, eos_ids=eos_ids, sampling=sampling)
    tokens = np.asarray(res.tokens)[0]
    n = int(np.asarray(res.num_generated)[0])
    elapsed = time.perf_counter() - t0

    out_ids = [int(t) for t in tokens[:n] if int(t) not in eos_ids]
    print(tokenizer.decode(out_ids, skip_special_tokens=True).strip())

    if args.timing:
        print(json.dumps({
            "total_s": round(elapsed, 3),
            "tokens": n,
            "tok_per_s": round(n / elapsed, 2),
        }), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
