"""Interactive chat REPL with streaming output (reference llava/serve/cli.py).

Runs the engine in-process (no HTTP), keeps multi-turn conversation state in
the template, streams tokens as they decode, prints TTFT/tok-s with --timing.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", default=None)
    parser.add_argument("--image-file", default=None)
    parser.add_argument("--conv-mode", default="qwen_2")
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--top_p", type=float, default=1.0)
    parser.add_argument("--max-new-tokens", type=int, default=512)
    parser.add_argument("--random-weights", action="store_true")
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--timing", action="store_true")
    parser.add_argument("--spec", action="store_true",
                        help="prompt-lookup speculative streaming (greedy "
                             "only: requires --temperature 0; exact same "
                             "tokens, fewer device steps)")
    parser.add_argument("--spec-draft-k", type=int, default=8)
    args = parser.parse_args(argv)
    if args.spec and args.temperature > 0:
        parser.error("--spec is greedy-only; pass --temperature 0")

    from fastvlm_tpu.data.constants import DEFAULT_IMAGE_TOKEN
    from fastvlm_tpu.data.conversation import conv_templates
    from fastvlm_tpu.engine import build_engine
    from fastvlm_tpu.ops.sampling import SamplingParams

    engine = build_engine(args.model_path, random_tiny=args.random_weights,
                          dtype=args.dtype, conv_mode=args.conv_mode)

    image = None
    if args.image_file:
        from PIL import Image

        image = Image.open(args.image_file).convert("RGB")

    conv = conv_templates[args.conv_mode].copy()
    sampling = SamplingParams(
        temperature=args.temperature if args.temperature > 0 else 0.0,
        top_p=args.top_p)

    first_turn = True
    while True:
        try:
            inp = input("USER: ")
        except EOFError:
            break
        if not inp.strip():
            break

        if first_turn and image is not None:
            inp = DEFAULT_IMAGE_TOKEN + "\n" + inp
        conv.append_message(conv.roles[0], inp)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()

        print("ASSISTANT: ", end="", flush=True)
        shown = 0
        last = None
        # the rendered history keeps the <image> sentinel from turn 1, so the
        # image must be passed on every turn (as the reference CLI does)
        for update in engine.stream(
            prompt, image,
            max_new_tokens=args.max_new_tokens, sampling=sampling,
            spec=args.spec, draft_k=args.spec_draft_k,
        ):
            text = update["text"]
            print(text[shown:], end="", flush=True)
            shown = len(text)
            last = update
        print()
        if args.timing and last:
            print(f"  [{last['stats']}]", file=sys.stderr)
        conv.messages[-1][1] = last["text"] if last else ""
        first_turn = False
    return 0


if __name__ == "__main__":
    sys.exit(main())
