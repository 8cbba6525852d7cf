"""Smoke client: send one prompt through controller -> worker and print the
stream (reference llava/serve/test_message.py)."""

from __future__ import annotations

import argparse
import json

import requests

from fastvlm_tpu.serve.protocol import iter_chunks


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--controller-address", default="http://localhost:10000")
    parser.add_argument("--worker-address", default=None)
    parser.add_argument("--model-name", required=True)
    parser.add_argument("--message", default="Tell me a story with more than 1000 words.")
    parser.add_argument("--max-new-tokens", type=int, default=32)
    args = parser.parse_args(argv)

    if args.worker_address:
        worker_addr = args.worker_address
    else:
        r = requests.post(args.controller_address + "/refresh_all_workers")
        r = requests.post(args.controller_address + "/list_models")
        models = r.json()["models"]
        print(f"Models: {models}")
        r = requests.post(args.controller_address + "/get_worker_address",
                          json={"model": args.model_name})
        worker_addr = r.json()["address"]
        print(f"worker_addr: {worker_addr}")
    if worker_addr == "":
        print("No available workers")
        return 1

    from fastvlm_tpu.data.conversation import conv_templates

    conv = conv_templates["qwen_2"].copy()
    conv.append_message(conv.roles[0], args.message)
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()

    response = requests.post(
        worker_addr + "/worker_generate_stream",
        json={"model": args.model_name, "prompt": prompt,
              "temperature": 0.0, "max_new_tokens": args.max_new_tokens,
              "stop": conv.sep},
        stream=True)
    print(prompt, end="")
    shown = 0
    for data in iter_chunks(response.iter_content(chunk_size=None)):
        if data["error_code"]:
            print(f"\n[error {data['error_code']}] {data['text']}")
            return 1
        text = data["text"]
        print(text[shown:], end="", flush=True)
        shown = len(text)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
