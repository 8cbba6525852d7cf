#!/usr/bin/env python
"""Benchmark: p50 TTFT (vision encode + prefill) for FastVLM on one TPU chip.

Headline metric matches the reference's own instrumentation — wall-clock time
to first token (reference app/FastVLM App/FastVLMModel.swift:114-139) for a
1024x1024 image plus a ~30-token chat prompt.

Baseline: the only absolute TTFT number published in the reference repo is the
accuracy-vs-latency plot (docs/acc_vs_latency_qwen-2.png): FastViTHD at
1024^2 sits at ~165 ms TTFT (M1 Max MacBook Pro per the paper's measurement
setup). vs_baseline = 165 / our_p50_ms, so > 1.0 means faster than the
published reference operating point.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra per-stage details go to stderr.

NOTE (axon): block_until_ready() on the tunnel returns early; every
measurement syncs by fetching a small result to host (np.asarray).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_TTFT_MS = 165.0  # docs/acc_vs_latency_qwen-2.png @ 1024^2


def make_model(size: str, image_size: int, dtype: str):
    import jax

    from fastvlm_tpu import config as C
    from fastvlm_tpu.models import vlm

    decoder = {
        "0.5b": C.qwen2_0_5b, "1.5b": C.qwen2_1_5b, "7b": C.qwen2_7b,
    }[size](param_dtype=dtype, compute_dtype=dtype)
    vision = C.FastViTConfig(image_size=image_size, param_dtype=dtype,
                             compute_dtype=dtype)
    cfg = C.FastVLMConfig(
        vision=vision,
        projector=C.ProjectorConfig(mm_hidden_size=vision.out_channels,
                                    hidden_size=decoder.hidden_size),
        decoder=decoder,
    )
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def sync(x):
    """Force real completion (axon block_until_ready returns early)."""
    return np.asarray(x)


def bench_ttft(cfg, params, batch: int, iters: int, warmup: int = 3):
    import jax
    import jax.numpy as jnp

    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.ops.kv_cache import init_cache
    from fastvlm_tpu.ops.splice import expand_image_ids, pad_batch

    # ~30-token chat prompt + 256 image tokens, padded to a 64 bucket
    text_ids = [151644, 8948, 198] + list(range(100, 120)) + [-200] + \
        list(range(200, 210))
    row, start = expand_image_ids(text_ids, cfg.num_image_tokens)
    bucket = -(-(len(row) + 1) // 64) * 64
    ids, lens, starts = pad_batch([row] * batch, [start] * batch, bucket)

    max_len = bucket + 64
    dtype = jnp.bfloat16 if cfg.decoder.compute_dtype == "bfloat16" else jnp.float32
    cache = init_cache(cfg.decoder.num_layers, batch, max_len,
                       cfg.decoder.num_kv_heads, cfg.decoder.head_dim, dtype)

    images = jax.random.uniform(
        jax.random.PRNGKey(1),
        (batch, cfg.vision.image_size, cfg.vision.image_size, 3), dtype=dtype)
    ids_d, lens_d, starts_d = map(jnp.asarray, (ids, lens, starts))

    @jax.jit
    def ttft_fn(params, images, ids, lens, starts, cache):
        logits, cache = vlm.prefill(params, cfg, images, ids, lens, starts, cache)
        return jnp.argmax(logits, -1), cache  # first token

    tok, _ = ttft_fn(params, images, ids_d, lens_d, starts_d, cache)
    sync(tok)  # compile + warm
    for _ in range(warmup):
        tok, _ = ttft_fn(params, images, ids_d, lens_d, starts_d, cache)
        sync(tok)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        tok, _ = ttft_fn(params, images, ids_d, lens_d, starts_d, cache)
        sync(tok)
        times.append((time.perf_counter() - t0) * 1000)
    return float(np.percentile(times, 50)), times, bucket


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="0.5b", choices=["0.5b", "1.5b", "7b"])
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    cfg, params = make_model(args.size, args.image_size, args.dtype)
    p50, times, bucket = bench_ttft(cfg, params, args.batch, args.iters)

    print(json.dumps({
        "size": args.size, "image_size": args.image_size,
        "batch": args.batch, "prompt_tokens": bucket,
        "p50_ms": round(p50, 2),
        "mean_ms": round(float(np.mean(times)), 2),
        "min_ms": round(float(np.min(times)), 2),
    }), file=sys.stderr)

    print(json.dumps({
        "metric": f"p50 TTFT FastVLM-{args.size} @{args.image_size}px b{args.batch} (encode+prefill)",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_TTFT_MS / p50, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
