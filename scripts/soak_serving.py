"""Serving soak on the REAL chip: one continuous-batching scheduler under a
staggered storm that exercises every production admission path at once —
text and image prompts, shared template prefixes (prefix cache), per-row
sampling mixed with greedy, mid-flight client cancellation, and mixed decode
budgets — then checks the invariants the batcher promises:

- every stream terminates with a clean finish_reason (no error chunks),
- cancelled requests release their pages within the run,
- the page pool returns to fully free after the storm,
- non-cancelled walls and aggregate committed tok/s are reported.

This is the live-hardware counterpart of
tests/test_serving.py::test_soak_32_concurrent_mixed_requests_paged_pool
(CPU, tiny config): same stack (Engine -> BatchScheduler -> paged pool),
production-size 0.5B weights, real tunnel timing. The reference worker
serializes requests behind a semaphore (model_worker.py:231-244) and its
app cancels in-flight generation (FastVLMModel.swift:141-151) — this drives
both behaviors concurrently.

Usage:  python scripts/soak_serving.py [--n 48] [--arrival 0.15] [--size 0.5b]
Prints one JSON line with the measured distribution + scheduler counters.
"""
from __future__ import annotations

import argparse
import json
import sys
import threading
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=48)
    p.add_argument("--arrival", type=float, default=0.15)
    p.add_argument("--size", default="0.5b")
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("--pool-tokens", type=int, default=32768)
    args = p.parse_args()

    from bench import make_model

    from fastvlm_tpu.data.preprocessing import ByteTokenizer
    from fastvlm_tpu.engine import Engine, enable_compilation_cache
    from fastvlm_tpu.ops.sampling import SamplingParams
    from fastvlm_tpu.serve.batcher import BatchScheduler

    enable_compilation_cache()
    t_build0 = time.perf_counter()
    if args.size == "tiny":  # CPU smoke: same stack, toy weights
        # tiny MUST stay off the TPU tunnel (it serves one process at a
        # time); env vars are not enough — the axon plugin rewrites
        # jax_platforms during import, so force CPU after import
        import jax
        jax.config.update("jax_platforms", "cpu")
        from fastvlm_tpu.engine import build_engine
        eng = build_engine(random_tiny=True)
        args.image_size = eng.cfg.vision.image_size
    else:
        cfg, params = make_model(args.size, args.image_size, "bfloat16")
        eng = Engine(cfg, params, ByteTokenizer(), eos_ids=(-1,))
    build_s = time.perf_counter() - t_build0
    sched = BatchScheduler(eng, window_ms=30, paged=True, page_size=64,
                           pool_tokens=args.pool_tokens, continuous=True)

    # the shared template prefix half the prompts ride (prefix cache)
    template = ("You are a meticulous visual assistant. Answer precisely "
                "and cite what you can see. ")
    rng = np.random.RandomState(0)
    image = rng.randint(0, 256, (args.image_size, args.image_size, 3),
                        np.uint8)

    def plan(i):
        shared = i % 2 == 0
        prompt = (template if shared else "") + f"describe scene {i}"
        return dict(
            prompt=eng.build_prompt(prompt),
            image=image if i % 4 == 0 else None,
            max_new=(16, 48, 96)[i % 3],
            sampling=(SamplingParams(temperature=0.8, top_p=0.9)
                      if i % 5 == 1 else None),
            cancel_after=(0.3 if i % 7 == 3 else None),
        )

    plans = [plan(i) for i in range(args.n)]
    plen = max(int(np.asarray(eng.prepare(pl["prompt"],
                                          pl["image"])["lens"])[0])
               for pl in plans)
    # FULL warmup (admission prefill + image chunks included): this is the
    # production-server startup path; without it the storm pays 1.7-2.5 s
    # mid-flight XLA compiles on the shared loop (measured: the same soak
    # with admission_prefill=False recorded p50 35.9 s — all compile stalls).
    # With the persistent compile cache a RESTART loads this grid from disk
    # (warmup_s below is the restart time-to-ready when the cache is warm).
    t_warm0 = time.perf_counter()
    sched.warmup(prompt_len=plen, max_new_tokens=96)
    warmup_s = time.perf_counter() - t_warm0

    # short warm pass so jit-compile stalls don't pollute the storm timing
    for _ in sched.submit(plans[0]["prompt"], image=plans[0]["image"],
                          max_new_tokens=16):
        pass
    for _ in sched.submit(plans[1]["prompt"], max_new_tokens=16,
                          sampling=SamplingParams(temperature=0.8,
                                                  top_p=0.9)):
        pass

    walls = [None] * args.n
    reasons = [None] * args.n
    errors = []
    tokens = [0] * args.n

    def run(i):
        pl = plans[i]
        cancel = threading.Event() if pl["cancel_after"] else None
        if cancel:
            threading.Timer(pl["cancel_after"], cancel.set).start()
        t0 = time.perf_counter()
        last = None
        try:
            for item in sched.submit(pl["prompt"], image=pl["image"],
                                     max_new_tokens=pl["max_new"],
                                     sampling=pl["sampling"], cancel=cancel):
                if "error" in item:
                    errors.append((i, item["error"]))
                    return
                last = item
        finally:
            walls[i] = time.perf_counter() - t0
        if last is not None:
            reasons[i] = last.get("stats", {}).get("finish_reason")
            tokens[i] = last.get("stats", {}).get("decode_tokens",
                                                  len(last.get("text", "")))

    ths = [threading.Thread(target=run, args=(i,)) for i in range(args.n)]
    t0 = time.perf_counter()
    for t in ths:
        t.start()
        time.sleep(args.arrival)
    for t in ths:
        t.join(900)
    makespan = time.perf_counter() - t0

    pool = sched.pool
    counters = dict(sched.counters)
    ok = {
        "all_terminated": all(w is not None for w in walls),
        "no_errors": not errors,
        "pool_fully_free": pool.free_pages == pool.num_pages,
        # mid-decode cancels emit finish_reason "cancelled"; cancels that
        # land while the request is still queued/mid-prefill close the
        # stream with no final payload (reason None) — both are the
        # cancellation working. The counter cross-check catches a cancel
        # that was silently ignored (request ran to its cap instead).
        "cancels_honored": all(
            reasons[i] in ("cancelled", None) for i in range(args.n)
            if plans[i]["cancel_after"] is not None)
        and counters.get("cancelled", 0) >= sum(
            1 for pl in plans if pl["cancel_after"] is not None),
        "rest_clean": all(
            reasons[i] in ("stop", "length", "truncated")
            for i in range(args.n) if plans[i]["cancel_after"] is None),
    }
    sched.shutdown()

    done_walls = sorted(w for i, w in enumerate(walls)
                        if w is not None and plans[i]["cancel_after"] is None)
    out = {
        "metric": f"serving soak {args.size} ({args.n} reqs @ "
                  f"{1 / args.arrival:.0f}/s, mixed img/text/sampled/cancel)",
        "ok": all(ok.values()), "checks": ok,
        "p50_wall_s": round(done_walls[len(done_walls) // 2], 2),
        "p95_wall_s": round(done_walls[int(0.95 * (len(done_walls) - 1))], 2),
        "makespan_s": round(makespan, 2),
        "agg_committed_tok_s": round(sum(tokens) / makespan, 1),
        "build_s": round(build_s, 1), "warmup_s": round(warmup_s, 1),
        "reasons": {r: reasons.count(r) for r in set(reasons)},
        "pool_min_free_pages": pool.min_free,
        "counters": {k: v for k, v in sorted(counters.items())
                     if not k.startswith("ms_")},
        "errors": errors[:5],
    }
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
