"""Measure decode-service starvation during cold-prompt admissions.

An in-flight streaming request ("anchor") decodes continuously while cold
long prompts admit into the live batch. Without chunked prefill, every
admission stalls the shared decode loop for its full prompt prefill; with
``prefill_chunk=W`` the stall is bounded by one W-token chunk per boundary
(serve/batcher.py pending rows). Reported: the anchor's inter-update gap
p50/max around the admission window, plus the admissions' TTFTs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_admission.py
       [--size 7b --bits 8] [--cold-tokens 600] [--chunks 0,256]
"""

from __future__ import annotations

import argparse
import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="0.5b")
    ap.add_argument("--bits", type=int, default=0,
                    help="int-quantize the decoder (7B must to fit)")
    ap.add_argument("--image-size", type=int, default=1024)
    ap.add_argument("--cold-tokens", type=int, default=600)
    ap.add_argument("--n-cold", type=int, default=3)
    ap.add_argument("--anchor-new", type=int, default=1280,
                    help="anchor max_new_tokens; must make the batch "
                         "envelope (anchor pad + this) cover cold plen + "
                         "24, or colds defer to the next batch instead of "
                         "admitting into the live one")
    ap.add_argument("--chunks", default="0,256",
                    help="comma list of prefill_chunk values to A/B")
    args = ap.parse_args()

    import numpy as np

    from bench import make_model
    from fastvlm_tpu.data.preprocessing import ByteTokenizer
    from fastvlm_tpu.engine import Engine
    from fastvlm_tpu.serve.batcher import BatchScheduler

    cfg, params = make_model(args.size, args.image_size, "bfloat16",
                             quantize_bits=args.bits or None)
    eng = Engine(cfg, params, ByteTokenizer(), eos_ids=(-1,))
    cold_prompt = ("the quick brown fox jumps over the lazy dog. "
                   * (args.cold_tokens // 45 + 1))[:args.cold_tokens]

    for w in [int(x) for x in args.chunks.split(",")]:
        sched = BatchScheduler(eng, window_ms=30, paged=True, page_size=64,
                               pool_tokens=65536, prefill_chunk=w,
                               max_pending=2, spec=False)
        try:
            plen = int(np.asarray(
                eng.prepare(eng.build_prompt(cold_prompt))["lens"])[0])
            sched.warmup(prompt_len=plen, max_new_tokens=args.anchor_new)
            # compile pass: one solo cold request triggers the full-prompt
            # admission prefill compile (and any leftover shape) OUTSIDE the
            # measured window — we A/B steady-state starvation, not XLA
            for _ in sched.submit(eng.build_prompt(cold_prompt),
                                  max_new_tokens=4):
                pass

            gaps, ttfts = [], []
            anchor_done = threading.Event()
            started = threading.Event()

            def run_anchor():
                last_t = None
                for _ in sched.submit(eng.build_prompt("anchor stream"),
                                      max_new_tokens=args.anchor_new):
                    now = time.perf_counter()
                    if last_t is not None:
                        gaps.append(now - last_t)
                    last_t = now
                    started.set()
                anchor_done.set()

            def run_cold():
                last = None
                for last in sched.submit(eng.build_prompt(cold_prompt),
                                         max_new_tokens=24):
                    pass
                assert "error" not in last, last
                ttfts.append((last["stats"]["queue_ms"],
                              last["stats"]["ttft_ms"]))

            ta = threading.Thread(target=run_anchor)
            ta.start()
            started.wait(60)
            time.sleep(0.3)  # settle into steady decode
            n_settle = len(gaps)
            cold_threads = []
            for _ in range(args.n_cold):
                t = threading.Thread(target=run_cold)
                t.start()
                cold_threads.append(t)
                time.sleep(0.4)
            for t in cold_threads:
                t.join(300)
            ta.join(300)
            window = sorted(gaps[n_settle:])
            if window:
                p50 = window[len(window) // 2] * 1000
                mx = window[-1] * 1000
            else:
                p50 = mx = float("nan")
            print(f"prefill_chunk={w}: anchor gap p50 {p50:.0f} ms / "
                  f"max {mx:.0f} ms over {len(window)} updates; "
                  f"cold plen={plen} (queue_ms, ttft_ms)="
                  f"{[(round(q), round(t)) for q, t in ttfts]}; "
                  f"chunked={sched.counters['chunked_admissions']} "
                  f"chunks={sched.counters['prefill_chunks']}", flush=True)
        finally:
            sched.shutdown()
        time.sleep(0.5)


if __name__ == "__main__":
    main()
