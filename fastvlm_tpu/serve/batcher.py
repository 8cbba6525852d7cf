"""Dynamic request batching for serving.

The reference worker serializes requests behind a semaphore
(model_worker.py:231-244) — one generate at a time. On TPU, batched decode
is nearly free (weights stream once per step regardless of batch), so this
scheduler groups concurrent requests into one batched prefill + shared
decode loop and demultiplexes streams per request:

  * requests arriving within a gather window (default 15 ms) are grouped,
    bucketed to a common prompt length, and prefilled together;
  * the decode loop runs jitted k-token chunks over the whole batch; each
    request's tokens stream to its own queue as they decode;
  * finished rows are masked (done) while the rest continue — a finished
    request costs nothing but its cache rows;
  * grouping keys include sampling params (they are static under jit).

Static-shape discipline: batch sizes are bucketed to {1, 2, 4, 8}, prompt
lengths to 64-token multiples — a handful of compiled specializations serve
any load.
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
import time
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SENTINEL = object()


@dataclasses.dataclass
class _Request:
    prompt: str
    image: Any
    max_new_tokens: int
    sampling: Any
    out: "queue.Queue"
    stop_strings: Tuple[str, ...] = ()
    t_submit: float = dataclasses.field(default_factory=time.perf_counter)


def _round_batch(n: int, caps=(1, 2, 4, 8)) -> int:
    for c in caps:
        if n <= c:
            return c
    return caps[-1]


class BatchScheduler:
    """Wraps an Engine; submit() returns an iterator of cumulative-text
    updates exactly like Engine.stream."""

    def __init__(self, engine, *, max_batch: int = 8, window_ms: float = 15.0):
        self.engine = engine
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = False
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    # ------------- client side -------------

    def submit(self, prompt: str, image=None, *, max_new_tokens: int = 256,
               sampling=None, stop_strings: Tuple[str, ...] = ()) -> Iterator[dict]:
        from fastvlm_tpu.ops.sampling import SamplingParams

        req = _Request(prompt, image, max_new_tokens,
                       sampling or SamplingParams(), queue.Queue(),
                       tuple(stop_strings))
        self.queue.put(req)
        while True:
            item = req.out.get()
            if item is _SENTINEL:
                return
            yield item

    def shutdown(self):
        self._stop = True

    # ------------- scheduler side -------------

    def _gather(self) -> List[_Request]:
        try:
            first = self.queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        key = self._group_key(first)
        deadline = time.perf_counter() + self.window_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self.queue.get(timeout=remaining)
            except queue.Empty:
                break
            if self._group_key(nxt) == key:
                batch.append(nxt)
            else:
                # different sampling config: push back for the next group
                self.queue.put(nxt)
                break
        return batch

    def _group_key(self, r: _Request):
        s = r.sampling
        return (s.temperature, s.top_p, s.top_k)

    def _loop(self):
        while not self._stop:
            batch = self._gather()
            if not batch:
                continue
            try:
                self._run_batch(batch)
            except Exception as e:  # surface errors to every waiter
                logger.exception("batch failed")
                for r in batch:
                    r.out.put({"error": str(e)})
                    r.out.put(_SENTINEL)

    def _run_batch(self, batch: List[_Request]):
        import jax
        import jax.numpy as jnp

        from fastvlm_tpu.models import vlm
        from fastvlm_tpu.ops.kv_cache import init_cache
        from fastvlm_tpu.ops.sampling import sample
        from fastvlm_tpu.ops.splice import pad_batch

        engine = self.engine
        cfg = engine.cfg
        n_real = len(batch)
        b = _round_batch(n_real)

        # anyres merges have ragged token counts: serve serially, and detect
        # it BEFORE prepare() so the vision tower runs exactly once per request
        anyres = (cfg.image_aspect_ratio == "anyres"
                  and cfg.image_grid_pinpoints
                  and any(hasattr(r.image, "convert") for r in batch))
        multi_image = any(isinstance(r.image, (list, tuple))
                          and len(r.image) > 1 for r in batch)
        if anyres or multi_image:
            for r in batch:
                for update in engine.stream(
                        r.prompt, r.image,
                        max_new_tokens=r.max_new_tokens, sampling=r.sampling,
                        stop_strings=r.stop_strings):
                    r.out.put(update)
                r.out.put(_SENTINEL)
            return

        # per-request prep through the engine's own path
        prepped = [engine.prepare(r.prompt, r.image) for r in batch]
        pad_to = max(int(p["ids"].shape[1]) for p in prepped)
        rows, starts_l, imgs = [], [], []
        s = cfg.vision.image_size
        for p in prepped:
            ids_row = np.asarray(p["ids"][0])
            ln = int(np.asarray(p["lens"])[0])
            rows.append(ids_row[:ln])
            starts_l.append(int(np.asarray(p["starts"])[0]))
            if p["images"] is not None:
                imgs.append(np.asarray(p["images"][0], np.float32))
            else:
                imgs.append(np.zeros((s, s, 3), np.float32))
        # pad rows to the static batch bucket
        while len(rows) < b:
            rows.append(rows[0][:1])
            starts_l.append(-1)
            imgs.append(np.zeros((s, s, 3), np.float32))
        ids, lens, starts = pad_batch(rows, starts_l, pad_to)

        max_new = max(r.max_new_tokens for r in batch)
        cache = init_cache(cfg.decoder.num_layers, b, pad_to + max_new,
                           cfg.decoder.num_kv_heads, cfg.decoder.head_dim,
                           engine._dtype)
        t0 = time.perf_counter()
        logits, cache = engine._prefill_jit(
            engine.params, jnp.asarray(np.stack(imgs), engine._dtype),
            jnp.asarray(ids), jnp.asarray(lens), jnp.asarray(starts), cache)
        sampling = batch[0].sampling
        key = jax.random.PRNGKey(time.time_ns() % 2**31)
        key, sub = jax.random.split(key)
        tok = sample(sub, logits, sampling)
        ttft_ms = (time.perf_counter() - t0) * 1000

        host_tok = np.asarray(tok)
        texts: List[List[int]] = [[] for _ in range(b)]
        finished = [i >= n_real for i in range(b)]
        caps = [batch[i].max_new_tokens if i < n_real else 0
                for i in range(b)]
        emitted = [1] * b

        def push_updates():
            for i, r in enumerate(batch):
                text = engine.tokenizer.decode(
                    texts[i], skip_special_tokens=True)
                for ss in r.stop_strings:
                    if ss and ss in text:
                        text = text.split(ss)[0]
                        finished[i] = True
                r.out.put({"text": text,
                           "stats": {"ttft_ms": round(ttft_ms, 2),
                                     "decode_tokens": len(texts[i]),
                                     "batch_size": n_real}})

        for i in range(b):
            t = int(host_tok[i])
            if i < n_real and t not in engine.eos_ids:
                texts[i].append(t)
            elif i < n_real:
                finished[i] = True
        push_updates()

        done = jnp.asarray([finished[i] or caps[i] <= 1 for i in range(b)])
        while not all(finished) and max(
                emitted[i] for i in range(n_real) if not finished[i]) < max_new:
            k = min(engine.chunk, max_new)
            toks, done, tok, cache, key = vlm.decode_chunk(
                engine.params, cfg, tok, done, cache, key, k=k,
                eos_ids=engine.eos_ids, sampling=sampling)
            host = np.asarray(toks)
            for i in range(n_real):
                if finished[i]:
                    continue
                for t in host[i]:
                    t = int(t)
                    # post-EOS pad slots are always preceded by the EOS token
                    # in the same chunk, so breaking on EOS is sufficient —
                    # no pad heuristic (token id 0 is a real Qwen2 token, '!')
                    if t in engine.eos_ids or emitted[i] >= caps[i]:
                        finished[i] = True
                        break
                    texts[i].append(t)
                    emitted[i] += 1
            push_updates()
            host_done = np.asarray(done)
            for i in range(n_real):
                if host_done[i]:
                    finished[i] = True

        for r in batch:
            r.out.put(_SENTINEL)
