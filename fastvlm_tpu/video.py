"""Streaming video-frame QA: repeated encode + KV prefix reuse.

Mirrors the reference app's camera loop (app/ContentView.swift:362-414 +
FastVLMModel.swift:86-155): one frame at a time, a fixed question, full
generation per frame, TTFT measured per inference. TPU design improvements:

  * the prompt prefix before the image span (system + user header) is
    prefilled ONCE; each frame reuses those cache entries and only runs
    vision encode + suffix prefill + decode (vlm.prefill_continue);
  * one persistent KV cache — no per-frame allocation; stale decode tokens
    from the previous frame are invalidated by the lengths reset;
  * every stage is a cached jitted call, so steady-state per-frame work is
    exactly [encode+suffix-prefill] + [decode chunks].

Frame-dropping backpressure (the app's AsyncStream bufferingNewest(1)) is the
``latest_only`` consumption pattern in ``qa_over_stream``.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterator, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastvlm_tpu.models import vlm
from fastvlm_tpu.ops.kv_cache import init_cache
from fastvlm_tpu.ops.sampling import SamplingParams
from fastvlm_tpu.ops.splice import expand_image_ids, pad_batch


def _sync(x):
    return np.asarray(x)


class VideoQA:
    """Fixed-question QA over a stream of frames, with prefix KV reuse."""

    def __init__(self, engine, question: str, *, max_new_tokens: int = 48,
                 sampling: SamplingParams = SamplingParams(),
                 spec: bool = False, draft_k: int = 8):
        """``spec=True`` (greedy only): decode each frame with prompt-lookup
        speculative decoding, seeding the draft corpus with the PREVIOUS
        frame's answer — consecutive frames usually answer near-identically,
        so whole spans verify in one pass (vlm.spec_decode_from_tok). Also
        stops at EOS on device (no post-EOS chunk decode), still 2 syncs."""
        if spec and sampling.temperature > 0:
            raise ValueError("spec video decode is greedy-only "
                             "(temperature must be 0)")
        self.engine = engine
        self.cfg = engine.cfg
        self.max_new_tokens = max_new_tokens
        self.sampling = sampling
        self.spec = spec
        self.draft_k = draft_k
        cfg = self.cfg

        prompt = engine.build_prompt(question)
        from fastvlm_tpu.data.preprocessing import tokenizer_image_token

        ids = tokenizer_image_token(prompt, engine.tokenizer)
        row, start = expand_image_ids(ids, cfg.num_image_tokens)
        assert start > 0, "video QA prompt must contain <image>"
        self.prefix_len = start
        suffix = row[start:]
        bucket = -(-len(suffix) // 64) * 64
        suf_ids, suf_lens, _ = pad_batch([suffix], [0], bucket)
        self.suffix_ids = jnp.asarray(suf_ids)
        self.suffix_lens = jnp.asarray(suf_lens)
        self.suffix_starts = jnp.asarray([0], np.int32)  # image at suffix pos 0

        total_max = start + bucket + max_new_tokens
        if spec:
            total_max += draft_k + 1  # verify-pass write slack
        self._dtype = engine._dtype
        self._key = jax.random.PRNGKey(time.time_ns() % 2**31)
        self.cache = init_cache(
            cfg.decoder.num_layers, 1, total_max,
            cfg.decoder.num_kv_heads, cfg.decoder.head_dim, engine._kv_dtype)

        if spec:
            # draft corpus = [prompt row | previous frame's answer]; the
            # answer region is rewritten after every frame so the n-gram
            # lookup drafts from what this question produced LAST frame
            self._corpus_prompt_len = len(row)
            self._answer_off = start + bucket
            corpus = np.zeros((1, self._answer_off + max_new_tokens), np.int32)
            corpus[0, :len(row)] = row
            self._corpus = jnp.asarray(corpus)
            self._corpus_lens = jnp.asarray([len(row)], np.int32)
            off = self._answer_off

            @jax.jit
            def seed_corpus(corpus, tokens, num):
                """Write the frame's answer tokens at the answer offset and
                return (corpus, corpus_lens) — ONE dispatch per frame."""
                corpus = jax.lax.dynamic_update_slice(corpus, tokens, (0, off))
                return corpus, off + num

            self._seed_corpus = seed_corpus

        # one-time prefix prefill (no image in the prefix)
        pre_ids, pre_lens, pre_starts = pad_batch(
            [np.asarray(row[:start], np.int32)], [-1], start)
        _, self.cache = engine._prefill_jit(
            engine.params, None, jnp.asarray(pre_ids), jnp.asarray(pre_lens),
            jnp.asarray(pre_starts), self.cache)

        import functools

        from fastvlm_tpu.ops.sampling import sample

        @functools.partial(jax.jit, static_argnames=("offset", "sampling"))
        def _suffix_prefill(params, images, suf_ids, suf_lens, starts, offset,
                            cache, key, sampling):
            """Encode + suffix prefill + first-token sample + key split in
            ONE dispatch — every separate op on this tunnel costs a
            round-trip-class launch (docs/PERF.md)."""
            logits, cache = vlm.prefill_continue(params, cfg, images, suf_ids,
                                                 suf_lens, starts, offset,
                                                 cache)
            key, sub = jax.random.split(key)
            tok = sample(sub, logits, sampling)
            return tok, cache, key

        self._suffix_prefill = _suffix_prefill

    def ask(self, frame) -> Tuple[str, Dict[str, Any]]:
        """frame: PIL image or (H, W, 3) array. Returns (answer, stats)."""
        engine = self.engine
        cfg = self.cfg
        if hasattr(frame, "convert"):
            from fastvlm_tpu.data.preprocessing import process_images

            images = jnp.asarray(
                process_images([frame], engine.processor, cfg), self._dtype)
        else:
            # uint8 frames ship 4x fewer bytes to the device and are
            # rescaled (and, for non-native sizes, resized/padded) there
            images = engine.prepare_array_image(frame)

        t0 = time.perf_counter()
        tok, cache, self._key = self._suffix_prefill(
            engine.params, images, self.suffix_ids, self.suffix_lens,
            self.suffix_starts, self.prefix_len, self.cache, self._key,
            self.sampling)
        first = int(_sync(tok)[0])
        ttft_ms = (time.perf_counter() - t0) * 1000

        if self.spec:
            out, stats = self._spec_finish(
                tok, cache, skip=first in engine.eos_ids)
            text = engine.tokenizer.decode(
                out, skip_special_tokens=True).strip()
            total_ms = (time.perf_counter() - t0) * 1000
            return text, {"ttft_ms": round(ttft_ms, 2),
                          "total_ms": round(total_ms, 2),
                          "tokens": len(out), **stats}

        # Camera-loop latency discipline: every tunnel round-trip costs
        # ~25-50 ms (CLAUDE.md), so after the TTFT fetch the whole decode is
        # dispatched WITHOUT intermediate syncs — all chunks queue on device
        # back-to-back and one flush at the end collects the tokens. EOS
        # rows are masked on device (decode_chunk's done flag), the host
        # trims at EOS afterwards. Total per-frame syncs: 2.
        out = [] if first in engine.eos_ids else [first]
        done = jnp.asarray([first in engine.eos_ids])
        key = self._key
        chunks = []
        emitted = 1
        mid_checked = False
        # first token already EOS (known on host): dispatch nothing
        while out and emitted < self.max_new_tokens:
            k = min(engine.chunk, self.max_new_tokens - emitted)
            toks, done, tok, cache, key = vlm.decode_chunk(
                engine.params, cfg, tok, done, cache, key, k=k,
                eos_ids=engine.eos_ids, sampling=self.sampling)
            chunks.append(toks)
            emitted += k
            # Large budgets: ONE extra sync at the halfway point bounds
            # wasted post-EOS decode to ~half the budget (ADVICE r2). Small
            # budgets keep the strict 2-sync discipline — a ~30 ms tunnel
            # RTT only pays for itself when it can save > ~14 tokens of
            # decode (docs/PERF.md RTT/token costs).
            if (self.max_new_tokens > 64 and not mid_checked
                    and emitted * 2 >= self.max_new_tokens):
                mid_checked = True
                if bool(_sync(done)[0]):
                    break
        self._key = key
        if chunks and out:  # skip decode fetch if the first token was EOS
            # concat on device: ONE host fetch regardless of chunk count
            host = _sync(jnp.concatenate(chunks, axis=1))[0]
            for tk in host:
                tk = int(tk)
                if tk in engine.eos_ids:
                    break
                out.append(tk)
        self.cache = cache  # reuse buffers next frame (lengths reset on prefill)
        text = engine.tokenizer.decode(out, skip_special_tokens=True).strip()
        total_ms = (time.perf_counter() - t0) * 1000
        return text, {"ttft_ms": round(ttft_ms, 2),
                      "total_ms": round(total_ms, 2),
                      "tokens": len(out)}


    def _spec_dispatch(self, tok, cache):
        """Queue the spec decode + corpus reseed + a packed result row
        [num, steps, accepted, drafted, tokens...] — no host syncs."""
        engine = self.engine
        res = vlm.spec_decode_from_tok(
            engine.params, self.cfg, tok, cache, self._corpus,
            self._corpus_lens, max_new_tokens=self.max_new_tokens,
            eos_ids=engine.eos_ids, draft_k=self.draft_k)
        self._corpus, self._corpus_lens = self._seed_corpus(
            self._corpus, res.tokens, res.num_generated)
        meta = jnp.stack([res.num_generated[0], res.steps,
                          res.accepted, res.drafted])
        return jnp.concatenate([meta[None], res.tokens], axis=1)

    def _spec_finish(self, tok, cache, skip=False):
        """ONE fetch: unpack tokens + spec stats; skip=True when the first
        token (already fetched for TTFT) was EOS."""
        packed = self._spec_dispatch(tok, cache)
        host = _sync(packed)[0]
        num, steps, accepted, drafted = (int(x) for x in host[:4])
        out = [] if skip else [int(x) for x in host[4:4 + num]]
        if out and out[-1] in self.engine.eos_ids:
            out = out[:-1]
        return out, {"spec_steps": steps,
                     "spec_accept_rate": round(accepted / max(1, drafted), 3)}

    # ------------- double-buffered pipeline (VERDICT r2 #10) -------------
    #
    # ask() pays 2 blocking tunnel round-trips per frame while the device
    # sits idle-from-the-host's-view. The split below lets the stream driver
    # DISPATCH frame N+1's encode+prefill+decode (async, queues behind frame
    # N's work on device) BEFORE fetching frame N's tokens, so the fetch
    # RTTs overlap frame N+1's device execution — per-frame wall time
    # approaches pure device work (mirrors the camera AsyncStream pipelining,
    # app/ContentView.swift:362-414).

    def dispatch(self, frame) -> Dict[str, Any]:
        """Queue the whole frame computation; NO host syncs. The first-token
        EOS decision moves on-device (decode_chunk's done mask)."""
        engine = self.engine
        cfg = self.cfg
        if hasattr(frame, "convert"):
            from fastvlm_tpu.data.preprocessing import process_images

            images = jnp.asarray(
                process_images([frame], engine.processor, cfg), self._dtype)
        else:
            images = engine.prepare_array_image(frame)
        t0 = time.perf_counter()
        tok, cache, self._key = self._suffix_prefill(
            engine.params, images, self.suffix_ids, self.suffix_lens,
            self.suffix_starts, self.prefix_len, self.cache, self._key,
            self.sampling)
        if self.spec:
            # spec loop stops at EOS on device; ONE fetch total in finish()
            return {"t0": t0, "packed": self._spec_dispatch(tok, cache)}
        done = jnp.isin(tok, jnp.asarray(engine.eos_ids, jnp.int32))
        key = self._key
        chunks = []
        emitted = 1
        while emitted < self.max_new_tokens:
            k = min(engine.chunk, self.max_new_tokens - emitted)
            toks, done, tok, cache, key = vlm.decode_chunk(
                engine.params, cfg, tok, done, cache, key, k=k,
                eos_ids=engine.eos_ids, sampling=self.sampling)
            chunks.append(toks)
            emitted += k
        self._key = key
        self.cache = cache
        return {"t0": t0, "first": tok, "chunks": chunks}

    def finish(self, state: Dict[str, Any]) -> Tuple[str, Dict[str, Any]]:
        """Fetch a dispatched frame's tokens (the 2 syncs). ttft_ms here is
        time-to-first-token-AVAILABLE: in pipelined use the fetch may run
        after later frames were dispatched, so it includes queueing."""
        engine = self.engine
        if "packed" in state:
            host = _sync(state["packed"])[0]
            num, steps, accepted, drafted = (int(x) for x in host[:4])
            out = [int(x) for x in host[4:4 + num]]
            if out and out[0] in engine.eos_ids:
                out = []
            elif out and out[-1] in engine.eos_ids:
                out = out[:-1]
            text = engine.tokenizer.decode(
                out, skip_special_tokens=True).strip()
            total_ms = (time.perf_counter() - state["t0"]) * 1000
            return text, {"ttft_ms": round(total_ms, 2),  # one fetch: = total
                          "total_ms": round(total_ms, 2),
                          "tokens": len(out), "spec_steps": steps,
                          "spec_accept_rate": round(
                              accepted / max(1, drafted), 3)}
        first = int(_sync(state["first"])[0])
        ttft_ms = (time.perf_counter() - state["t0"]) * 1000
        out = [] if first in engine.eos_ids else [first]
        if out and state["chunks"]:
            host = _sync(jnp.concatenate(state["chunks"], axis=1))[0]
            for tk in host:
                tk = int(tk)
                if tk in engine.eos_ids:
                    break
                out.append(tk)
        text = engine.tokenizer.decode(out, skip_special_tokens=True).strip()
        total_ms = (time.perf_counter() - state["t0"]) * 1000
        return text, {"ttft_ms": round(ttft_ms, 2),
                      "total_ms": round(total_ms, 2),
                      "tokens": len(out)}


def qa_over_stream(
    video_qa: VideoQA,
    frames: Iterable,
    latest_only: bool = True,
    pipelined: bool = False,
) -> Iterator[Tuple[str, Dict[str, Any]]]:
    """Drive VideoQA over a frame iterable. With latest_only, frames arriving
    while a generation is in flight are dropped except the newest (the app's
    bufferingNewest(1) backpressure). With pipelined, frame N+1 is fully
    dispatched before frame N's results are fetched (double buffering): the
    fetch round-trips overlap the next frame's device work."""
    if pipelined:
        it = iter(frames)
        prev = None
        for frame in it:
            state = video_qa.dispatch(frame)
            if prev is not None:
                yield video_qa.finish(prev)
            prev = state
        if prev is not None:
            yield video_qa.finish(prev)
        return
    it = iter(frames)
    pending = None
    while True:
        if pending is None:
            try:
                pending = next(it)
            except StopIteration:
                return
        frame = pending
        pending = None
        yield video_qa.ask(frame)
        if latest_only:
            # drain any frames that arrived during generation, keep newest
            drained = None
            try:
                while True:
                    drained = next(it)
                    break  # plain iterables: take next; real camera sources
                    # would be non-blocking queues
            except StopIteration:
                return
            pending = drained
