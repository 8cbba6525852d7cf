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
  * a request's stream closes the moment ITS row finishes (pages released
    on the spot) — clients never wait for the rest of the batch;
  * **continuous batching** (paged mode): at every chunk boundary, freed
    rows admit queued compatible requests — the new prompt prefills
    straight into the shared page pool through a 1-row cache view, so a
    request arriving mid-batch waits at most one chunk (~k tokens), not a
    whole generation (the window batcher's p95 TTFT failure mode);
  * **chunked admission prefill** (``prefill_chunk``): a cold long-prompt
    admission prefills in fixed-width chunks interleaved with the live
    batch's decode chunks — in-flight rows keep streaming instead of
    stalling for the whole prompt prefill (Sarathi/vLLM chunked prefill,
    built on vlm.prefill_continue's dynamic offset);
  * **per-row sampling** (ops.sampling.RowSampling): temperature/top-k/
    top-p ride as traced (B,) arrays, so greedy and sampled requests share
    ONE batch and ONE compiled decode program — no sampling-config grouping,
    no recompile when a sampled request lands mid-flight.

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
    # client-side cancellation (the reference app cancels in-flight
    # generation, FastVLM App/FastVLMModel.swift:141-151): once set, the
    # scheduler aborts the row at the next chunk boundary and releases its
    # pages/slot — a dead SSE client must not hold batch resources
    cancel: Optional[threading.Event] = None

    @property
    def cancelled(self) -> bool:
        return self.cancel is not None and self.cancel.is_set()


def _decoder_param_count(dec) -> int:
    """Rough decoder parameter count from the config (scale-aware serving
    defaults; exactness doesn't matter, only the 0.5B-vs-1.5B+ split)."""
    h, L = dec.hidden_size, dec.num_layers
    qh = dec.num_heads * dec.head_dim
    kvh = dec.num_kv_heads * dec.head_dim
    per_layer = h * qh + 2 * h * kvh + qh * h + 3 * h * dec.intermediate_size
    embed = dec.vocab_size * h * (1 if dec.tie_word_embeddings else 2)
    return L * per_layer + embed


def _round_batch(n: int, caps=(1, 2, 4, 8)) -> int:
    for c in caps:
        if n <= c:
            return c
    return caps[-1]


def _round_bucket(n: int, page: int, step: int = 512) -> int:
    """Round a view length up to the recompile-bucket step AND a whole
    number of pages (chunk-view decode is compiled per bucket — 512-token
    steps keep the specialization count to a handful)."""
    b = -(-n // step) * step
    return -(-b // page) * page


# Canonical widths for the 1-row admission/prefill views. Every jitted
# paged program is keyed by its block-table WIDTH; deriving these widths
# from the prompt alone (not from whatever batch envelope happens to be
# live) keeps the compiled program set small, deterministic, and fully
# coverable by warmup() — the TPU-native answer to vLLM-style dynamic
# shapes. Admission ids bucket to _ADMIT_STEP tokens (prefill compute on
# the pad is ~0.1 ms/256 tok at 0.5B; one avoided mid-flight XLA compile
# is 3-9 s), view tables to _VIEW_STEP tokens (prefill_continue attention
# cost scales with table width, so row views can't just span the pool).
_ADMIT_STEP = 256
_VIEW_STEP = 512


def _prefill_chunk_bounds(lo: int, hi: int, w: int,
                          img_s: int, img_e: int) -> List[int]:
    """Chunk boundaries [lo, ..., hi] for chunked admission prefill: every
    ``w`` tokens, but never strictly inside the image-token span
    [img_s, img_e) — the vision embeds overlay a contiguous block
    (ops/splice.overlay_image_embeds), so the span must be covered by ONE
    chunk. That chunk is always exactly [img_s, min(img_e, hi)): a boundary
    is forced at img_s even when the running chunk could swallow the whole
    span, so the image chunk has ONE canonical width (num_image_tokens,
    bucket-rounded) that warmup() can precompile — a width derived from
    img_s % w would key a fresh encoder-in-prefill XLA program per prompt
    layout (ADVICE r4 medium). img_s < 0 means text-only: callers pass -1
    when the request carries no pixels (the prompt template always inserts
    sentinel SLOTS, but splitting empty slots is safe — no overlay)."""
    bounds = [lo]
    p = lo
    while p < hi:
        n = min(p + w, hi)
        if 0 <= img_s < img_e:
            if p < img_s < n:
                n = img_s          # force a boundary at the span start
            elif p == img_s:
                n = min(img_e, hi)  # the canonical image chunk
        bounds.append(n)
        p = n
    return bounds


class PagePool:
    """Host-side free list over the device KV page pool.

    The device arrays (ops/kv_cache.PagedKVCache pools) never move; this
    tracks which pool pages are mapped into some row's block table. Pages are
    allocated as sequences grow and returned the moment a request finishes,
    so HBM held by the cache is bounded by tokens actually in flight —
    the paged-KV serving property named in SURVEY.md:40-41 / BASELINE."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free = list(range(num_pages))
        self.min_free = num_pages  # low-water mark (observability/tests)
        # refcounts for mapped pages: prefix caching maps one page into
        # several rows' block tables (and the prefix registry itself);
        # a page returns to the free list when its LAST reference releases
        self._ref: Dict[int, int] = {}

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[List[int]]:
        if n <= 0:
            # guard: self._free[-0:] would alias the WHOLE free list
            return []
        if n > len(self._free):
            return None
        out = self._free[-n:]
        del self._free[-n:]
        for p in out:
            self._ref[p] = 1
        self.min_free = min(self.min_free, len(self._free))
        return out

    def share(self, pages: List[int]) -> None:
        """Take an extra reference on already-mapped pages (read-only
        sharing: a row mapping a cached prompt prefix, or the prefix
        registry pinning an entry)."""
        for p in pages:
            self._ref[p] += 1

    def release(self, pages: List[int]) -> None:
        for p in pages:
            r = self._ref[p] - 1
            if r:
                self._ref[p] = r
            else:
                del self._ref[p]
                self._free.append(p)


class PrefixCache:
    """Block-aligned prompt-prefix reuse over the shared page pool
    (automatic prefix caching; the serving analog of the video path's
    KV-prefix reuse, vlm.prefill_continue).

    Full pages of prompt KV are immutable once written (rows only ever
    write at positions >= their own prompt length, suffix prefills start at
    the cached boundary), so rows with an identical token prefix can map
    the SAME pool pages read-only. Entries are keyed by the exact token ids
    of each full-page prefix; a hit maps j shared pages into the new row's
    block table and only the suffix is prefilled (prefill_continue with a
    dynamic offset). Causality + identical absolute RoPE positions make the
    reuse exact: prefix KV depends only on ids at positions < cached_len.

    Image prompts participate up to the first image-slot position only
    (image KV depends on pixel content, not ids); full-image reuse is the
    video path's job.

    The registry holds one pool reference per entry page; when the pool
    can't satisfy an allocation, LRU entries are evicted until it can."""

    def __init__(self, pool: PagePool, page_size: int,
                 max_entries: int = 256):
        import collections
        self.pool = pool
        self.page = page_size
        self.max_entries = max_entries
        self.entries: "collections.OrderedDict[bytes, List[int]]" = \
            collections.OrderedDict()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _key(ids, n: int) -> bytes:
        return np.asarray(ids[:n], np.int32).tobytes()

    def peek(self, ids) -> int:
        """Length of the longest cached full-page prefix of ``ids`` without
        taking references (batch-prefill planning: the gathered rows reuse
        the LONGEST prefix common to all, decided before any mapping)."""
        n_full = len(ids) // self.page
        for j in range(n_full, 0, -1):
            if self._key(ids, j * self.page) in self.entries:
                return j * self.page
        return 0

    def lookup(self, ids) -> Tuple[int, List[int]]:
        """Longest cached full-page prefix of ``ids`` -> (cached_len,
        pages) with one pool reference taken per page FOR THE CALLER
        (the row must release them like its own). (0, []) on miss."""
        n_full = len(ids) // self.page
        for j in range(n_full, 0, -1):
            key = self._key(ids, j * self.page)
            pages = self.entries.get(key)
            if pages is not None:
                self.entries.move_to_end(key)
                self.pool.share(pages)
                self.hits += 1
                return j * self.page, list(pages)
        self.misses += 1
        return 0, []

    def publish(self, ids, pages: List[int]) -> None:
        """Register every full-page prefix of ``ids`` (whose KV lives in
        ``pages``, one per page in order). Each new entry takes pool
        references on its pages; existing entries are left alone (their
        pages already hold identical KV)."""
        n_full = min(len(ids) // self.page, len(pages))
        for j in range(1, n_full + 1):
            key = self._key(ids, j * self.page)
            if key in self.entries:
                self.entries.move_to_end(key)
                continue
            entry = list(pages[:j])
            self.pool.share(entry)
            self.entries[key] = entry
        while len(self.entries) > self.max_entries:
            _, old = self.entries.popitem(last=False)
            self.pool.release(old)

    def evict_for(self, n: int) -> bool:
        """Drop LRU entries until the pool could satisfy an ``n``-page
        allocation. Returns True if it can."""
        while self.pool.free_pages < n and self.entries:
            _, pages = self.entries.popitem(last=False)
            self.pool.release(pages)
        return self.pool.free_pages >= n

    def clear(self) -> None:
        for pages in self.entries.values():
            self.pool.release(pages)
        self.entries.clear()


class BatchScheduler:
    """Wraps an Engine; submit() returns an iterator of cumulative-text
    updates exactly like Engine.stream."""

    def __init__(self, engine, *, max_batch: int = 8, window_ms: float = 15.0,
                 paged: bool = True, page_size: int = 64,
                 pool_tokens: int = 16384, chunk_view: bool = True,
                 continuous: bool = True, fairness_s: float = 2.0,
                 spec: bool = False, spec_draft_k: int = 8,
                 spec_ngram_n: int = 3, spec_max_rows: int = 1,
                 spec_min_accept: float = 0.1,
                 prefix_cache: Optional[bool] = None,
                 persist_view: bool = True, pipeline_depth: int = 2,
                 prefill_chunk: Optional[int] = None, max_pending: int = 2):
        self.engine = engine
        self.max_batch = max_batch
        # speculative greedy serving: prompt-lookup verify passes replace
        # plain decode chunks for temperature-0 groups (vlm.spec_chunk_paged)
        self.spec = spec
        self.spec_draft_k = spec_draft_k
        self.spec_ngram_n = spec_ngram_n
        # adaptive speculation: verify passes amortize the weight stream,
        # which a batch already amortizes across rows — speculation is a
        # LATENCY tool for near-empty batches (measured: spec@2 77 tok/s vs
        # plain@2 ~300 on this chip), so it engages only at
        # <= spec_max_rows live rows, and a low acceptance EMA bans it for
        # the rest of the batch
        self.spec_max_rows = spec_max_rows
        self.spec_min_accept = spec_min_accept
        # measured-rate auto-tuner (cross-batch): committed-tokens/sec EMA
        # per (mode, live-row count). Raw acceptance is the wrong criterion
        # — what matters is tokens delivered per wall second including
        # dispatch RTT — so spec stays engaged only while its MEASURED rate
        # at the current row count beats plain chunks', re-probing
        # periodically in case the workload drifts. Dispatches at a
        # not-yet-seen jit shape are excluded from timing (compile wall).
        self.spec_reprobe_every = 64
        self._mode_rate: dict = {}   # (mode, act_n) -> tok/s EMA
        self._spec_skips = 0
        self._warm_shapes: set = set()
        self.window_s = window_ms / 1000.0
        # continuous=False restores pure window batching (gathered batches
        # run to completion; no mid-flight admission) — the A/B baseline
        self.continuous = continuous
        # anti-starvation bound: an incompatible request (anyres/multi-image
        # — ragged token counts) can't join the live batch; once one has
        # waited this long, admission stops so the batch drains and the next
        # _gather() serves it (otherwise a steady compatible stream could
        # keep the batch alive forever while it starves)
        self.fairness_s = fairness_s
        # chunk-view decode (vlm.decode_chunk_paged): gather the pool into a
        # bucketed dense view once per chunk instead of per token — the
        # gather-free serving decode. False = legacy per-token gather path.
        self.chunk_view = chunk_view
        # persistent-view decode (vlm.gather_view + decode_chunk +
        # sync_pool_from_view): carry the dense view ACROSS chunks, sync the
        # pool lazily only at table-consuming boundaries (admission, resize,
        # spec dispatch, bucket growth). Steady-state decode then runs at
        # dense-cache speed (0.99x dense measured vs chunk-view's 0.85x,
        # docs/PERF.md); worst case (admission every chunk) matches the
        # chunk-view's cost. Requires chunk_view.
        self.persist_view = persist_view and chunk_view
        # steady-state dispatch pipelining: when NOTHING is waiting at a
        # chunk boundary (empty queue, no deferred, no spec), the persist
        # branch dispatches up to ``pipeline_depth`` chunks back-to-back and
        # fetches once — the first chunk's host fetch overlaps the second
        # chunk's device time, amortizing the ~25-50 ms tunnel dispatch RTT
        # (the same trick as video.py's dispatch/finish split). Admission
        # latency is untouched whenever anyone is actually waiting: depth
        # collapses to 1 the moment the queue or the deferred list is
        # non-empty at the boundary.
        self.pipeline_depth = max(1, pipeline_depth) if persist_view else 1
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = False
        # paged KV serving: one shared device page pool; rows map pages as
        # they grow and return them on finish (falls back to a dense
        # per-batch cache if a batch can't fit the pool)
        import jax.numpy as jnp

        if paged and getattr(engine, "_kv_dtype", None) == jnp.int8:
            # the paged pool is bf16-only for now; an int8 KV engine falls
            # back to the dense (int8) cache which still halves KV traffic
            logger.info("kv_cache_dtype=int8: paged pool disabled "
                        "(dense int8 cache serves instead)")
            paged = False
        self.paged = paged
        self.page_size = page_size
        self.pool = PagePool(max(1, pool_tokens // page_size)) if paged else None
        # automatic prompt-prefix caching: rows with identical full-page
        # token prefixes share pool pages read-only; admissions prefill
        # only the suffix (docs/PERF.md prefix-caching section).
        # prefix_cache=None (default) is SCALE-AWARE (VERDICT r3 #7): the
        # suffix path's per-layer pool-view gather + host bookkeeping costs
        # ~12 ms per admission, which only pays for itself when the prefill
        # it skips is expensive — measured: 7B admission-TTFT tail 905->139
        # ms (win) vs 0.5B p50 67->79 ms (tax). Auto-enables at >= 1e9
        # decoder params (1.5B and up); pass True/False to force.
        if prefix_cache is None:
            prefix_cache = _decoder_param_count(engine.cfg.decoder) >= 1e9
        self.prefix = (PrefixCache(self.pool, page_size)
                       if paged and prefix_cache else None)
        # chunked admission prefill (the Sarathi/vLLM chunked-prefill idea,
        # TPU-shaped): a cold long-prompt admission prefills in fixed-width
        # chunks interleaved with the live batch's decode chunks, so
        # in-flight rows keep getting decode service instead of stalling for
        # the full prompt (the reference worker serializes whole requests
        # behind a semaphore, model_worker.py:231-244 — the stall is its
        # baseline behavior). Each chunk is one vlm.prefill_continue
        # dispatch at a DYNAMIC offset over the row's 1-row pool view, so
        # every chunk of every admission shares one compiled specialization
        # per (width-bucket, table-width). Scale-aware default like
        # prefix_cache: the decode-service gap only matters when prefill is
        # expensive (7B-class); small models pay extra dispatch RTT for
        # nothing. 0 / False disables; max_pending bounds rows mid-prefill
        # (their pages are held but produce no tokens yet).
        if prefill_chunk is None:
            prefill_chunk = (256 if _decoder_param_count(engine.cfg.decoder)
                             >= 1e9 else 0)
        self.prefill_chunk = int(prefill_chunk or 0)
        self.max_pending = max(1, max_pending)
        self._pool_kv = None  # lazy (k_pages, v_pages) device arrays
        # observability: continuous-batching events (admitted / grown /
        # shrunk / truncated) — serving metrics and test hooks
        import collections
        self.counters = collections.Counter()
        # opt-in event timeline (set to a list): (t, event, *detail) tuples
        # appended at gather/admit/defer/drain/dispatch — debugging and the
        # serving-load diagnosis harness
        self.trace: Optional[list] = None
        # requests an admission scan popped but could not admit
        # (anyres/multi-image, didn't fit) — served FIRST by
        # the next _gather so they never fall behind fresh arrivals.
        # Touched only by the scheduler thread.
        self._deferred: List[_Request] = []
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    # ------------- startup warmup -------------

    def warmup(self, prompt_len: int = 64, max_new_tokens: int = 256,
               sampling=None, admission_prefill: bool = True,
               images: bool = True) -> int:
        """Precompile every decode-dispatch shape a workload with prompts
        up to ``prompt_len`` tokens and ``max_new_tokens`` generation can
        touch: batch buckets {1,2,4,8} x 512-token view buckets x the
        configured dispatch mode. With ``persist_view`` (the default) that
        is the persist program set — gather_view + dense decode_chunk at
        each (batch, view-bucket) + sync_pool_from_view — NOT the plain
        chunk-view program, which a persist config never dispatches
        (VERDICT r3 weak #3: the round-3 warmup covered only plain/spec
        while the default path ran cold). A cold shape hit mid-flight
        stalls the SHARED decode loop for the full XLA compile (measured
        1.7-2.5 s per shape on the tunnel — every in-flight request pays
        it), so a production server calls this once at startup, like the
        reference worker's first warmup generate. Dummy dispatches run with
        all-(-1) block tables (KV writes drop to the sink; the page pool is
        never mapped) and the donated pool arrays are stored back. Returns
        dispatch count."""
        if not self.paged or self.pool is None or not self.chunk_view:
            return 0
        import jax
        import jax.numpy as jnp

        from fastvlm_tpu.models import vlm
        from fastvlm_tpu.ops.kv_cache import PagedKVCache, init_paged_cache
        from fastvlm_tpu.ops.sampling import RowSampling, SamplingParams

        engine = self.engine
        cfg = engine.cfg
        page = self.page_size
        sampling = sampling or SamplingParams()
        pad_to = -(-max(prompt_len, 1) // 64) * 64  # prompt bucket
        k = engine.chunk
        spec_on = (self.spec and getattr(sampling, "temperature", 1.0) == 0.0)
        spec_k = self.spec_draft_k
        spec_m = max(1, -(-engine.chunk // (spec_k + 1)))
        spec_slack = (spec_m * (spec_k + 1) + spec_k + 1) if spec_on else 0
        # the canonical batch-table width (_paged_cache): warm programs ARE
        # the production programs because the width never varies
        pps = self.pool.num_pages
        if self._pool_kv is None:
            c0 = init_paged_cache(
                cfg.decoder.num_layers, 1, self.pool.num_pages, page, pps,
                cfg.decoder.num_kv_heads, cfg.decoder.head_dim,
                engine._dtype)
            self._pool_kv = (c0.k_pages, c0.v_pages)
        cap = pps * page
        lo = _round_bucket(pad_to + k, page)
        hi = _round_bucket(pad_to + max_new_tokens + spec_slack, page)
        buckets = sorted({min(cap, s) for s in range(lo, hi + 512, 512)})
        key = jax.random.PRNGKey(0)
        n = 0
        for nb in (c for c in (1, 2, 4, 8) if c <= self.max_batch):
            for s in buckets:
                def blank_cache():
                    return PagedKVCache(
                        k_pages=self._pool_kv[0], v_pages=self._pool_kv[1],
                        block_tables=jnp.full((nb, pps), -1, jnp.int32),
                        lengths=jnp.zeros((nb,), jnp.int32))

                tok = jnp.zeros((nb,), jnp.int32)
                done = jnp.zeros((nb,), bool)
                # production decode programs take per-row knobs as traced
                # (nb,) arrays (RowSampling) — the warm call must too, or
                # the warmed program is keyed differently and never reused
                rs = RowSampling.build([], nb)
                if self.persist_view:
                    # the production dispatch set: regather (gather_view at
                    # the headroom bucket), dense decode_chunk on the view,
                    # the deferred pool sync (w = chunk width), and the
                    # admission-boundary single-row view refresh
                    vb = min(cap, _round_bucket(s + k, page))
                    if ("persist", nb, vb, k) not in self._warm_shapes:
                        view = vlm.gather_view(blank_cache(), vb)
                        _, _, _, view, key = vlm.decode_chunk(
                            engine.params, cfg, tok, done, view, key, k=k,
                            eos_ids=engine.eos_ids, row_sampling=rs)
                        cache = vlm.sync_pool_from_view(
                            view, blank_cache(), jnp.zeros((nb,), jnp.int32),
                            w=min(8 * k, vb))
                        vlm.update_view_row(view, cache,
                                            jnp.asarray(0, jnp.int32))
                        self._pool_kv = (cache.k_pages, cache.v_pages)
                        self._warm_shapes.add(("persist", nb, vb, k))
                        n += 1
                else:
                    _, _, _, cache, key = vlm.decode_chunk_paged(
                        engine.params, cfg, tok, done, blank_cache(), key,
                        k=k, s_bucket=s, eos_ids=engine.eos_ids,
                        row_sampling=rs)
                    self._pool_kv = (cache.k_pages, cache.v_pages)
                    self._warm_shapes.add(("plain", nb, s, k))
                    n += 1
                if spec_on and nb <= _round_batch(self.spec_max_rows):
                    # hist width mirrors build_spec_state's budget-derived
                    # sizing (prompt + cap + slack), NOT the pool capacity
                    hw = self._hist_width(pad_to + max_new_tokens
                                          + spec_slack)
                    carry = vlm.SpecCarry(
                        last_tok=jnp.zeros((nb,), jnp.int32),
                        done=jnp.zeros((nb,), bool),
                        num=jnp.ones((nb,), jnp.int32),
                        cache=blank_cache(),
                        hist=jnp.zeros((nb, hw), jnp.int32),
                        hist_len=jnp.ones((nb,), jnp.int32))
                    _, _, carry = vlm.spec_chunk_paged(
                        engine.params, cfg, carry, m=spec_m,
                        max_new_tokens=cap, eos_ids=engine.eos_ids,
                        draft_k=spec_k, ngram_n=self.spec_ngram_n,
                        s_bucket=s)
                    # fetch THIS dispatch's output immediately (not just the
                    # pool chain at warmup's end): on the tunnel a first
                    # runtime spec dispatch was observed to stall ~2.3 s
                    # (second one 105 ms) even though the warm call covered
                    # its exact jit key — an eager per-dispatch sync removes
                    # any deferred device-side finalization from the serving
                    # path's first real spec engage
                    np.asarray(carry.hist_len)
                    self._pool_kv = (carry.cache.k_pages,
                                     carry.cache.v_pages)
                    self._warm_shapes.add(("spec", nb, s, spec_m, hw))
                    n += 1
        def row_view(vw):
            return PagedKVCache(
                k_pages=self._pool_kv[0], v_pages=self._pool_kv[1],
                block_tables=jnp.full((1, vw), -1, jnp.int32),
                lengths=jnp.zeros((1,), jnp.int32))

        # every canonical 1-row view width a prompt up to pad_to can take
        # (_admit_widths): view tables bucket by _VIEW_STEP tokens
        vw_steps = sorted(
            {self._admit_widths(t)[1]: t
             for t in range(_VIEW_STEP,
                            -(-pad_to // _VIEW_STEP) * _VIEW_STEP + 1,
                            _VIEW_STEP)}.items())
        if self.prefill_chunk:
            # chunked-admission prefill programs: prefill_continue over a
            # 1-row pool view at every (chunk width bucket x canonical view
            # width) — full chunks pad to the chunk bucket, residues to
            # smaller multiples of engine.bucket; the offset is traced so
            # every boundary shares these.
            wmax = -(-self.prefill_chunk // engine.bucket) * engine.bucket
            for vw, _ in vw_steps:
                for wb in range(engine.bucket, wmax + 1, engine.bucket):
                    key_w = ("pchunk", wb, vw, False)
                    if key_w in self._warm_shapes:
                        continue
                    _, view = engine._prefill_suffix_jit(
                        engine.params, None, jnp.zeros((1, wb), jnp.int32),
                        jnp.asarray([wb], jnp.int32),
                        jnp.asarray([-1], jnp.int32), 0, row_view(vw))
                    self._pool_kv = (view.k_pages, view.v_pages)
                    self._warm_shapes.add(key_w)
                    n += 1
            if images:
                # the image-bearing chunk (encoder-in-prefill): thanks to
                # the forced span boundary in _prefill_chunk_bounds it has
                # ONE canonical width — bucket-rounded num_image_tokens —
                # per view width, so a cold mid-flight image admission
                # never compiles on the shared loop (VERDICT r4 #6; the
                # encoder shapes are static per config)
                simg = cfg.vision.image_size
                wb_img = -(-cfg.num_image_tokens // engine.bucket) \
                    * engine.bucket
                dummy = jnp.zeros((1, simg, simg, 3), engine._dtype)
                for vw, _ in vw_steps:
                    key_i = ("pchunk", wb_img, vw, True)
                    if key_i in self._warm_shapes:
                        continue
                    _, view = engine._prefill_suffix_jit(
                        engine.params, dummy,
                        jnp.zeros((1, wb_img), jnp.int32),
                        jnp.asarray([cfg.num_image_tokens], jnp.int32),
                        jnp.asarray([0], jnp.int32), 0, row_view(vw))
                    self._pool_kv = (view.k_pages, view.v_pages)
                    self._warm_shapes.add(key_i)
                    n += 1
        if admission_prefill:
            # single-shot admission prefill (try_admit's 1-row view
            # prefill, cold prompt): one program per _ADMIT_STEP prompt
            # bucket. A cold bucket hit mid-flight stalls the LIVE batch
            # for the full prefill compile (measured 9.2 s at 1.5B @1024 on
            # the tunnel, scripts/profile_admission.py) — far worse than
            # the decode stalls this method was built for. Text programs
            # only (image admissions compile the encoder-in-prefill program
            # on first use, the reference worker's first-generate cost).
            # Callers on a bench/time budget pass admission_prefill=False.
            for pb in range(_ADMIT_STEP,
                            -(-pad_to // _ADMIT_STEP) * _ADMIT_STEP + 1,
                            _ADMIT_STEP):
                vw = self._admit_widths(pb)[1]
                key_p = ("padmit", pb, vw, False)
                if key_p in self._warm_shapes:
                    continue
                _, view = engine._prefill_jit(
                    engine.params, None, jnp.zeros((1, pb), jnp.int32),
                    jnp.asarray([pb], jnp.int32),
                    jnp.asarray([-1], jnp.int32), row_view(vw))
                self._pool_kv = (view.k_pages, view.v_pages)
                self._warm_shapes.add(key_p)
                n += 1
                if not images or pb < cfg.num_image_tokens:
                    continue  # an image prompt can't fit this bucket
                # single-shot IMAGE admission at the same bucket: the
                # encoder-in-prefill program (configs without chunked
                # prefill admit image requests in one dispatch)
                key_pi = ("padmit", pb, vw, True)
                if key_pi in self._warm_shapes:
                    continue
                simg = cfg.vision.image_size
                _, view = engine._prefill_jit(
                    engine.params,
                    jnp.zeros((1, simg, simg, 3), engine._dtype),
                    jnp.zeros((1, pb), jnp.int32),
                    jnp.asarray([pb], jnp.int32),
                    jnp.asarray([0], jnp.int32), row_view(vw))
                self._pool_kv = (view.k_pages, view.v_pages)
                self._warm_shapes.add(key_pi)
                n += 1
            if self.prefix is not None:
                # prefix-hit admissions prefill only the suffix
                # (prefill_continue at a traced offset): one program per
                # (suffix bucket x canonical view width) with sb bounded by
                # the view's token span
                for vw, w_tok in vw_steps:
                    for sb in range(_ADMIT_STEP, w_tok + 1, _ADMIT_STEP):
                        key_s = ("pchunk", sb, vw, False)
                        if key_s in self._warm_shapes:
                            continue
                        _, view = engine._prefill_suffix_jit(
                            engine.params, None,
                            jnp.zeros((1, sb), jnp.int32),
                            jnp.asarray([sb], jnp.int32),
                            jnp.asarray([-1], jnp.int32), 0, row_view(vw))
                        self._pool_kv = (view.k_pages, view.v_pages)
                        self._warm_shapes.add(key_s)
                        n += 1
        np.asarray(self._pool_kv[0].ravel()[0])  # host fetch = real sync
        return n

    # ------------- speculative auto-tuner -------------

    def _spec_preferred(self, n: int) -> bool:
        """Cross-batch decision: run verify passes only while their measured
        committed-tok/s at ``n`` live rows beats plain chunks' (both EMAs,
        compile dispatches excluded). Unknown spec rate -> probe spec;
        unknown plain rate -> run plain to learn it; losing spec re-probes
        every ``spec_reprobe_every`` skipped chunks (workloads drift)."""
        rs = self._mode_rate.get(("spec", n))
        rp = self._mode_rate.get(("plain", n))
        if rs is None:
            return True
        if rp is None:
            return False
        if rs >= rp:
            return True
        self._spec_skips += 1
        if self._spec_skips >= self.spec_reprobe_every:
            self._spec_skips = 0
            self.counters["spec_reprobe"] += 1
            return True
        self.counters["spec_rate_skips"] += 1
        return False

    def _note_rate(self, shape_key, act_n: int, committed: int,
                   dt: float) -> None:
        """Update the (mode, live-rows) committed-tok/s EMA for a decode
        dispatch. The first dispatch at a new jit shape is warmup (XLA
        compile wall) and only marks the shape seen. ``committed`` for plain
        chunks is the k*rows capacity — the safe bias: spec must beat what
        plain could deliver, not what post-EOS rows happened to use."""
        mode = "spec" if shape_key[0] == "spec" else "plain"
        self.counters[f"disp_{mode}@{act_n}"] += 1
        self.counters[f"ms_{mode}@{act_n}"] += int(dt * 1000)
        if self.trace is not None:
            self.trace.append((time.perf_counter(), "disp", shape_key,
                               act_n, committed, round(dt * 1000, 1)))
        if shape_key not in self._warm_shapes:
            self._warm_shapes.add(shape_key)
            return
        rate = committed / max(dt, 1e-6)
        prev = self._mode_rate.get((mode, act_n))
        self._mode_rate[(mode, act_n)] = (
            rate if prev is None else 0.5 * prev + 0.5 * rate)

    # ------------- client side -------------

    def submit(self, prompt: str, image=None, *, max_new_tokens: int = 256,
               sampling=None, stop_strings: Tuple[str, ...] = (),
               cancel: Optional[threading.Event] = None) -> Iterator[dict]:
        """``cancel``: set it (from any thread) to abort the request — the
        scheduler closes its stream, frees its pages and batch slot at the
        next chunk boundary (finish_reason "cancelled")."""
        from fastvlm_tpu.ops.sampling import SamplingParams

        req = _Request(prompt, image, max_new_tokens,
                       sampling or SamplingParams(), queue.Queue(),
                       tuple(stop_strings), cancel=cancel)
        self.queue.put(req)
        while True:
            item = req.out.get()
            if item is _SENTINEL:
                return
            yield item

    def shutdown(self):
        self._stop = True
        # join the loop thread so a successor scheduler (tests, bench A/Bs)
        # never overlaps TPU dispatches with this one
        if self.thread is not threading.current_thread():
            self.thread.join(timeout=30)

    # ------------- scheduler side -------------

    def _gather(self) -> List[_Request]:
        if self._deferred:
            first = self._deferred.pop(0)
        else:
            try:
                first = self.queue.get(timeout=0.1)
            except queue.Empty:
                return []
        batch = [first]
        # drain deferred requests before fresh arrivals (per-row sampling
        # makes every config batch-compatible — RowSampling in _run_batch —
        # so deferral only ever means "didn't fit last time")
        for r in list(self._deferred):
            if len(batch) >= self.max_batch:
                break
            batch.append(r)
            self._deferred.remove(r)
        deadline = time.perf_counter() + self.window_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self.queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while not self._stop:
            batch = self._gather()
            if not batch:
                continue
            if self.trace is not None:
                self.trace.append((time.perf_counter(), "batch_start",
                                   len(batch)))
            try:
                self._run_batch(batch)
            except Exception as e:  # surface errors to every waiter
                logger.exception("batch failed")
                for r in batch:
                    r.out.put({"error": str(e)})
                    r.out.put(_SENTINEL)

    def _alloc_pages(self, n: int) -> Optional[List[int]]:
        """pool.alloc with prefix-cache eviction: registry-pinned pages are
        a cache, not a reservation — live rows always win."""
        got = self.pool.alloc(n)
        if got is None and self.prefix is not None \
                and self.prefix.evict_for(n):
            self.counters["prefix_evicted_for_rows"] += 1
            got = self.pool.alloc(n)
        return got

    def _admit_widths(self, plen: int) -> Tuple[int, int]:
        """(ids_bucket, table_width) for a 1-row admission/chunk view over
        a ``plen``-token prompt — canonical (prompt-derived) so the program
        set is enumerable by warmup(): ids round to _ADMIT_STEP tokens,
        the view's block table to _VIEW_STEP tokens' worth of pages.
        table_width * page always covers ids_bucket >= plen."""
        pb = -(-max(plen, 1) // _ADMIT_STEP) * _ADMIT_STEP
        w_tok = -(-pb // _VIEW_STEP) * _VIEW_STEP
        return pb, min(self.pool.num_pages, -(-w_tok // self.page_size))

    def _hist_width(self, budget_max: int) -> int:
        """Spec-carry history width for a batch whose largest per-row token
        budget (prompt + cap + spec slack) is ``budget_max``: bucket-rounded
        to 512 so the compiled spec program set stays enumerable, plus the
        draft slack. Sized from the ROW budget, not the canonical block-table
        width — tables span the whole pool (_paged_cache), and a pool-sized
        hist inflated every spec re-arm's host alloc + device upload and the
        ngram-draft match width by ~the pool/envelope ratio (ADVICE r4)."""
        w = -(-max(budget_max, 1) // 512) * 512
        return (min(w, self.pool.num_pages * self.page_size)
                + self.spec_draft_k + 1)

    def _paged_cache(self, b, pad_to, max_new, lens_host, n_real):
        """Map prompt pages for each real row; returns (cache, row_pages,
        tables) or None if the pool can't hold the prompts. Pad rows keep an
        all-(-1) table: their cache writes are dropped on device."""
        import jax.numpy as jnp

        from fastvlm_tpu.ops.kv_cache import PagedKVCache, init_paged_cache

        cfg = self.engine.cfg
        page = self.page_size
        # CANONICAL table width: every batch's block tables span the whole
        # pool, whatever its envelope. The width is a compile-time shape of
        # every paged program (gather_view, decode chunks, spec, prefill) —
        # deriving it from the batch envelope made each distinct
        # (prompt, max_new) workload a fresh program family that warmup()
        # could never predict (measured: 3-9 s XLA stalls on the first
        # admission into any batch whose envelope differed from warmup's).
        # Width costs nothing where it matters: decode paths slice tables
        # to the runtime length bucket before gathering, and writes gather
        # page ids per position, not per column. Only the (B, pps) int32
        # upload grows (32 KB at pool 64Ki/page 64 — noise on the tunnel).
        pps = self.pool.num_pages
        if self._pool_kv is None:
            c0 = init_paged_cache(
                cfg.decoder.num_layers, b, self.pool.num_pages, page, pps,
                cfg.decoder.num_kv_heads, cfg.decoder.head_dim,
                self.engine._dtype)
            self._pool_kv = (c0.k_pages, c0.v_pages)
        tables = np.full((b, pps), -1, np.int32)
        row_pages: List[List[int]] = [[] for _ in range(b)]
        for i in range(n_real):
            n = -(-int(lens_host[i]) // page)
            got = self._alloc_pages(n)
            if got is None:
                for pgs in row_pages:
                    self.pool.release(pgs)
                return None
            row_pages[i] = got
            tables[i, :n] = got
        cache = PagedKVCache(
            k_pages=self._pool_kv[0], v_pages=self._pool_kv[1],
            block_tables=jnp.asarray(tables),
            lengths=jnp.zeros((b,), jnp.int32))
        return cache, row_pages, tables

    def _grow_pages(self, cache, tables, row_pages, cur_len, finished, slots,
                    k, reasons=None, force=False, budget=None, pending=()):
        """Chunk-boundary page accounting: free straggler pages of finished
        rows, map pages covering the next k tokens of each active row
        (``cur_len[i]`` = row i's current device length). Exhaustion
        truncates the row (finishes it) rather than stalling the batch;
        ``reasons[i]`` records "truncated" so the client can tell a cut
        answer from a complete one (ADVICE r2). ``force`` pushes the host
        tables to the device even with no new mappings (a just-closed row
        zeroed its table so its post-finish writes drop instead of landing
        in pages the pool may re-issue). ``pending`` = slot indices still
        mid-prefill (chunked admission): they already hold their prompt's
        pages, decode nothing (cur_len=0), and their HOST table row must
        stay -1 until activation — growing them would map pages into the
        sink row and desync row_pages from the table (ADVICE r4)."""
        import jax.numpy as jnp

        page = self.page_size
        pps = tables.shape[1]
        changed = force
        for i in range(len(finished)):
            if i in pending:
                continue
            if finished[i] or slots[i] is None:
                if row_pages[i]:
                    self.pool.release(row_pages[i])
                    row_pages[i] = []
                    tables[i, :] = -1  # device writes for this row now drop
                    changed = True
                continue
            # device lengths advance k per chunk for every row; budget[i]
            # (prompt + cap + spec slack) bounds the pages a row can ever
            # NEED — full-width chunks overshoot small caps, and those
            # writes drop unmapped (tokens past the cap are discarded, and
            # no kept token attends past the budget)
            target = min(cur_len[i] + k, pps * page)
            if budget is not None:
                target = min(target, budget[i])
            need = -(-max(target, 1) // page)
            delta = need - len(row_pages[i])
            if delta <= 0:
                continue
            got = self._alloc_pages(delta)
            if got is None:
                logger.warning(
                    "page pool exhausted (%d rows in flight); truncating row %d",
                    sum(sl is not None and not f
                        for sl, f in zip(slots, finished)), i)
                finished[i] = True
                if reasons is not None:
                    reasons[i] = "truncated"
                self.counters["truncated"] += 1
                self.pool.release(row_pages[i])
                row_pages[i] = []
                tables[i, :] = -1
                changed = True
                continue
            tables[i, len(row_pages[i]):need] = got
            row_pages[i].extend(got)
            changed = True
        if changed:
            cache = cache._replace(block_tables=jnp.asarray(tables))
        return cache

    def _batchable(self, r: _Request) -> bool:
        """Requests the batched decode loop can serve (anyres PIL merges and
        multi-image prompts have ragged token counts — served serially)."""
        cfg = self.engine.cfg
        anyres = (cfg.image_aspect_ratio == "anyres"
                  and cfg.image_grid_pinpoints
                  and hasattr(r.image, "convert"))
        multi = isinstance(r.image, (list, tuple)) and len(r.image) > 1
        return not (anyres or multi)

    def _run_batch(self, batch: List[_Request]):
        import jax
        import jax.numpy as jnp

        from fastvlm_tpu.models import vlm
        from fastvlm_tpu.ops.kv_cache import init_cache
        from fastvlm_tpu.ops.sampling import RowSampling, sample, sample_rows
        from fastvlm_tpu.ops.splice import pad_batch

        engine = self.engine
        cfg = engine.cfg
        # requests cancelled while queued never prefill
        live = []
        for r in batch:
            if r.cancelled:
                self.counters["cancelled"] += 1
                r.out.put(_SENTINEL)
            else:
                live.append(r)
        batch = live
        if not batch:
            return
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
                    if r.cancelled:
                        # closing the generator stops the decode loop at
                        # its next yield (serial-path cancellation)
                        self.counters["cancelled"] += 1
                        break
                    r.out.put(update)
                r.out.put(_SENTINEL)
            return

        # per-request prep through the engine's own path
        prepped = [engine.prepare(r.prompt, r.image) for r in batch]
        # canonical prefill width: batch prompts pad to _ADMIT_STEP buckets
        # (same rationale as admission views — 4x fewer prefill programs
        # than the engine's 64-token buckets for sub-ms of pad compute)
        pad_to = max(int(p["ids"].shape[1]) for p in prepped)
        pad_to = -(-pad_to // _ADMIT_STEP) * _ADMIT_STEP
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
        # speculative greedy serving (vlm.spec_chunk_paged): verify passes
        # write k+1 slots past each row's length and a chunk commits up to
        # width = m*(k+1) tokens — size block tables and the admission guard
        # with that slack so live rows' writes never leave the mapped /
        # in-view region (the spec_chunk_paged caller contract). Spec is
        # greedy-only; with per-row sampling it stays armed whenever the
        # INITIAL batch is all-greedy and the per-iteration want_spec check
        # drops it the moment a sampled row is admitted.
        spec_on = (self.spec and self.paged and self.chunk_view
                   and all(getattr(r.sampling, "temperature", 1.0) <= 0.0
                           for r in batch))
        spec_k = self.spec_draft_k
        spec_m = max(1, -(-self.engine.chunk // (spec_k + 1)))
        spec_width = spec_m * (spec_k + 1)
        spec_slack = (spec_width + spec_k + 1) if spec_on else 0
        # cur_len[i] = row i's current device length (prompt + committed)
        cur_len = [len(r) for r in rows]
        cache = row_pages = tables = None
        if self.paged:
            made = self._paged_cache(b, pad_to, max_new + spec_slack,
                                     cur_len, n_real)
            if made is None:
                logger.warning("page pool (%d pages) can't hold batch prompts;"
                               " dense fallback", self.pool.num_pages)
            else:
                cache, row_pages, tables = made
        if cache is None:
            cache = init_cache(cfg.decoder.num_layers, b, pad_to + max_new,
                               cfg.decoder.num_kv_heads, cfg.decoder.head_dim,
                               engine._kv_dtype)

        spec_on = spec_on and tables is not None
        # per-row prompt ids (draft corpus seed); admitted rows append theirs
        prompt_ids: List[np.ndarray] = [np.asarray(r, np.int32)
                                        for r in rows]
        # slot state: slots[i] = the request occupying row i (None = free).
        # Freed rows are re-filled by continuous admission (paged mode).
        slots: List[Optional[_Request]] = [
            batch[i] if i < n_real else None for i in range(b)]
        texts: List[List[int]] = [[] for _ in range(b)]
        finished = [slots[i] is None for i in range(b)]
        # per-row finish reason: None while streaming, then "stop" (eos/
        # stop string), "length" (max_new cap), or "truncated" (pool
        # exhaustion — distinguishes a cut answer from a complete one)
        reasons: List[Optional[str]] = [None] * b
        caps = [slots[i].max_new_tokens if slots[i] else 0 for i in range(b)]
        # per-row page budget: prompt + cap (+ spec slack) tokens is all a
        # row's kept tokens can ever attend to — growth never maps past it
        budget_tok = [cur_len[i] + caps[i] + spec_slack if slots[i] else 0
                      for i in range(b)]
        emitted = [0] * b
        ttfts = [0.0] * b
        queue_ms = [0.0] * b
        tables_dirty = False  # host tables changed; push at next boundary
        # persistent-view decode state: pview carries the dense working view
        # across chunks; the pool's generated columns are stale until
        # flush_view scatters them back (k columns per decoded chunk, one
        # compiled program reused). pview_base = pool lengths at gather time
        # (host-tracked: cur_len mirrors device lengths for live rows; dead
        # rows' stale entries scatter through their zeroed tables and drop).
        pview = None
        pview_chunks = 0
        pview_base = None
        # rows whose slot identity was rebound since the view was last
        # gathered/updated: refreshed one-by-one at the next persist
        # dispatch (vlm.update_view_row, 1/B of a regather) instead of
        # dropping the whole view at every admission boundary
        pview_stale: set = set()
        # chunked admission prefill: slot index -> mid-prefill state. A
        # pending row occupies its slot (keeps the loop alive, blocks
        # re-admission) and holds its pages in row_pages[i], but its HOST
        # table row stays -1 — the device never sees its pages until
        # activation, so decode writes for the row (done=True) drop into
        # the sink and view syncs can't touch its prefilled KV.
        pending: Dict[int, dict] = {}

        # per-row sampling knobs as traced (B,) arrays: ONE compiled decode
        # program serves any greedy/sampled mix, and admissions/finishes
        # just re-upload three tiny vectors instead of re-keying the jit
        # (free slots sample greedily into masked done rows). Cached by a
        # host fingerprint so steady state uploads nothing new.
        _rs_cache = {"sig": None, "rs": None}

        def row_samp():
            sig = (b, tuple(
                None if sl is None else (sl.sampling.temperature,
                                         sl.sampling.top_p, sl.sampling.top_k)
                for sl in slots))
            if _rs_cache["sig"] != sig:
                _rs_cache["sig"] = sig
                _rs_cache["rs"] = RowSampling.build(
                    [sl.sampling if sl else None for sl in slots], b)
            return _rs_cache["rs"]

        def flush_view(cache, keep=False):
            """Sync the pool from the persistent view. Called before
            anything that reads pool KV or row identity (admission prefill,
            resize, spec dispatch, re-gather). ``keep=False`` drops the
            view (row layout is about to change: resize/spec/regather);
            ``keep=True`` retains it — after the sync the view is still
            authoritative for every row whose slot identity is unchanged,
            so an admission only has to refresh ITS row (pview_stale →
            vlm.update_view_row) instead of paying a full pool regather."""
            nonlocal pview, pview_chunks, pview_base
            if pview is None:
                return cache
            # one WIDE sync instead of one per accumulated chunk: w is
            # static min(8k, view width) — a single program per (b, vb)
            # shape, ceil(total/w) dispatches. Over-wide windows are safe
            # (sync_pool_from_view docstring: the start clamp re-writes
            # earlier columns with their own authoritative view values,
            # unmapped slots drop, future slots are masked by lengths), so
            # a 10-chunk backlog flushes in 2 dispatches, not 10 — the
            # admission-boundary cost VERDICT r4 #3 charged.
            total = pview_chunks * flush_view.k
            w = min(8 * flush_view.k, pview.max_len)
            off = 0
            while off < total:
                cache = vlm.sync_pool_from_view(
                    pview, cache, jnp.asarray(pview_base + off, np.int32),
                    w=w)
                self.counters["view_syncs"] += 1
                off += w
            if keep:
                pview_base = pview_base + pview_chunks * flush_view.k
                pview_chunks = 0
            else:
                pview = None
                pview_chunks = 0
                pview_base = None
                pview_stale.clear()
            return cache

        flush_view.k = 0  # set once the chunk width is known

        def n_active() -> int:
            return sum(sl is not None for sl in slots)

        def emit(i: int):
            """Push row i's cumulative update; the moment the row finishes,
            close ITS stream (sentinel) and release its pages — clients never
            wait for the rest of the batch to drain."""
            nonlocal tables_dirty
            r = slots[i]
            text = engine.tokenizer.decode(texts[i], skip_special_tokens=True)
            for ss in r.stop_strings:
                if ss and ss in text:
                    text = text.split(ss)[0]
                    finished[i] = True
                    reasons[i] = reasons[i] or "stop"
            if finished[i] and reasons[i] is None:
                reasons[i] = "length" if emitted[i] >= caps[i] else "stop"
            r.out.put({"text": text,
                       "stats": {"ttft_ms": round(ttfts[i], 2),
                                 "queue_ms": round(queue_ms[i], 2),
                                 "decode_tokens": len(texts[i]),
                                 "batch_size": n_active(),
                                 "finish_reason": reasons[i]}})
            if finished[i]:
                r.out.put(_SENTINEL)
                if tables is not None and row_pages[i]:
                    self.pool.release(row_pages[i])
                    row_pages[i] = []
                    tables[i, :] = -1
                    tables_dirty = True  # device writes must drop next chunk
                slots[i] = None

        def first_token(i: int, t: int):
            """Record row i's prefill-sampled token and stream the first
            update (closing immediately on EOS / a 1-token cap)."""
            if t in engine.eos_ids:
                finished[i] = True
                reasons[i] = "stop"
            else:
                texts[i].append(t)
                emitted[i] = 1
                if emitted[i] >= caps[i]:
                    finished[i] = True
                    reasons[i] = "length"
            emit(i)

        def resize(new_b, cache, ht, hd):
            """Re-bucket the live batch to ``new_b`` rows (paged mode only).
            The page pool is batch-size-independent; the only b-shaped state
            is host-rebuildable (block tables, lengths, last tok, done, and
            the per-row bookkeeping lists), so growing to admit one more
            request — or shrinking when a long tail leaves most rows idle —
            costs one small host->device upload plus an (amortized, cached)
            decode recompile at the new bucket. Occupied rows compact to the
            front; ht/hd are HOST copies of (tok, done)."""
            nonlocal b, tables, tables_dirty, slots, texts, finished, \
                reasons, caps, emitted, ttfts, queue_ms, cur_len, row_pages, \
                spec_live, prompt_ids, budget_tok
            # the persistent view is row-indexed against the CURRENT tables:
            # sync it back while row identity still matches (compaction below
            # would scatter its pending columns into the wrong rows) and drop
            # it so the next chunk regathers at the new batch bucket. This is
            # the round-3 HEAD regression (VERDICT r3 weak #1): the shrink
            # path resized without flushing, leaving a stale-batch view whose
            # later sync corrupted the pool's lengths.
            cache = flush_view(cache)
            mapping = [i for i in range(b) if slots[i] is not None]
            # spec state is row-indexed: invalidate it and let the next
            # iteration's decision rebuild from host state (prompt_ids +
            # texts) at the new b — device-side row surgery here compiled
            # tiny scatter executables (~1.4 s each on the tunnel, measured)
            spec_live = False
            lens_old = np.asarray(cache.lengths)
            new_tables = np.full((new_b, tables.shape[1]), -1, np.int32)
            new_lens = np.zeros((new_b,), lens_old.dtype)
            nt = np.zeros((new_b,), ht.dtype)
            nd = np.ones((new_b,), bool)

            def moved(src, pad):
                out = [pad() for _ in range(new_b)]
                for j, i in enumerate(mapping):
                    out[j] = src[i]
                return out

            for j, i in enumerate(mapping):
                new_tables[j] = tables[i]
                new_lens[j] = lens_old[i]
                nt[j] = ht[i]
                nd[j] = hd[i]
            slots = moved(slots, lambda: None)
            texts = moved(texts, list)
            finished = moved(finished, lambda: True)
            reasons = moved(reasons, lambda: None)
            caps = moved(caps, lambda: 0)
            budget_tok = moved(budget_tok, lambda: 0)
            emitted = moved(emitted, lambda: 0)
            ttfts = moved(ttfts, lambda: 0.0)
            queue_ms = moved(queue_ms, lambda: 0.0)
            cur_len = moved(cur_len, lambda: 0)
            row_pages = moved(row_pages, list)
            prompt_ids = moved(prompt_ids,
                               lambda: np.zeros((0,), np.int32))
            # mid-prefill rows move with their slots (ascending order is
            # collision-free: compaction only maps indices downward)
            remap = {i: j for j, i in enumerate(mapping)}
            for old_i in sorted(pending):
                pending[remap[old_i]] = pending.pop(old_i)
            b = new_b
            tables = new_tables
            tables_dirty = False  # _replace below pushes them
            cache = cache._replace(block_tables=jnp.asarray(tables),
                                   lengths=jnp.asarray(new_lens))
            return cache, nt, nd

        def try_admit(cache, tok, done, key):
            """Continuous batching (the TPU answer to the reference's
            serialize-behind-a-semaphore worker, model_worker.py:231-244,
            scaled past window batching): fill freed rows with queued
            compatible requests at a chunk boundary — growing the batch
            bucket when every row is live. The prompt prefills through a
            1-row PagedKVCache view over the SAME pool arrays, so its KV
            lands directly in the pages just allocated for it; the batch
            cache is then rebuilt around the returned pool arrays."""
            nonlocal tables_dirty, admitting, spec_live
            from fastvlm_tpu.ops.kv_cache import PagedKVCache
            ht = hd = None  # lazy host copies of (tok, done)
            if self._deferred and (time.perf_counter() -
                                   min(d.t_submit for d in self._deferred)
                                   > self.fairness_s):
                # anti-starvation: a deferred request (incompatible with this
                # batch, or one admission kept failing to place) has waited
                # past the fairness bound — a steady compatible stream could
                # otherwise keep the batch alive forever. Stop admitting so
                # the batch drains; _gather() serves deferred requests first.
                admitting = False
                self.counters["drained_for_fairness"] += 1
                if self.trace is not None:
                    self.trace.append((time.perf_counter(), "drain",
                                       len(self._deferred)))
                return cache, tok, done, key
            # bound the admissions per chunk boundary to the requests already
            # waiting when it started: on a loaded host an admission
            # (prepare + 1-row prefill) can take longer than the arrival
            # gap, and an unbounded loop then admits forever while in-flight
            # rows get zero decode service (observed: 7 admissions, 4.4 s,
            # no dispatches). Later arrivals wait one boundary — that's the
            # continuous-batching contract anyway.
            budget = len(self._deferred) + self.queue.qsize()
            while not self._stop and budget > 0:
                budget -= 1
                # deferred batchable requests first (e.g. deferred at
                # capacity: a freed slot must go to them, not fresh arrivals)
                r = next((d for d in self._deferred
                          if self._batchable(d)), None)
                if r is not None:
                    self._deferred.remove(r)
                else:
                    try:
                        r = self.queue.get_nowait()
                    except queue.Empty:
                        break
                if r.cancelled:
                    self.counters["cancelled"] += 1
                    r.out.put(_SENTINEL)
                    continue
                if not self._batchable(r):
                    # anyres/multi-image can't share the static-shape batch;
                    # sampling config never defers (per-row RowSampling)
                    self._deferred.append(r)
                    if self.trace is not None:
                        self.trace.append((time.perf_counter(), "defer",
                                           "shape"))
                    continue  # batchable requests behind it may still admit
                # admission reads pool KV (1-row prefill view) and pool
                # lengths: sync the persistent view back but KEEP it — only
                # the rebound slot's view row goes stale (refreshed by
                # update_view_row at the next dispatch); every other row's
                # dense columns stay valid, so no full regather
                cache = flush_view(cache, keep=True)
                if n_active() >= b:
                    new_b = _round_batch(n_active() + 1)
                    if b >= self.max_batch or new_b > self.max_batch:
                        self._deferred.append(r)  # batch at capacity
                        if self.trace is not None:
                            self.trace.append((time.perf_counter(), "defer",
                                               "capacity"))
                        break
                    if ht is None:
                        ht = np.asarray(tok).copy()
                        hd = np.asarray(done).copy()
                    self.counters["grown"] += 1
                    t_rs = time.perf_counter()
                    cache, ht, hd = resize(new_b, cache, ht, hd)
                    if self.trace is not None:
                        self.trace.append((time.perf_counter(), "grow",
                                           new_b, round((time.perf_counter()
                                                         - t_rs) * 1000, 1)))
                try:
                    prep = engine.prepare(r.prompt, r.image)
                except Exception as e:  # a bad request must not kill the batch
                    logger.exception("admission prepare failed")
                    r.out.put({"error": str(e)})
                    r.out.put(_SENTINEL)
                    continue
                plen = int(np.asarray(prep["lens"])[0])
                pps = tables.shape[1]
                if plen + r.max_new_tokens + spec_slack > pps * self.page_size:
                    self._deferred.append(r)  # needs a wider table: next batch
                    break
                ids_row = np.asarray(prep["ids"][0], np.int32)[:plen]
                start0 = int(np.asarray(prep["starts"])[0])
                cached_len, shared = 0, []
                if self.prefix is not None and prep["vision_embeds"] is None:
                    # prefix reuse bound: before the first image slot (image
                    # KV depends on pixels, not ids) and strictly before the
                    # last prompt token (its logits must be recomputed to
                    # sample tok0)
                    bound = min(start0 if start0 >= 0 else plen, plen - 1)
                    cached_len, shared = self.prefix.lookup(
                        ids_row[:max(bound, 0)])
                need = -(-plen // self.page_size)
                got = self._alloc_pages(need - len(shared))
                if got is None:
                    self.pool.release(shared)  # hand back the row's refs
                    self._deferred.append(r)  # pool full; retry next boundary
                    break
                row_pgs = shared + got
                i = slots.index(None)
                sfx_len = plen - cached_len
                if (self.prefill_chunk and prep["vision_embeds"] is None
                        and sfx_len > self.prefill_chunk
                        and len(pending) < self.max_pending
                        and n_active() > len(pending)):
                    # chunked admission: reserve the slot and pages, prefill
                    # one chunk per boundary (advance_pending) so the live
                    # rows keep decoding. Host/device tables stay -1 for the
                    # row until activation. Only worth it when someone else
                    # is actually live (otherwise single-shot is one
                    # dispatch) and the prompt is longer than one chunk.
                    row_pages[i] = row_pgs
                    # canonical-width 1-row table (see the single-shot path)
                    tbl = np.full((1, self._admit_widths(plen)[1]), -1,
                                  np.int32)
                    tbl[0, :need] = row_pgs
                    # text-only requests still carry sentinel SLOTS
                    # (build_prompt always inserts the image span), but with
                    # no pixels there is no overlay — chunks may split the
                    # slots freely. Passing the span anyway would widen a
                    # text chunk to ~num_image_tokens, a width warmup()'s
                    # text grid never covers (ADVICE r4 medium).
                    img_s0 = start0 if (start0 >= 0
                                        and prep["images"] is not None) else -1
                    pending[i] = {
                        "r": r, "ids": ids_row, "plen": plen,
                        "start": start0, "images": prep["images"],
                        "cached": cached_len,
                        "bounds": _prefill_chunk_bounds(
                            cached_len, plen, self.prefill_chunk, img_s0,
                            img_s0 + cfg.num_image_tokens
                            if img_s0 >= 0 else -1),
                        "bi": 0, "table": jnp.asarray(tbl),
                        "t0": time.perf_counter(),
                        "wait_ms": (time.perf_counter() - r.t_submit) * 1000,
                    }
                    if cached_len:
                        self.counters["prefix_hits"] += 1
                        self.counters["prefix_hit_tokens"] += cached_len
                    slots[i] = r
                    batch.append(r)
                    texts[i] = []
                    finished[i] = False
                    reasons[i] = None
                    caps[i] = r.max_new_tokens
                    budget_tok[i] = plen + r.max_new_tokens + spec_slack
                    emitted[i] = 0
                    cur_len[i] = 0
                    prompt_ids[i] = ids_row
                    self.counters["chunked_admissions"] += 1
                    if self.trace is not None:
                        self.trace.append((time.perf_counter(), "padmit",
                                           i, plen))
                    continue
                tables[i, :] = -1
                tables[i, :need] = row_pgs
                row_pages[i] = row_pgs
                # the 1-row prefill view gets its own CANONICAL-width table
                # (prompt-derived, warmup-enumerable) — never the batch
                # table's width, which varies with the live envelope and
                # would key a fresh XLA program per batch shape
                pb, vw = self._admit_widths(plen)
                vtbl = np.full((1, vw), -1, np.int32)
                vtbl[0, :need] = row_pgs
                view = PagedKVCache(
                    k_pages=cache.k_pages, v_pages=cache.v_pages,
                    block_tables=jnp.asarray(vtbl),
                    lengths=jnp.zeros((1,), jnp.int32))
                wait_ms = (time.perf_counter() - r.t_submit) * 1000
                t0 = time.perf_counter()
                try:
                    if cached_len:
                        # prefill only the un-cached suffix, attending the
                        # shared prefix pages read-only
                        sfx = ids_row[cached_len:]
                        sb = -(-len(sfx) // _ADMIT_STEP) * _ADMIT_STEP
                        sids = np.zeros((1, sb), np.int32)
                        sids[0, :len(sfx)] = sfx
                        sstarts = np.asarray(
                            [start0 - cached_len if start0 >= 0 else -1],
                            np.int32)
                        logits, view = engine._prefill_suffix_jit(
                            engine.params, prep["images"],
                            jnp.asarray(sids),
                            jnp.asarray([len(sfx)], np.int32),
                            jnp.asarray(sstarts), cached_len, view)
                        self.counters["prefix_hits"] += 1
                        self.counters["prefix_hit_tokens"] += cached_len
                        # same program family as a prefill chunk (traced
                        # offset, 1-row view): record under the pchunk key
                        self._warm_shapes.add(
                            ("pchunk", sb, vw,
                             prep["images"] is not None))
                    else:
                        aids = np.zeros((1, pb), np.int32)
                        aids[0, :plen] = ids_row
                        logits, view = engine._prefill_jit(
                            engine.params, prep["images"], jnp.asarray(aids),
                            prep["lens"], prep["starts"], view,
                            vis=prep["vision_embeds"])
                        self._warm_shapes.add(
                            ("padmit", pb, vw,
                             prep["images"] is not None
                             or prep["vision_embeds"] is not None))
                except Exception as e:
                    # prefill doesn't donate: the pool arrays are intact —
                    # fail this request alone and keep the batch alive
                    logger.exception("admission prefill failed")
                    self.pool.release(row_pages[i])
                    row_pages[i] = []
                    tables[i, :] = -1
                    tables_dirty = True
                    r.out.put({"error": str(e)})
                    r.out.put(_SENTINEL)
                    continue
                key, sub = jax.random.split(key)
                t_new = int(np.asarray(sample(sub, logits, r.sampling))[0])
                if ht is None:
                    ht = np.asarray(tok).copy()
                    hd = np.asarray(done).copy()
                lengths = np.asarray(cache.lengths).copy()
                lengths[i] = plen
                cache = cache._replace(
                    k_pages=view.k_pages, v_pages=view.v_pages,
                    block_tables=jnp.asarray(tables),
                    lengths=jnp.asarray(lengths))
                tables_dirty = False  # _replace above pushed them
                slots[i] = r
                batch.append(r)  # failure envelopes reach admitted rows too
                texts[i] = []
                finished[i] = False
                reasons[i] = None
                caps[i] = r.max_new_tokens
                budget_tok[i] = plen + r.max_new_tokens + spec_slack
                emitted[i] = 0
                cur_len[i] = plen
                prompt_ids[i] = ids_row
                if self.prefix is not None and prep["vision_embeds"] is None:
                    # the row's full prompt pages now hold reusable KV
                    pub = start0 if start0 >= 0 else plen
                    self.prefix.publish(ids_row[:pub], row_pgs)
                ttfts[i] = (time.perf_counter() - t0) * 1000
                queue_ms[i] = wait_ms
                first_token(i, t_new)
                self.counters["admitted"] += 1
                if self.trace is not None:
                    self.trace.append((
                        time.perf_counter(), "admit", i, plen,
                        round(ttfts[i], 1)))
                ht[i] = t_new
                hd[i] = finished[i] or slots[i] is None
                if pview is not None and not hd[i]:
                    pview_stale.add(i)
                # an admission invalidates device spec state (new row's
                # draft corpus isn't in hist): drop it; the next decision
                # rebuilds from host state if speculation is still wanted
                spec_live = False
            if ht is not None:
                tok = jnp.asarray(ht)
                done = jnp.asarray(hd)
            return cache, tok, done, key

        def advance_pending(cache, tok, done, key):
            """One prefill chunk per mid-prefill row (chunked admission):
            vlm.prefill_continue at a dynamic offset over the row's 1-row
            pool view. The view is rebuilt from the CURRENT pool arrays at
            every chunk — prefill doesn't donate, so each chunk returns new
            pool arrays and the batch cache must rebind immediately or
            later view syncs would write into a dead lineage. On the final
            chunk the row activates exactly like a single-shot admission:
            sample tok0 from the chunk's last-position logits, sync+drop
            the persistent view, push tables/lengths."""
            from fastvlm_tpu.ops.kv_cache import PagedKVCache

            nonlocal tables_dirty, spec_live
            ht = hd = None
            for i in sorted(pending):
                st = pending[i]
                c0 = st["bounds"][st["bi"]]
                c1 = st["bounds"][st["bi"] + 1]
                w = c1 - c0
                wb = -(-w // engine.bucket) * engine.bucket
                sids = np.zeros((1, wb), np.int32)
                sids[0, :w] = st["ids"][c0:c1]
                # the prompt template always carries an image span (starts
                # >= 0 even text-only, engine.build_prompt); only pass the
                # pixels when they exist AND this chunk covers the span —
                # the compiled program is keyed by images None/array, not
                # by the traced start offset
                has_img = (st["images"] is not None
                           and c0 <= st["start"] < c1)
                sstarts = np.asarray(
                    [st["start"] - c0 if has_img else -1], np.int32)
                view = PagedKVCache(
                    k_pages=cache.k_pages, v_pages=cache.v_pages,
                    block_tables=st["table"],
                    lengths=jnp.asarray([c0], jnp.int32))
                t_ck = time.perf_counter()
                try:
                    logits, view = engine._prefill_suffix_jit(
                        engine.params,
                        st["images"] if has_img else None,
                        jnp.asarray(sids), jnp.asarray([w], np.int32),
                        jnp.asarray(sstarts), c0, view)
                except Exception as e:
                    # prefill doesn't donate: pool arrays intact — fail this
                    # request alone (same contract as single-shot admission)
                    logger.exception("pending prefill chunk failed")
                    self.pool.release(row_pages[i])
                    row_pages[i] = []
                    pending.pop(i)
                    slots[i] = None
                    finished[i] = True
                    st["r"].out.put({"error": str(e)})
                    st["r"].out.put(_SENTINEL)
                    continue
                # rebind the pool: every later reader (decode gather, view
                # sync, the next pending chunk) must see this chunk's writes
                cache = cache._replace(k_pages=view.k_pages,
                                       v_pages=view.v_pages)
                st["bi"] += 1
                self._warm_shapes.add(
                    ("pchunk", wb, st["table"].shape[1], bool(has_img)))
                self.counters["prefill_chunks"] += 1
                if self.trace is not None:
                    self.trace.append((
                        time.perf_counter(), "pchunk", i, c0, c1,
                        round((time.perf_counter() - t_ck) * 1000, 1)))
                if c1 < st["plen"]:
                    continue
                # final chunk: activate the row
                key, sub = jax.random.split(key)
                t_new = int(np.asarray(sample(sub, logits,
                                              st["r"].sampling))[0])
                if ht is None:
                    ht = np.asarray(tok).copy()
                    hd = np.asarray(done).copy()
                # sync the live rows' generated KV while row i's table is
                # still -1 (its view garbage drops), THEN expose its pages;
                # the view survives — only this row goes stale
                cache = flush_view(cache, keep=True)
                lengths = np.asarray(cache.lengths).copy()
                lengths[i] = st["plen"]
                need = -(-st["plen"] // self.page_size)
                tables[i, :] = -1
                tables[i, :need] = row_pages[i]
                cache = cache._replace(block_tables=jnp.asarray(tables),
                                       lengths=jnp.asarray(lengths))
                tables_dirty = False  # _replace above pushed them
                cur_len[i] = st["plen"]
                if self.prefix is not None:
                    # same bound as single-shot admission: text KV before
                    # the first image slot is id-addressable and reusable
                    pub = st["start"] if st["start"] >= 0 else st["plen"]
                    self.prefix.publish(st["ids"][:pub], row_pages[i])
                ttfts[i] = (time.perf_counter() - st["t0"]) * 1000
                queue_ms[i] = st["wait_ms"]
                first_token(i, t_new)
                self.counters["admitted"] += 1
                if self.trace is not None:
                    self.trace.append((time.perf_counter(), "activate", i,
                                       st["plen"], round(ttfts[i], 1)))
                ht[i] = t_new
                hd[i] = finished[i] or slots[i] is None
                if pview is not None and not hd[i]:
                    pview_stale.add(i)
                spec_live = False
                pending.pop(i)
            if ht is not None:
                tok = jnp.asarray(ht)
                done = jnp.asarray(hd)
            return cache, tok, done, key

        # batch-level prefix reuse: when EVERY gathered row extends the same
        # cached prefix (a burst of template-sharing prompts — the window
        # gather's common case), map the shared pages into every row and
        # prefill only the suffixes. One offset serves the batch (the
        # longest prefix common to all rows); rows bound it by their first
        # image slot and their last prompt token (its logits seed sampling).
        batch_cached = 0
        if self.prefix is not None and tables is not None and n_real:
            bounds = [min(starts_l[i] if starts_l[i] >= 0
                          else len(prompt_ids[i]), len(prompt_ids[i]) - 1)
                      for i in range(n_real)]
            # peek(ids[:bound]) is page-aligned and <= bound, so the min is
            # a valid common offset for every row
            batch_cached = min(self.prefix.peek(prompt_ids[i][:max(bounds[i],
                                                                   0)])
                               for i in range(n_real))
            if batch_cached:
                n_shared = batch_cached // self.page_size
                taken = []
                for i in range(n_real):
                    ln, shared = self.prefix.lookup(
                        prompt_ids[i][:batch_cached])
                    if ln != batch_cached:  # exact entry evicted under us
                        self.pool.release(shared)
                        for j, pgs in taken:
                            self.pool.release(pgs)
                        taken = None
                        break
                    taken.append((i, shared))
                if taken is None:
                    batch_cached = 0
                else:
                    for i, shared in taken:
                        self.pool.release(row_pages[i][:n_shared])
                        row_pages[i][:n_shared] = shared
                        tables[i, :n_shared] = shared
                    cache = cache._replace(block_tables=jnp.asarray(tables))
                    self.counters["prefix_hits"] += n_real
                    self.counters["prefix_hit_tokens"] += \
                        batch_cached * n_real

        batch_ok = False
        try:
            # everything from the prefill dispatch onward runs under
            # the try: a PREFILL failure must also release the pages
            # and drop the possibly-donated pool arrays (review r2)
            t0 = time.perf_counter()
            if batch_cached:
                sfx_rows = [prompt_ids[i][batch_cached:] for i in range(b)]
                sfx_pad = -(-max(len(s) for s in sfx_rows[:n_real])
                            // _ADMIT_STEP) * _ADMIT_STEP
                sids = np.zeros((b, sfx_pad), np.int32)
                slens = np.zeros((b,), np.int32)
                sstarts = np.full((b,), -1, np.int32)
                for i in range(n_real):
                    sids[i, :len(sfx_rows[i])] = sfx_rows[i]
                    slens[i] = len(sfx_rows[i])
                    if starts_l[i] >= 0:
                        sstarts[i] = starts_l[i] - batch_cached
                logits, cache = engine._prefill_suffix_jit(
                    engine.params, jnp.asarray(np.stack(imgs), engine._dtype),
                    jnp.asarray(sids), jnp.asarray(slens),
                    jnp.asarray(sstarts), batch_cached, cache)
            else:
                logits, cache = engine._prefill_jit(
                    engine.params, jnp.asarray(np.stack(imgs), engine._dtype),
                    jnp.asarray(ids), jnp.asarray(lens), jnp.asarray(starts),
                    cache)
            key = jax.random.PRNGKey(time.time_ns() % 2**31)
            key, sub = jax.random.split(key)
            tok = sample_rows(sub, logits, row_samp())
            ttft_ms = (time.perf_counter() - t0) * 1000

            host_tok = np.asarray(tok)
            if self.prefix is not None and tables is not None:
                # the gathered rows' prompt pages now hold reusable KV —
                # publish so later admissions prefill only their suffix
                for i in range(n_real):
                    pub = (starts_l[i] if starts_l[i] >= 0
                           else len(prompt_ids[i]))
                    self.prefix.publish(prompt_ids[i][:pub], row_pages[i])
            for i in range(b):
                if slots[i] is None:
                    continue
                ttfts[i] = ttft_ms
                queue_ms[i] = (t0 - slots[i].t_submit) * 1000
                first_token(i, int(host_tok[i]))

            done = jnp.asarray(
                [finished[i] or slots[i] is None for i in range(b)])
            num = hist = hist_len = None
            admitting = tables is not None and self.continuous
            # full-width chunks always: one compiled decode program per
            # (batch, view-bucket) instead of one per distinct max_new < 16
            # (caps end rows host-side; page sizing already covers the
            # chunk overshoot via _grow_pages' cur_len + k target)
            k = engine.chunk
            flush_view.k = k
            # adaptive speculation state: spec_live tracks whether the CURRENT
            # chunk uses verify passes; histories are rebuilt from host state
            # (prompt_ids + texts) on every entry, so spec can switch on/off
            # as rows come and go
            spec_live = False
            spec_banned = False
            spec_ema = None
            spec_chunks = 0
            # consecutive under-occupied boundaries (shrink hysteresis)
            under_occ = 0

            def build_spec_state():
                hist_w = self._hist_width(
                    max(budget_tok[i] for i in range(b)
                        if slots[i] is not None))
                hh = np.zeros((b, hist_w), np.int32)
                hl = np.zeros((b,), np.int32)
                nm = np.ones((b,), np.int32)
                for i in range(b):
                    if slots[i] is None:
                        continue
                    p = prompt_ids[i]
                    t = texts[i]
                    hh[i, :len(p)] = p
                    hh[i, len(p):len(p) + len(t)] = t
                    hl[i] = len(p) + len(t)
                    nm[i] = max(1, len(t))
                return jnp.asarray(hh), jnp.asarray(hl), jnp.asarray(nm)
            def sweep_cancelled():
                """Abort client-cancelled rows at the chunk boundary
                (VERDICT r4 #5; reference FastVLMModel.swift:141-151): the
                stream closes, pages release via the normal finish path,
                and mid-prefill rows drop their reserved pages. Device-side
                the row behaves exactly like a host-finished (length-capped)
                row: its writes drop through the zeroed table."""
                nonlocal tables_dirty
                for i in range(b):
                    r = slots[i]
                    if r is None or not r.cancelled:
                        continue
                    self.counters["cancelled"] += 1
                    if self.trace is not None:
                        self.trace.append((time.perf_counter(), "cancel", i))
                    if i in pending:
                        pending.pop(i)
                        if tables is not None and row_pages[i]:
                            self.pool.release(row_pages[i])
                            row_pages[i] = []
                            tables[i, :] = -1
                            tables_dirty = True
                        slots[i] = None
                        finished[i] = True
                        r.out.put(_SENTINEL)
                        continue
                    if not finished[i]:
                        finished[i] = True
                        reasons[i] = "cancelled"
                        emit(i)

            while n_active() > 0 or (admitting and not self._stop
                                     and not self.queue.empty()):
                if self.trace is not None:
                    self.trace.append((time.perf_counter(), "iter",
                                       n_active(), b, spec_live))
                sweep_cancelled()
                if admitting:
                    cache, tok, done, key = try_admit(cache, tok, done, key)
                if pending:
                    cache, tok, done, key = advance_pending(cache, tok, done,
                                                            key)
                if self.trace is not None:
                    self.trace.append((time.perf_counter(), "post_admit"))
                # decide speculation AFTER admission: the pre-admission row
                # count lies — 1 live row can become a full batch in the same
                # iteration, and a spec dispatch at b=8 loses ~2x to plain
                # chunks (measured: spec@8 639 tok/s vs plain@8 1200)
                # (spec state is also row-indexed: stay plain while any row
                # is mid-prefill — its history isn't decodable yet)
                want_spec = (spec_on and not spec_banned and not pending
                             and 0 < n_active() <= self.spec_max_rows
                             and b <= _round_batch(self.spec_max_rows)
                             and all(sl is None
                                     or getattr(sl.sampling, "temperature",
                                                1.0) <= 0.0 for sl in slots)
                             and self._spec_preferred(n_active()))
                if want_spec and not spec_live:
                    hist, hist_len, num = build_spec_state()
                    spec_live = True
                elif not want_spec:
                    spec_live = False
                if self.trace is not None:
                    self.trace.append((time.perf_counter(), "post_specdec"))
                # steady-state pipelining depth: dispatch D chunks back to
                # back and fetch once (first fetch overlaps later chunks'
                # device time — amortizes the tunnel dispatch RTT). Collapse
                # to 1 the moment anything needs boundary granularity: a
                # waiting request (queue/deferred), speculation, a non-
                # persist path, or any live row within one chunk of its cap
                # (the extra chunk would be pure waste).
                depth = 1
                if (self.pipeline_depth > 1 and not spec_live and not pending
                        and tables is not None and self.persist_view
                        and self.queue.empty() and not self._deferred):
                    live_rem = [caps[i] - emitted[i] for i in range(b)
                                if slots[i] is not None]
                    if live_rem and min(live_rem) > k:
                        depth = self.pipeline_depth
                        self.counters["pipelined_groups"] += 1
                disp_k = k * depth
                if tables is not None:
                    cache = self._grow_pages(cache, tables, row_pages,
                                             cur_len, finished, slots,
                                             spec_width if spec_live
                                             else disp_k,
                                             reasons, force=tables_dirty,
                                             budget=budget_tok,
                                             pending=pending.keys())
                    tables_dirty = False
                    # pool exhaustion may have truncated rows: close them now
                    for i in range(b):
                        if slots[i] is not None and finished[i]:
                            emit(i)
                if n_active() == 0:
                    break
                if pending and n_active() == len(pending):
                    # nothing decodable yet — spend the boundary advancing
                    # the prefills instead of dispatching an all-done chunk
                    continue
                counts_host = None
                act_n = n_active() - len(pending)  # decodable rows
                if self.trace is not None:
                    self.trace.append((time.perf_counter(), "pre_disp"))
                t_disp = time.perf_counter()
                if spec_live:
                    # spec_chunk_paged reads/writes the pool directly
                    cache = flush_view(cache)
                    # bucket the view with the spec slack: live rows' verify
                    # writes must stay inside [0, s_bucket)
                    active = [cur_len[i] for i in range(b)
                              if slots[i] is not None]
                    cap = tables.shape[1] * self.page_size
                    s_bucket = min(cap, _round_bucket(
                        max(active) + spec_slack, self.page_size))
                    # hist width is a traced shape of the spec program too —
                    # key it so a fresh width's compile wall never counts as
                    # a warm-rate sample
                    shape_key = ("spec", b, s_bucket, spec_m,
                                 int(hist.shape[1]))
                    carry = vlm.SpecCarry(last_tok=tok, done=done, num=num,
                                          cache=cache, hist=hist,
                                          hist_len=hist_len)
                    toks, counts, carry = vlm.spec_chunk_paged(
                        engine.params, cfg, carry, m=spec_m,
                        max_new_tokens=cap, eos_ids=engine.eos_ids,
                        draft_k=spec_k, ngram_n=self.spec_ngram_n,
                        s_bucket=s_bucket)
                    tok, done, num, cache, hist, hist_len = (
                        carry.last_tok, carry.done, carry.num, carry.cache,
                        carry.hist, carry.hist_len)
                    counts_host = np.asarray(counts)
                elif tables is not None and self.persist_view:
                    # persistent view: decode on the carried dense view at
                    # dense-cache speed; gather only when the view is stale
                    # (dropped at a flush boundary) or its bucket overflowed
                    active = [cur_len[i] for i in range(b)
                              if slots[i] is not None]
                    cap = tables.shape[1] * self.page_size
                    s_bucket = min(cap, _round_bucket(
                        max(active) + disp_k, self.page_size))
                    if pview is not None and int(pview.lengths.shape[0]) != b:
                        # backstop: a view whose batch no longer matches can
                        # NOT be synced (its rows map pre-resize identities);
                        # resize() flushes before compaction so this should
                        # be unreachable — drop unsynced rather than corrupt
                        logger.error("stale persistent view (batch %d != %d)"
                                     " dropped unsynced",
                                     int(pview.lengths.shape[0]), b)
                        self.counters["view_dropped_stale"] += 1
                        pview = None
                        pview_chunks = 0
                        pview_base = None
                    # a cap-width view can hold every position a row can
                    # ever write (rows never outgrow the pool tables), so
                    # s_bucket + k is clamped to cap — otherwise the guard
                    # would regather EVERY chunk once the longest row
                    # pushes s_bucket to cap
                    if pview is None or pview.max_len < min(cap,
                                                            s_bucket + k):
                        cache = flush_view(cache)  # old-bucket view, if any
                        # headroom: one extra bucket step so the view isn't
                        # re-gathered every chunk once rows grow past it
                        vb = min(cap, _round_bucket(
                            s_bucket + k, self.page_size))
                        pview = vlm.gather_view(cache, vb)
                        pview_base = np.asarray(
                            [cur_len[i] if slots[i] is not None else 0
                             for i in range(b)], np.int32)
                        pview_chunks = 0
                        pview_stale.clear()  # regather refreshed every row
                        self.counters["view_gathers"] += 1
                    elif pview_stale:
                        # admissions since the last dispatch rebound these
                        # rows: splice each one's pool KV into the retained
                        # view (1/B of a regather per row) — the rest of the
                        # view is still authoritative
                        for i in sorted(pview_stale):
                            if slots[i] is None or finished[i]:
                                continue  # died before dispatch; done masks
                            pview = vlm.update_view_row(
                                pview, cache, jnp.asarray(i, jnp.int32))
                            pview_base[i] = cur_len[i]
                            self.counters["view_row_updates"] += 1
                        pview_stale.clear()
                    shape_key = ("persist", b, pview.max_len, k)
                    group = []
                    for _ in range(depth):
                        toks, done, tok, pview, key = vlm.decode_chunk(
                            engine.params, cfg, tok, done, pview, key, k=k,
                            eos_ids=engine.eos_ids, row_sampling=row_samp())
                        group.append(toks)
                        pview_chunks += 1
                    if depth > 1:
                        toks = jnp.concatenate(group, axis=1)
                elif tables is not None and self.chunk_view:
                    # bucket the chunk's dense view to the longest active row
                    # + k (device lengths advance k per chunk per row)
                    active = [cur_len[i] for i in range(b)
                              if slots[i] is not None]
                    cap = tables.shape[1] * self.page_size
                    s_bucket = min(cap, _round_bucket(
                        max(active) + k, self.page_size))
                    shape_key = ("plain", b, s_bucket, k)
                    toks, done, tok, cache, key = vlm.decode_chunk_paged(
                        engine.params, cfg, tok, done, cache, key, k=k,
                        s_bucket=s_bucket, eos_ids=engine.eos_ids,
                        row_sampling=row_samp())
                else:
                    shape_key = ("dense", b, k)
                    toks, done, tok, cache, key = vlm.decode_chunk(
                        engine.params, cfg, tok, done, cache, key, k=k,
                        eos_ids=engine.eos_ids, row_sampling=row_samp())
                host = np.asarray(toks)  # host fetch = the real device sync
                host_done = np.asarray(done)
                self._note_rate(shape_key, act_n,
                                int(counts_host.sum())
                                if counts_host is not None
                                else disp_k * act_n,
                                time.perf_counter() - t_disp)
                for i in range(b):
                    if slots[i] is None or i in pending:
                        # pending rows are done=True on device: their chunk
                        # slots are pad zeros, not text
                        continue
                    row_toks = (host[i] if counts_host is None
                                else host[i][:int(counts_host[i])])
                    for t in row_toks:
                        t = int(t)
                        # post-EOS pad slots are always preceded by the EOS
                        # token in the same chunk, so breaking on EOS is
                        # sufficient — no pad heuristic (token id 0 is a real
                        # Qwen2 token, '!')
                        if t in engine.eos_ids or emitted[i] >= caps[i]:
                            finished[i] = True
                            reasons[i] = reasons[i] or (
                                "stop" if t in engine.eos_ids else "length")
                            break
                        texts[i].append(t)
                        emitted[i] += 1
                    if host_done[i] and not finished[i]:
                        finished[i] = True
                        reasons[i] = reasons[i] or "stop"
                    cur_len[i] += (disp_k if counts_host is None
                                   else int(counts_host[i]))
                    emit(i)
                if counts_host is not None:
                    # acceptance EMA: ban speculation for this batch when
                    # drafts keep missing (verify passes then cost more than
                    # the plain decode chunks they replace)
                    total = int(counts_host.sum())
                    accept = (max(0, total - spec_m * act_n)
                              / max(1, spec_m * spec_k * act_n))
                    spec_ema = (accept if spec_ema is None
                                else 0.5 * spec_ema + 0.5 * accept)
                    spec_chunks += 1
                    if spec_chunks >= 3 and spec_ema < self.spec_min_accept:
                        spec_banned = True
                        spec_live = False
                        self.counters["spec_banned_low_accept"] += 1
                if admitting and n_active() > 0:
                    nb = _round_batch(n_active())
                    if nb < b:
                        # long-tail shrink: stop paying full-bucket decode
                        # for rows that already finished. HYSTERESIS (round
                        # 5): only after 2 consecutive under-occupied
                        # boundaries — under staggered arrivals a finish is
                        # often followed by an admission within one chunk,
                        # and an immediate shrink+regrow pair costs two
                        # resizes and two persistent-view regathers for
                        # nothing (traced: 9 grows + 7 shrinks + 9 full
                        # regathers in one 12-request/3.8 s run)
                        under_occ += 1
                        if under_occ >= 2:
                            under_occ = 0
                            self.counters["shrunk"] += 1
                            ht = np.asarray(tok).copy()
                            hd = np.asarray(done).copy()
                            cache, ht, hd = resize(nb, cache, ht, hd)
                            tok = jnp.asarray(ht)
                            done = jnp.asarray(hd)
                    else:
                        under_occ = 0
            batch_ok = True
        finally:
            if tables is not None:
                for pgs in row_pages:
                    self.pool.release(pgs)
                row_pages = [[] for _ in range(b)]
                if batch_ok:
                    # keep the (donated-through) pool arrays for the next batch
                    self._pool_kv = (cache.k_pages, cache.v_pages)
                else:
                    # a failed dispatch may have donated/poisoned the pool
                    # arrays — drop them so the next batch reallocates clean;
                    # cached prefix KV lived in those arrays, so the
                    # registry must drop with them
                    self._pool_kv = None
                    if self.prefix is not None:
                        self.prefix.clear()

        # safety net: emit() closed every stream on finish; a second sentinel
        # after a close is unread (the client stopped at the first), and the
        # error path in _loop() covers rows a failure left open
        for r in batch:
            r.out.put(_SENTINEL)
