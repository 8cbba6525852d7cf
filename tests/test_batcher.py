"""Continuous-batching scheduler tests: batched greedy output must match
serial engine output; concurrent requests share one decode loop."""

import threading
import time

import numpy as np
import pytest

from fastvlm_tpu.engine import build_engine
from fastvlm_tpu.serve.batcher import BatchScheduler


@pytest.fixture(scope="module")
def engine():
    return build_engine(random_tiny=True)


def test_single_request_matches_engine(engine):
    sched = BatchScheduler(engine, window_ms=5)
    try:
        want, _ = engine.chat("hello there", max_new_tokens=5)
        updates = list(sched.submit(engine.build_prompt("hello there"),
                                    max_new_tokens=5))
        assert "error" not in updates[-1], updates[-1]
        assert updates[-1]["text"] == want
        assert updates[0]["stats"]["ttft_ms"] > 0
    finally:
        sched.shutdown()


def test_concurrent_requests_batched_and_correct(engine):
    sched = BatchScheduler(engine, window_ms=120)
    try:
        prompts = ["alpha", "beta gamma", "delta"]
        want = [engine.chat(p, max_new_tokens=4)[0] for p in prompts]

        results = [None] * len(prompts)
        batch_sizes = [None] * len(prompts)

        def run(i):
            last = None
            for last in sched.submit(engine.build_prompt(prompts[i]),
                                     max_new_tokens=4):
                pass
            assert "error" not in last, last
            results[i] = last["text"]
            batch_sizes[i] = last["stats"]["batch_size"]

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
            time.sleep(0.01)  # arrive within the gather window
        for t in threads:
            t.join(timeout=120)
        assert all(r is not None for r in results)
        assert results == want, (results, want)
        # at least two requests shared a batch
        assert max(batch_sizes) >= 2, batch_sizes
    finally:
        sched.shutdown()


def test_mixed_sampling_shares_one_batch(engine):
    from fastvlm_tpu.ops.sampling import SamplingParams

    # a 3-token generation finishes inside one decode chunk, so the two
    # requests only share a batch if both land in the gather window —
    # size it for this 1-core box's thread-start latency
    sched = BatchScheduler(engine, window_ms=400)
    try:
        out_greedy = []
        out_sampled = []

        def run_greedy():
            for u in sched.submit(engine.build_prompt("x"), max_new_tokens=3):
                out_greedy.append(u)

        def run_sampled():
            for u in sched.submit(engine.build_prompt("x"), max_new_tokens=3,
                                  sampling=SamplingParams(temperature=1.0)):
                out_sampled.append(u)

        want, _ = engine.chat("x", max_new_tokens=3)
        t1 = threading.Thread(target=run_greedy)
        t2 = threading.Thread(target=run_sampled)
        t1.start(); time.sleep(0.01); t2.start()
        t1.join(timeout=120); t2.join(timeout=120)
        assert out_greedy and out_sampled
        assert "error" not in out_greedy[-1]
        assert "error" not in out_sampled[-1]
        # per-row sampling (RowSampling): mixed configs SHARE one batch and
        # the greedy row still matches the serial engine byte-for-byte
        # (batch_size is n_active() at emit time — peers that already
        # closed in the same chunk no longer count, so look at the peak)
        assert max(u["stats"]["batch_size"] for u in out_greedy) == 2
        assert max(u["stats"]["batch_size"] for u in out_sampled) == 2
        assert out_greedy[-1]["text"] == want
    finally:
        sched.shutdown()


def pool_clean(sched):
    """Leak invariant with prefix caching: once live rows are done, every
    page is either free or pinned ONLY by the prefix registry — clearing
    the registry must return the pool to full."""
    if sched.prefix is not None:
        sched.prefix.clear()
    return sched.pool.free_pages == sched.pool.num_pages


def test_page_pool_accounting():
    from fastvlm_tpu.serve.batcher import PagePool

    pool = PagePool(4)
    a = pool.alloc(3)
    assert len(a) == 3 and pool.free_pages == 1 and pool.min_free == 1
    assert pool.alloc(2) is None  # refuses, state unchanged
    assert pool.free_pages == 1
    pool.release(a)
    assert pool.free_pages == 4
    assert pool.min_free == 1  # low-water mark sticks


def test_paged_bounded_pool_matches_serial(engine):
    """A pool SMALLER than the dense worst case (batch * (bucket + max_new))
    must serve the batch correctly and return every page afterwards — the
    'memory bounded by tokens in flight' property (VERDICT r1 #3)."""
    prompts = ["alpha", "beta gamma", "delta"]
    page = 16
    # size the pool to exactly the tokens in flight (3 rows of L+4 new
    # tokens, page-rounded) — well under the dense worst case of
    # bucket4 * (prompt_bucket + max_new)
    lens = [int(np.asarray(engine.prepare(engine.build_prompt(p),
                                          None)["lens"])[0])
            for p in prompts]
    need = sum(-(-(ln + 4) // page) for ln in lens)
    bucket = max(int(engine.prepare(engine.build_prompt(p),
                                    None)["ids"].shape[1]) for p in prompts)
    assert need * page < 4 * (bucket + 4), "pool not smaller than dense"
    sched = BatchScheduler(engine, window_ms=120, paged=True,
                           page_size=page, pool_tokens=need * page)
    try:
        want = [engine.chat(p, max_new_tokens=4)[0] for p in prompts]
        results = [None] * len(prompts)

        def run(i):
            last = None
            for last in sched.submit(engine.build_prompt(prompts[i]),
                                     max_new_tokens=4):
                pass
            assert "error" not in last, last
            results[i] = last["text"]

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
            time.sleep(0.01)
        for t in threads:
            t.join(timeout=180)
        assert results == want, (results, want)
        assert pool_clean(sched)  # all returned
        assert sched.pool.min_free < sched.pool.num_pages     # ...and used
    finally:
        sched.shutdown()


def test_paged_pool_exhaustion_truncates_not_crashes(engine):
    """Decode past the pool's capacity truncates the request (finishes the
    stream early) instead of stalling or corrupting other rows."""
    # pool fits the prompt plus ~2 pages of decode, then runs dry
    page = 8
    ln = int(np.asarray(engine.prepare(
        engine.build_prompt("tell me everything"), None)["lens"])[0])
    pool_pages = -(-ln // page) + 2
    sched = BatchScheduler(engine, window_ms=5, paged=True,
                           page_size=page, pool_tokens=pool_pages * page)
    try:
        want, _ = engine.chat("tell me everything", max_new_tokens=64)
        updates = list(sched.submit(engine.build_prompt("tell me everything"),
                                    max_new_tokens=64))
        assert updates, "stream ended with no updates"
        last = updates[-1]
        assert "error" not in last, last
        # truncated output must still be a prefix of the full generation
        assert want.startswith(last["text"])
        assert pool_clean(sched)
    finally:
        sched.shutdown()


@pytest.fixture(scope="module")
def engine_noeos():
    """Tiny engine whose EOS is unreachable: generation always runs to its
    max_new_tokens cap, making batch lifetimes deterministic for the
    continuous-batching timing tests."""
    return build_engine(random_tiny=True, eos_ids=(-1,))


def test_stream_closes_on_row_finish_not_batch_end(engine_noeos):
    """A short request batched with a long one must complete its stream as
    soon as ITS row finishes — not when the whole batch drains."""
    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=150, paged=True, page_size=16,
                           pool_tokens=8192)
    try:
        t_done = {}

        def run(name, prompt, cap):
            for _ in sched.submit(eng.build_prompt(prompt),
                                  max_new_tokens=cap):
                pass
            t_done[name] = time.perf_counter()

        tl = threading.Thread(target=run, args=("long", "tell me all", 192))
        ts = threading.Thread(target=run, args=("short", "hi", 4))
        tl.start(); ts.start()
        tl.join(timeout=180); ts.join(timeout=180)
        assert set(t_done) == {"long", "short"}
        assert t_done["short"] < t_done["long"], t_done
    finally:
        sched.shutdown()


@pytest.mark.parametrize("persist", [True, False],
                         ids=["persist", "chunkview"])
def test_continuous_admission_into_free_slot(engine_noeos, persist):
    """A request arriving after the batch started must join at a chunk
    boundary (free pad slot) instead of waiting for the batch to drain:
    greedy output identical to serial, and it finishes first."""
    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=100, paged=True, page_size=16,
                           pool_tokens=16384, persist_view=persist)
    try:
        longs = ["alpha", "beta gamma", "delta"]  # b=4 bucket, 1 free slot
        want_late = eng.chat("quick question", max_new_tokens=4)[0]
        results = {}
        t_done = {}
        stats = {}

        def run(name, prompt, cap):
            last = None
            for last in sched.submit(eng.build_prompt(prompt),
                                     max_new_tokens=cap):
                pass
            assert "error" not in last, last
            results[name] = last["text"]
            stats[name] = last["stats"]
            t_done[name] = time.perf_counter()

        started = threading.Event()

        def run_long(name, prompt, cap):
            last = None
            for last in sched.submit(eng.build_prompt(prompt),
                                     max_new_tokens=cap):
                started.set()  # batch is decoding
            assert "error" not in last, last
            results[name] = last["text"]
            stats[name] = last["stats"]
            t_done[name] = time.perf_counter()

        threads = [threading.Thread(target=run_long, args=(f"L{i}", p, 256))
                   for i, p in enumerate(longs)]
        for t in threads:
            t.start()
            time.sleep(0.01)  # land inside the gather window
        assert started.wait(timeout=120)  # first update -> decode underway
        late = threading.Thread(target=run, args=("late", "quick question", 4))
        late.start()
        late.join(timeout=180)
        for t in threads:
            t.join(timeout=180)
        assert results["late"] == want_late, (results["late"], want_late)
        # joined mid-batch: shared the decode loop with the three long rows
        assert stats["late"]["batch_size"] >= 2, stats["late"]
        assert all(t_done["late"] < t_done[f"L{i}"] for i in range(3)), t_done
    finally:
        sched.shutdown()


@pytest.mark.parametrize("persist", [True, False],
                         ids=["persist", "chunkview"])
def test_admission_into_slot_freed_by_finished_row(engine_noeos, persist):
    """A row that finishes returns its slot; a queued request admits into it
    mid-batch and its greedy output matches serial."""
    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=100, paged=True, page_size=16,
                           pool_tokens=16384, persist_view=persist)
    try:
        want_s = eng.chat("short follow-up", max_new_tokens=5)[0]
        results = {}
        t_done = {}

        def run(name, prompt, cap):
            last = None
            for last in sched.submit(eng.build_prompt(prompt),
                                     max_new_tokens=cap):
                pass
            assert "error" not in last, last
            results[name] = last["text"]
            t_done[name] = time.perf_counter()

        tl = threading.Thread(target=run, args=("long", "the long one", 384))
        tm = threading.Thread(target=run, args=("mid", "m", 3))
        tl.start(); tm.start()
        tm.join(timeout=180)       # 'mid' stream closed -> slot free
        ts = threading.Thread(target=run, args=("s", "short follow-up", 5))
        ts.start()
        ts.join(timeout=180)
        tl.join(timeout=180)
        assert results["s"] == want_s, (results["s"], want_s)
        assert t_done["s"] < t_done["long"], t_done
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_admission_retains_persistent_view(engine_noeos):
    """Round-5 boundary optimization: an admission into a free slot of a
    live persist batch must NOT drop and regather the whole view (the
    round-4 pattern — the full regather made the measured admission
    boundary 0.86x of dense) — it splices only the rebound row from the
    pool (vlm.update_view_row). The late request's output parity is
    covered by test_continuous_admission_into_free_slot; this asserts the
    DISPATCH SHAPE: view_row_updates records the splice and the admission
    adds no extra full gather."""
    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=100, paged=True, page_size=16,
                           pool_tokens=16384, persist_view=True)
    try:
        results = {}
        started = threading.Event()

        def run(name, prompt, cap, signal=False):
            last = None
            seen = 0
            for last in sched.submit(eng.build_prompt(prompt),
                                     max_new_tokens=cap):
                seen += 1
                # the FIRST update is the admission/prefill token (emitted
                # before any persist dispatch — the view doesn't exist
                # yet); signal only once a decode chunk landed, so the
                # late request provably admits into a LIVE view
                if signal and seen >= 2:
                    started.set()
            assert "error" not in last, last
            results[name] = last["text"]

        threads = [threading.Thread(target=run,
                                    args=(f"L{i}", p, 48, True))
                   for i, p in enumerate(["alpha", "beta gamma", "delta"])]
        for t in threads:
            t.start()
            time.sleep(0.01)
        assert started.wait(timeout=120)
        gathers_before = sched.counters["view_gathers"]
        late = threading.Thread(target=run, args=("late", "quick", 4))
        late.start()
        late.join(timeout=180)
        for t in threads:
            t.join(timeout=180)
        assert len(results) == 4 and all(results.values())
        assert sched.counters["view_row_updates"] >= 1, dict(sched.counters)
        # the admission itself must not regather (bucket growth from the
        # longs' own decode is the only legitimate extra gather)
        assert (sched.counters["view_gathers"] - gathers_before) <= 1, \
            dict(sched.counters)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


@pytest.mark.parametrize("persist", [True, False],
                         ids=["persist", "chunkview"])
def test_batch_grows_for_late_request(engine_noeos, persist):
    """The critical low-concurrency case: one long request owns a b=1
    bucket; a late arrival must GROW the batch (1 -> 2) and join, not wait
    out the whole generation (round-3 HEAD regression: the post-dispatch
    SHRINK back to b=1 resized without flushing the persistent view)."""
    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=20, paged=True, page_size=16,
                           pool_tokens=16384, persist_view=persist)
    try:
        want_late = eng.chat("but why", max_new_tokens=4)[0]
        results = {}
        t_done = {}
        started = threading.Event()

        def run(name, prompt, cap):
            last = None
            for last in sched.submit(eng.build_prompt(prompt),
                                     max_new_tokens=cap):
                started.set()
            assert "error" not in last, last
            results[name] = last["text"]
            t_done[name] = time.perf_counter()

        tl = threading.Thread(target=run, args=("long", "the epic", 256))
        tl.start()
        assert started.wait(timeout=120)
        late = threading.Thread(target=run, args=("late", "but why", 4))
        late.start()
        late.join(timeout=180)
        tl.join(timeout=180)
        assert results["late"] == want_late, (results["late"], want_late)
        assert t_done["late"] < t_done["long"], t_done
        assert sched.counters["grown"] >= 1, dict(sched.counters)
        assert sched.counters["admitted"] >= 1, dict(sched.counters)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


@pytest.mark.parametrize("persist", [True, False],
                         ids=["persist", "chunkview"])
def test_batch_shrinks_after_rows_finish(engine_noeos, persist):
    """When most rows finish, the batch re-buckets down so the tail stops
    paying full-width decode; outputs stay correct."""
    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=150, paged=True, page_size=16,
                           pool_tokens=16384, persist_view=persist)
    try:
        want_long = eng.chat("endless story", max_new_tokens=96)[0]
        results = {}

        def run(name, prompt, cap):
            last = None
            for last in sched.submit(eng.build_prompt(prompt),
                                     max_new_tokens=cap):
                pass
            assert "error" not in last, last
            results[name] = last["text"]

        specs = [("long", "endless story", 96), ("a", "a", 3),
                 ("b", "bb", 3), ("c", "ccc", 3)]
        threads = [threading.Thread(target=run, args=s) for s in specs]
        for t in threads:
            t.start()
            time.sleep(0.01)
        for t in threads:
            t.join(timeout=180)
        assert results["long"] == want_long, (results["long"], want_long)
        assert sched.counters["shrunk"] >= 1, dict(sched.counters)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_incompatible_request_not_starved(engine_noeos):
    """A steady stream of batchable greedy requests keeps the batch alive
    via admission; a multi-image request (ragged token count — can never
    join the static-shape batch) must still be served within the fairness
    bound (admission stops, the batch drains, deferred requests go first)."""
    from PIL import Image

    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=10, paged=True, page_size=16,
                           pool_tokens=16384, fairness_s=0.3)
    stop_feeding = threading.Event()

    def one_filler():
        for _ in sched.submit(eng.build_prompt("filler"), max_new_tokens=24):
            pass

    def feeder():
        while not stop_feeding.is_set():
            threading.Thread(target=one_filler, daemon=True).start()
            time.sleep(0.05)

    threading.Thread(target=feeder, daemon=True).start()
    time.sleep(0.3)  # the greedy batch is running
    try:
        prompt = eng.build_prompt("compare <image> too")  # 2 image spans
        imgs = [Image.new("RGB", (32, 32), (200, 0, 0)),
                Image.new("RGB", (32, 32), (0, 200, 0))]
        out = list(sched.submit(prompt, imgs, max_new_tokens=4))
        assert out and "error" not in out[-1], out[-1] if out else out
        assert sched.counters["drained_for_fairness"] >= 1, \
            dict(sched.counters)
    finally:
        stop_feeding.set()
        sched.shutdown()


def test_sampled_request_admitted_into_greedy_batch(engine_noeos):
    """Per-row sampling end-to-end: a temperature>0 request arriving while
    a greedy batch is mid-flight is ADMITTED at a chunk boundary (no drain,
    no recompile-by-config) and the greedy row's text is unchanged."""
    from fastvlm_tpu.ops.sampling import SamplingParams

    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=20, paged=True, page_size=16,
                           pool_tokens=16384)
    try:
        want_long = eng.chat("steady stream", max_new_tokens=96)[0]
        results = {}
        started = threading.Event()

        def run(name, prompt, cap, sp):
            last = None
            for last in sched.submit(eng.build_prompt(prompt),
                                     max_new_tokens=cap, sampling=sp):
                started.set()
            assert "error" not in last, last
            results[name] = last["text"]

        tl = threading.Thread(target=run,
                              args=("long", "steady stream", 96, None))
        tl.start()
        assert started.wait(timeout=120)
        ts = threading.Thread(
            target=run, args=("samp", "surprise me", 8,
                              SamplingParams(temperature=1.0, top_k=8)))
        ts.start()
        ts.join(timeout=180)
        tl.join(timeout=180)
        assert set(results) == {"long", "samp"}
        assert results["long"] == want_long, (results["long"], want_long)
        assert sched.counters["admitted"] >= 1, dict(sched.counters)
        assert sched.counters["drained_for_fairness"] == 0, \
            dict(sched.counters)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_spec_batched_greedy_matches_serial(engine):
    """Speculative continuous batching (vlm.spec_chunk_paged): batched
    greedy output must be byte-identical to serial engine output — exact
    greedy is the spec contract. Loopy prompts give the n-gram draft
    something to accept."""
    sched = BatchScheduler(engine, window_ms=120, paged=True, page_size=16,
                           pool_tokens=16384, spec=True, spec_max_rows=8,
                           spec_min_accept=0.0)
    try:
        prompts = ["ab ab ab ab ab", "the cat the cat the", "zzz"]
        want = [engine.chat(p, max_new_tokens=24)[0] for p in prompts]
        results = [None] * len(prompts)

        def run(i):
            last = None
            for last in sched.submit(engine.build_prompt(prompts[i]),
                                     max_new_tokens=24):
                pass
            assert "error" not in last, last
            results[i] = last["text"]

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
            time.sleep(0.01)
        for t in threads:
            t.join(timeout=180)
        assert results == want, (results, want)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_spec_batched_admission_matches_serial(engine_noeos):
    """A request admitted mid-flight into a SPECULATIVE batch (grow + 1-row
    prefill + hist seeding) must still produce exact-greedy output."""
    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=20, paged=True, page_size=16,
                           pool_tokens=16384, spec=True, spec_max_rows=8,
                           spec_min_accept=0.0)
    try:
        want_late = eng.chat("me too me too", max_new_tokens=6)[0]
        results = {}
        started = threading.Event()

        def run(name, prompt, cap):
            last = None
            for last in sched.submit(eng.build_prompt(prompt),
                                     max_new_tokens=cap):
                started.set()
            assert "error" not in last, last
            results[name] = last["text"]

        tl = threading.Thread(target=run, args=("long", "go go go go", 192))
        tl.start()
        assert started.wait(timeout=120)
        late = threading.Thread(target=run, args=("late", "me too me too", 6))
        late.start()
        late.join(timeout=180)
        tl.join(timeout=180)
        assert results["late"] == want_late, (results["late"], want_late)
        assert sched.counters["admitted"] >= 1, dict(sched.counters)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_spec_batched_respects_caps_and_stop_strings(engine_noeos):
    """Per-row max_new_tokens caps bind exactly in spec mode (device commits
    can overshoot the host cap within a chunk; the host must trim)."""
    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=120, paged=True, page_size=16,
                           pool_tokens=16384, spec=True, spec_max_rows=8,
                           spec_min_accept=0.0)
    try:
        want = {c: eng.chat("count up up up", max_new_tokens=c)[0]
                for c in (3, 17)}
        results = {}

        def run(cap):
            last = None
            for last in sched.submit(eng.build_prompt("count up up up"),
                                     max_new_tokens=cap):
                pass
            assert "error" not in last, last
            results[cap] = last

        threads = [threading.Thread(target=run, args=(c,)) for c in (3, 17)]
        for t in threads:
            t.start()
            time.sleep(0.01)
        for t in threads:
            t.join(timeout=180)
        for c in (3, 17):
            assert results[c]["text"] == want[c], (c, results[c], want[c])
            assert results[c]["stats"]["finish_reason"] == "length"
    finally:
        sched.shutdown()


def test_warmup_precompiles_decode_shapes(engine):
    """BatchScheduler.warmup must precompile the full decode-dispatch shape
    grid: a request served afterwards (persist AND speculative dispatches)
    hits only warmed shapes — no mid-flight XLA compile stall."""
    sched = BatchScheduler(engine, window_ms=5, paged=True, page_size=16,
                           pool_tokens=16384, spec=True, spec_max_rows=1,
                           spec_min_accept=0.0)
    try:
        plen = int(np.asarray(
            engine.prepare(engine.build_prompt("hello there"))["lens"])[0])
        n = sched.warmup(prompt_len=plen, max_new_tokens=8)
        assert n > 0
        warm = set(sched._warm_shapes)
        assert any(s[0] == "spec" for s in warm), warm
        assert any(s[0] == "persist" for s in warm), warm
        want, _ = engine.chat("hello there", max_new_tokens=8)
        updates = list(sched.submit(engine.build_prompt("hello there"),
                                    max_new_tokens=8))
        assert "error" not in updates[-1], updates[-1]
        assert updates[-1]["text"] == want
        assert pool_clean(sched)
        assert set(sched._warm_shapes) == warm, (
            sched._warm_shapes - warm)
    finally:
        sched.shutdown()


def test_warmup_covers_default_persist_dispatches(engine):
    """VERDICT r3 weak #3: the round-3 warmup precompiled only the plain
    chunk-view and spec programs while the DEFAULT persist-view dispatch ran
    cold. With spec off and a multi-row batch, every decode dispatch must be
    a persist shape warmup already compiled — no new _warm_shapes entries
    after serving a mixed workload."""
    sched = BatchScheduler(engine, window_ms=150, paged=True, page_size=16,
                           pool_tokens=16384, spec=False)
    try:
        prompts = ["alpha", "beta gamma", "delta"]
        plen = max(int(np.asarray(
            engine.prepare(engine.build_prompt(p))["lens"])[0])
            for p in prompts)
        n = sched.warmup(prompt_len=plen, max_new_tokens=8)
        assert n > 0
        warm = set(sched._warm_shapes)
        assert all(s[0] in ("persist", "padmit") for s in warm), warm
        assert any(s[0] == "persist" for s in warm), warm
        want = [engine.chat(p, max_new_tokens=8)[0] for p in prompts]
        results = [None] * len(prompts)

        def run(i):
            last = None
            for last in sched.submit(engine.build_prompt(prompts[i]),
                                     max_new_tokens=8):
                pass
            assert "error" not in last, last
            results[i] = last["text"]

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
            time.sleep(0.01)  # land inside the gather window -> b=4 bucket
        for t in threads:
            t.join(timeout=180)
        assert results == want, (results, want)
        assert sched.counters["disp_plain@3"] >= 1 \
            or sched.counters["disp_plain@2"] >= 1, dict(sched.counters)
        assert set(sched._warm_shapes) == warm, (
            sched._warm_shapes - warm)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_page_pool_sharing_refcounts():
    from fastvlm_tpu.serve.batcher import PagePool

    pool = PagePool(4)
    a = pool.alloc(2)
    pool.share(a)             # second reference (e.g. prefix registry)
    pool.release(a)           # first owner gone
    assert pool.free_pages == 2   # still pinned by the second ref
    pool.release(a)
    assert pool.free_pages == 4   # last ref frees


def test_prefix_cache_unit():
    from fastvlm_tpu.serve.batcher import PagePool, PrefixCache

    pool = PagePool(8)
    pc = PrefixCache(pool, page_size=4)
    ids = np.arange(10, dtype=np.int32)   # 2 full pages + partial
    pages = pool.alloc(3)
    pc.publish(ids, pages)
    assert len(pc.entries) == 2           # 1-page and 2-page prefixes
    # exact 2-page hit
    n, shared = pc.lookup(np.arange(9, dtype=np.int32))
    assert n == 8 and shared == pages[:2]
    pool.release(shared)
    # diverging second page -> falls back to the 1-page prefix
    other = np.concatenate([np.arange(6), [99, 98, 97]]).astype(np.int32)
    n, shared = pc.lookup(other)
    assert n == 4 and shared == pages[:1]
    pool.release(shared)
    # row done; registry still pins its 2 full-prefix pages (the partial
    # third page frees)
    pool.release(pages)
    assert pool.free_pages == 6
    # eviction under pressure frees registry-only pages
    assert pc.evict_for(8)
    assert pool.free_pages == 8 and not pc.entries


@pytest.mark.parametrize("persist", [True, False],
                         ids=["persist", "chunkview"])
def test_prefix_cache_admission_matches_serial(engine_noeos, persist):
    """A request admitted after an identical-template request must hit the
    prefix cache (suffix-only prefill over shared pages) and still produce
    byte-identical greedy output."""
    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=20, paged=True, page_size=16,
                           pool_tokens=16384, persist_view=persist,
                           prefix_cache=True)
    try:
        # long shared prefix, different tails (build_prompt adds the same
        # chat template around both)
        base = "please describe the picture in great detail " * 4
        p1, p2 = base + "first", base + "and also the second one"
        want = {p1: eng.chat(p1, max_new_tokens=48)[0],
                p2: eng.chat(p2, max_new_tokens=6)[0]}
        results = {}
        started = threading.Event()

        def run(p, cap):
            last = None
            for last in sched.submit(eng.build_prompt(p),
                                     max_new_tokens=cap):
                started.set()
            assert "error" not in last, last
            results[p] = last["text"]

        t1 = threading.Thread(target=run, args=(p1, 48))
        t1.start()
        assert started.wait(timeout=120)  # p1's pages are published
        t2 = threading.Thread(target=run, args=(p2, 6))
        t2.start()
        t2.join(timeout=180)
        t1.join(timeout=180)
        assert results[p2] == want[p2], (results[p2], want[p2])
        assert results[p1] == want[p1], (results[p1], want[p1])
        assert sched.counters["prefix_hits"] >= 1, dict(sched.counters)
        assert sched.counters["prefix_hit_tokens"] >= 16
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_prefix_cache_batch_burst_matches_serial(engine_noeos):
    """A gathered BURST of template-sharing prompts must reuse the cached
    prefix as a batch (one shared offset, suffix-only batch prefill) and
    still match serial greedy output exactly."""
    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=150, paged=True, page_size=16,
                           pool_tokens=16384, prefix_cache=True)
    try:
        base = "the quick brown fox jumps over the lazy dog " * 3
        # first request seeds the registry
        seed = base + "zero"
        want0, _ = eng.chat(seed, max_new_tokens=4)
        out = list(sched.submit(eng.build_prompt(seed), max_new_tokens=4))
        assert out[-1]["text"] == want0
        hits_before = sched.prefix.hits
        prompts = [base + t for t in ("one", "two two", "three three three")]
        want = [eng.chat(p, max_new_tokens=6)[0] for p in prompts]
        results = [None] * len(prompts)

        def run(i):
            last = None
            for last in sched.submit(eng.build_prompt(prompts[i]),
                                     max_new_tokens=6):
                pass
            assert "error" not in last, last
            results[i] = last["text"]

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
            time.sleep(0.01)  # arrive within one gather window
        for t in threads:
            t.join(timeout=180)
        assert results == want, (results, want)
        assert sched.prefix.hits > hits_before, dict(sched.counters)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_prefix_cache_eviction_under_pressure(engine_noeos):
    """With a pool barely larger than one batch, registry-pinned pages must
    be evicted for live rows instead of deferring/truncating requests."""
    eng = engine_noeos
    ln = int(np.asarray(eng.prepare(
        eng.build_prompt("warm the cache"))["lens"])[0])
    page = 16
    pool_pages = -(-(ln + 48) // page) + 3
    sched = BatchScheduler(eng, window_ms=5, paged=True, page_size=page,
                           pool_tokens=pool_pages * page)
    try:
        for p in ("warm the cache", "now a different one entirely"):
            want, _ = eng.chat(p, max_new_tokens=8)
            updates = list(sched.submit(eng.build_prompt(p),
                                        max_new_tokens=8))
            assert "error" not in updates[-1], updates[-1]
            assert updates[-1]["text"] == want
            assert updates[-1]["stats"]["finish_reason"] == "length"
        assert pool_clean(sched)
    finally:
        sched.shutdown()


@pytest.mark.parametrize("persist", [True, False],
                         ids=["persist", "chunkview"])
def test_paged_pool_recovers_after_batch_failure(engine, persist):
    """A failed batch must not poison the persistent page-pool arrays
    (decode_chunk donates them) — the next batch reallocates clean. The
    injected failure targets whichever chunk fn the configured mode
    dispatches (persist-view decodes via vlm.decode_chunk)."""
    import fastvlm_tpu.serve.batcher as B
    from fastvlm_tpu.models import vlm as vlm_mod

    sched = BatchScheduler(engine, window_ms=5, paged=True,
                           page_size=16, pool_tokens=4096,
                           persist_view=persist)
    fn_name = "decode_chunk" if persist else "decode_chunk_paged"
    orig = getattr(vlm_mod, fn_name)  # the mode's decode-dispatch fn
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("injected decode failure")

    try:
        setattr(vlm_mod, fn_name, boom)
        updates = list(sched.submit(engine.build_prompt("fail me"),
                                    max_new_tokens=8))
        assert any("error" in u for u in updates), updates
        assert calls["n"] == 1
        assert sched._pool_kv is None  # dropped, not poisoned
        assert pool_clean(sched)
    finally:
        setattr(vlm_mod, fn_name, orig)

    try:
        want, _ = engine.chat("recover", max_new_tokens=6)
        updates = list(sched.submit(engine.build_prompt("recover"),
                                    max_new_tokens=6))
        assert "error" not in updates[-1], updates[-1]
        assert updates[-1]["text"] == want
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_pipelined_steady_groups_match_serial(engine_noeos):
    """Steady-state dispatch pipelining (pipeline_depth=2 default): with an
    empty queue the persist branch dispatches 2 chunks per fetch — output
    must stay byte-identical to serial, and the groups must actually engage
    (counter) for a long generation."""
    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=10, paged=True, page_size=16,
                           pool_tokens=16384)
    try:
        want, _ = eng.chat("a very long story", max_new_tokens=96)
        out = list(sched.submit(eng.build_prompt("a very long story"),
                                max_new_tokens=96))
        assert "error" not in out[-1], out[-1]
        assert out[-1]["text"] == want
        assert sched.counters["pipelined_groups"] >= 2, dict(sched.counters)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_pipelined_depth_collapses_when_request_waits(engine_noeos):
    """A request arriving mid-generation must still admit at boundary
    granularity: the moment the queue is non-empty, depth collapses to 1 and
    continuous admission proceeds (output parity + admitted counter)."""
    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=10, paged=True, page_size=16,
                           pool_tokens=16384)
    try:
        want_late = eng.chat("quick", max_new_tokens=4)[0]
        started = threading.Event()
        results = {}

        def run(name, prompt, cap):
            last = None
            for last in sched.submit(eng.build_prompt(prompt),
                                     max_new_tokens=cap):
                started.set()
            assert "error" not in last, last
            results[name] = last["text"]

        tl = threading.Thread(target=run, args=("long", "the saga", 192))
        tl.start()
        assert started.wait(timeout=120)
        late = threading.Thread(target=run, args=("late", "quick", 4))
        late.start()
        late.join(timeout=180)
        tl.join(timeout=180)
        assert results["late"] == want_late, (results["late"], want_late)
        assert sched.counters["admitted"] >= 1, dict(sched.counters)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_cancel_mid_generation_releases_row_and_pages(engine):
    """VERDICT r4 #5 (reference FastVLMModel.swift:141-151): a client that
    disconnects mid-stream must not hold its batch slot or pool pages —
    the row aborts at the next chunk boundary, its stream closes with
    finish_reason 'cancelled', other rows' output is unchanged, and the
    pool returns to fully free."""
    sched = BatchScheduler(engine, window_ms=120, paged=True, page_size=16,
                           pool_tokens=16384, spec=False)
    try:
        want = engine.chat("the surviving row", max_new_tokens=6)[0]
        cancel = threading.Event()
        victim_updates = []
        results = {}

        def run_victim():
            for u in sched.submit(engine.build_prompt("the victim row"),
                                  max_new_tokens=4096, cancel=cancel):
                victim_updates.append(u)
            results["victim_done"] = True

        def run_survivor():
            last = None
            for last in sched.submit(engine.build_prompt("the surviving row"),
                                     max_new_tokens=6):
                pass
            assert "error" not in last, last
            results["survivor"] = last["text"]

        tv = threading.Thread(target=run_victim)
        ts = threading.Thread(target=run_survivor)
        tv.start()
        time.sleep(0.02)  # same gather window
        ts.start()
        # wait for the victim to stream something, then cancel it
        for _ in range(400):
            if victim_updates:
                break
            time.sleep(0.05)
        assert victim_updates, "victim never started streaming"
        cancel.set()
        tv.join(timeout=60)  # stream must CLOSE despite the 4096 cap
        assert results.get("victim_done"), "victim stream did not terminate"
        ts.join(timeout=120)
        assert results["survivor"] == want, (results["survivor"], want)
        assert victim_updates[-1]["stats"]["finish_reason"] in (
            "cancelled", "stop")  # 'stop' only if EOS won the race
        assert sched.counters["cancelled"] >= 1, dict(sched.counters)
        # pages fully returned once both rows are done
        deadline = time.time() + 30
        while (sched.pool.free_pages != sched.pool.num_pages
               and time.time() < deadline):
            if sched.prefix is not None:
                sched.prefix.clear()
            time.sleep(0.2)
        if sched.prefix is not None:
            sched.prefix.clear()
        assert sched.pool.free_pages == sched.pool.num_pages
    finally:
        sched.shutdown()


def test_cancel_while_queued_never_prefills(engine):
    """A request cancelled before admission closes immediately and is never
    charged a prefill (no pages, no admitted counter)."""
    sched = BatchScheduler(engine, window_ms=200, paged=True, page_size=16,
                           pool_tokens=16384, spec=False)
    try:
        cancel = threading.Event()
        cancel.set()  # dead on arrival
        out = list(sched.submit(engine.build_prompt("never runs"),
                                max_new_tokens=8, cancel=cancel))
        assert out == []  # closed with no updates
        assert sched.counters["cancelled"] >= 1
        assert sched.counters.get("admitted", 0) == 0
        assert sched.pool.free_pages == sched.pool.num_pages
    finally:
        sched.shutdown()
