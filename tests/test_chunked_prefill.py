"""Chunked admission prefill: a cold long-prompt admission prefills in
fixed chunks interleaved with the live batch's decode chunks
(serve/batcher.py pending rows). Greedy output must be byte-identical to
serial; pages fully return; the image-token span never splits."""

import threading

import numpy as np
import pytest

from fastvlm_tpu.engine import build_engine
from fastvlm_tpu.serve.batcher import BatchScheduler, _prefill_chunk_bounds


@pytest.fixture(scope="module")
def engine_noeos():
    return build_engine(random_tiny=True, eos_ids=(-1,))


def pool_clean(sched):
    if sched.prefix is not None:
        sched.prefix.clear()
    return sched.pool.free_pages == sched.pool.num_pages


def test_chunk_bounds():
    # text-only: plain W grid with residue
    assert _prefill_chunk_bounds(0, 10, 4, -1, -1) == [0, 4, 8, 10]
    # span [5, 9) must not split: stop before it, swallow it whole
    assert _prefill_chunk_bounds(0, 12, 4, 5, 9) == [0, 4, 5, 9, 12]
    # boundary would land strictly inside [2, 6)
    assert _prefill_chunk_bounds(0, 8, 4, 2, 6) == [0, 2, 6, 8]
    # span at the start (image-first prompts)
    assert _prefill_chunk_bounds(0, 20, 8, 0, 16) == [0, 16, 20]
    # prefix-cached lo > 0
    assert _prefill_chunk_bounds(6, 14, 4, -1, -1) == [6, 10, 14]
    # a chunk that could swallow the span whole still cuts at img_s: the
    # image chunk must be exactly the span (ONE canonical width that
    # warmup() precompiles — ADVICE r4 medium)
    assert _prefill_chunk_bounds(0, 40, 30, 5, 21) == [0, 5, 21, 40]
    # widths cover [lo, hi) exactly, every boundary outside the open span
    for (lo, hi, w, s, e) in [(0, 37, 8, 12, 28), (0, 37, 8, 0, 16),
                              (3, 40, 16, 20, 36), (0, 5, 8, -1, -1)]:
        bs = _prefill_chunk_bounds(lo, hi, w, s, e)
        assert bs[0] == lo and bs[-1] == hi
        assert all(b2 > b1 for b1, b2 in zip(bs, bs[1:]))
        assert not any(s < b < e for b in bs[1:-1] if s >= 0)


@pytest.mark.parametrize("persist", [True, False],
                         ids=["persist", "chunkview"])
def test_chunked_admission_matches_serial(engine_noeos, persist):
    """Two late long-prompt requests admit in chunks while a long row keeps
    decoding (the second also grows the batch while the first may still be
    mid-prefill); outputs byte-identical to serial."""
    eng = engine_noeos
    long_prompt = ("please describe every detail of the scene in front of "
                   "you and then summarize it in one sentence")
    late2 = "and what about the weather tomorrow in the mountains?"
    sched = BatchScheduler(eng, window_ms=100, paged=True, page_size=16,
                           pool_tokens=16384, persist_view=persist,
                           prefill_chunk=8, max_pending=2)
    try:
        want1 = eng.chat(long_prompt, max_new_tokens=5)[0]
        want2 = eng.chat(late2, max_new_tokens=4)[0]
        results = {}
        started = threading.Event()

        def run_long():
            last = None
            for last in sched.submit(eng.build_prompt("the anchor row"),
                                     max_new_tokens=384):
                started.set()
            assert "error" not in last, last
            results["anchor"] = last["text"]

        def run(name, prompt, cap):
            last = None
            for last in sched.submit(eng.build_prompt(prompt),
                                     max_new_tokens=cap):
                pass
            assert "error" not in last, last
            results[name] = last["text"]

        ta = threading.Thread(target=run_long)
        ta.start()
        assert started.wait(timeout=120)  # anchor is decoding
        t1 = threading.Thread(target=run, args=("late1", long_prompt, 5))
        t2 = threading.Thread(target=run, args=("late2", late2, 4))
        t1.start()
        t2.start()
        t1.join(timeout=180)
        t2.join(timeout=180)
        ta.join(timeout=180)
        assert results["late1"] == want1, (results["late1"], want1)
        assert results["late2"] == want2, (results["late2"], want2)
        assert sched.counters["chunked_admissions"] >= 1, dict(sched.counters)
        assert sched.counters["prefill_chunks"] >= 2, dict(sched.counters)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_warmup_covers_chunk_prefill_shapes(engine_noeos):
    """warmup() must precompile the chunked-prefill programs too (the
    VERDICT r3 #3 principle: no default dispatch runs cold) — serving a
    cold long-prompt admission adds no new _warm_shapes entries."""
    eng = engine_noeos
    cold = ("a cold prompt long enough to need several prefill chunks "
            "while the anchor row keeps decoding its own answer")
    sched = BatchScheduler(eng, window_ms=100, paged=True, page_size=16,
                           pool_tokens=16384, spec=False, prefill_chunk=8)
    try:
        anchor_prompt = eng.build_prompt("the anchor row")
        plen = int(np.asarray(eng.prepare(anchor_prompt)["lens"])[0])
        n = sched.warmup(prompt_len=plen, max_new_tokens=96)
        warm = set(sched._warm_shapes)
        assert any(s[0] == "pchunk" for s in warm), warm
        started = threading.Event()

        def run_anchor():
            for _ in sched.submit(anchor_prompt, max_new_tokens=96):
                started.set()

        def run_cold():
            last = None
            for last in sched.submit(eng.build_prompt(cold),
                                     max_new_tokens=4):
                pass
            assert "error" not in last, last

        ta = threading.Thread(target=run_anchor)
        ta.start()
        assert started.wait(timeout=120)
        tc = threading.Thread(target=run_cold)
        tc.start()
        tc.join(timeout=180)
        ta.join(timeout=180)
        assert sched.counters["chunked_admissions"] >= 1, dict(sched.counters)
        assert set(sched._warm_shapes) == warm, (
            sched._warm_shapes - warm)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_warmup_covers_single_shot_admission(engine_noeos):
    """The admission-prefill warm grid (warmup(admission_prefill=True))
    covers try_admit's single-shot 1-row view prefill: a cold text
    admission into a live batch adds no new _warm_shapes entries (a cold
    prompt bucket mid-flight costs a full XLA prefill compile that stalls
    the whole batch — measured 9.2 s at 1.5B on the tunnel)."""
    eng = engine_noeos
    sched = BatchScheduler(eng, window_ms=100, paged=True, page_size=16,
                           pool_tokens=16384, spec=False, prefill_chunk=0)
    try:
        anchor_prompt = eng.build_prompt("the anchor row")
        plen = int(np.asarray(eng.prepare(anchor_prompt)["lens"])[0])
        n = sched.warmup(prompt_len=plen, max_new_tokens=96)
        warm = set(sched._warm_shapes)
        assert any(s[0] == "padmit" for s in warm), warm
        started = threading.Event()

        def run_anchor():
            for _ in sched.submit(anchor_prompt, max_new_tokens=96):
                started.set()

        def run_cold():
            last = None
            for last in sched.submit(eng.build_prompt("a late one"),
                                     max_new_tokens=4):
                pass
            assert "error" not in last, last

        ta = threading.Thread(target=run_anchor)
        ta.start()
        assert started.wait(timeout=120)
        tc = threading.Thread(target=run_cold)
        tc.start()
        tc.join(timeout=180)
        ta.join(timeout=180)
        assert sched.counters["admitted"] >= 1, dict(sched.counters)
        assert sched.counters["chunked_admissions"] == 0, \
            dict(sched.counters)
        assert set(sched._warm_shapes) == warm, (
            sched._warm_shapes - warm)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_warmup_covers_image_admission_chunk(engine_noeos):
    """VERDICT r4 #6 + ADVICE r4 medium: the image-bearing admission chunk
    has ONE canonical width (the forced span boundary in
    _prefill_chunk_bounds), and warmup() precompiles it — a cold IMAGE
    admission mid-flight adds zero new _warm_shapes entries. Also guards
    the text-only fix: a pixel-less prompt's chunks ignore the sentinel
    span, so they stay on the text grid warmup covers."""
    eng = engine_noeos
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (256, 256, 3), np.uint8)
    prompt = "what objects are on the table and how are they arranged now?"
    sched = BatchScheduler(eng, window_ms=100, paged=True, page_size=16,
                           pool_tokens=16384, spec=False, prefill_chunk=8)
    try:
        plen_img = int(np.asarray(
            eng.prepare(eng.build_prompt(prompt), img)["lens"])[0])
        sched.warmup(prompt_len=plen_img, max_new_tokens=96)
        warm = set(sched._warm_shapes)
        assert any(s[0] == "pchunk" and s[3] for s in warm), warm
        started = threading.Event()

        def run_anchor():
            for _ in sched.submit(eng.build_prompt("the anchor row"),
                                  max_new_tokens=96):
                started.set()

        def run_img():
            last = None
            for last in sched.submit(eng.build_prompt(prompt), image=img,
                                     max_new_tokens=4):
                pass
            assert "error" not in last, last

        ta = threading.Thread(target=run_anchor)
        ta.start()
        assert started.wait(timeout=120)
        ti = threading.Thread(target=run_img)
        ti.start()
        ti.join(timeout=180)
        ta.join(timeout=180)
        assert sched.counters["chunked_admissions"] >= 1, dict(sched.counters)
        assert set(sched._warm_shapes) == warm, (
            sched._warm_shapes - warm)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_warmup_covers_single_shot_image_admission(engine_noeos):
    """Single-shot (prefill_chunk=0) image admissions hit the
    encoder-in-prefill program at the prompt's _ADMIT_STEP bucket; the
    warm grid covers it — a cold image admission adds no shapes."""
    eng = engine_noeos
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (256, 256, 3), np.uint8)
    prompt = "describe the picture"
    sched = BatchScheduler(eng, window_ms=100, paged=True, page_size=16,
                           pool_tokens=16384, spec=False, prefill_chunk=0)
    try:
        plen_img = int(np.asarray(
            eng.prepare(eng.build_prompt(prompt), img)["lens"])[0])
        sched.warmup(prompt_len=plen_img, max_new_tokens=96)
        warm = set(sched._warm_shapes)
        assert any(s[0] == "padmit" and s[3] for s in warm), warm
        started = threading.Event()

        def run_anchor():
            for _ in sched.submit(eng.build_prompt("the anchor row"),
                                  max_new_tokens=96):
                started.set()

        def run_img():
            last = None
            for last in sched.submit(eng.build_prompt(prompt), image=img,
                                     max_new_tokens=4):
                pass
            assert "error" not in last, last

        ta = threading.Thread(target=run_anchor)
        ta.start()
        assert started.wait(timeout=120)
        ti = threading.Thread(target=run_img)
        ti.start()
        ti.join(timeout=180)
        ta.join(timeout=180)
        assert sched.counters["admitted"] >= 1, dict(sched.counters)
        assert sched.counters["chunked_admissions"] == 0, \
            dict(sched.counters)
        assert set(sched._warm_shapes) == warm, (
            sched._warm_shapes - warm)
        assert pool_clean(sched)
    finally:
        sched.shutdown()


def test_chunked_admission_image_prompt(engine_noeos):
    """An image admission chunks too (W=8 < the 16 image tokens, so the
    image chunk widens to the whole span); output matches serial and the
    overlay lands at the right offset."""
    eng = engine_noeos
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (256, 256, 3), np.uint8)
    prompt = "what objects are on the table and how are they arranged?"
    sched = BatchScheduler(eng, window_ms=100, paged=True, page_size=16,
                           pool_tokens=16384, prefill_chunk=8)
    try:
        want = eng.chat(prompt, image=img, max_new_tokens=5)[0]
        results = {}
        started = threading.Event()

        def run_long():
            last = None
            for last in sched.submit(eng.build_prompt("anchor"),
                                     max_new_tokens=256):
                started.set()
            assert "error" not in last, last

        def run_img():
            last = None
            for last in sched.submit(eng.build_prompt(prompt), image=img,
                                     max_new_tokens=5):
                pass
            assert "error" not in last, last
            results["img"] = last["text"]

        ta = threading.Thread(target=run_long)
        ta.start()
        assert started.wait(timeout=120)
        ti = threading.Thread(target=run_img)
        ti.start()
        ti.join(timeout=180)
        ta.join(timeout=180)
        assert results["img"] == want, (results["img"], want)
        assert sched.counters["chunked_admissions"] >= 1, dict(sched.counters)
        assert pool_clean(sched)
    finally:
        sched.shutdown()
