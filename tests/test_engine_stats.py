"""Decode-stats accounting must be exact (VERDICT r1 #10): decode_tokens
counts chunk slots actually consumed (incl. the EOS), never padding and never
the prefill-sampled first token."""

import numpy as np

from fastvlm_tpu.data.preprocessing import ByteTokenizer
from fastvlm_tpu.engine import build_engine
from fastvlm_tpu.ops.sampling import SamplingParams

GREEDY = SamplingParams(temperature=0.0)


class SpyTokenizer(ByteTokenizer):
    """Records every ids list passed to decode (engine passes the full
    out_ids each yield), so tests can see exact emitted token ids."""

    def __init__(self):
        self.calls = []

    def decode(self, ids, skip_special_tokens=True):
        self.calls.append([int(i) for i in ids])
        return super().decode(ids, skip_special_tokens)


def _run(engine, max_new, sampling=GREEDY):
    prompt = engine.build_prompt("what?")
    img = np.zeros((256, 256, 3), np.float32)
    last = None
    for last in engine.stream(prompt, img, max_new_tokens=max_new,
                              sampling=sampling, seed=7):
        pass
    return last


def test_decode_tokens_exclude_prefill_token():
    """Without EOS, decode chunks produce exactly max_new - 1 tokens (the
    first comes from prefill logits and is not decode work)."""
    engine = build_engine(random_tiny=True, chunk=4)
    last = _run(engine, max_new=9)
    stats = last["stats"]
    # 9 total = 1 (prefill) + 8 decode slots in two chunks of 4
    assert stats["decode_tokens"] == 8, stats
    assert stats["tok_per_s"] > 0


def test_decode_tokens_stop_at_eos_mid_chunk():
    """Force EOS mid-chunk: slots after the EOS are padding and must not be
    counted."""
    temp = SamplingParams(temperature=1.0)

    spy = SpyTokenizer()
    probe = build_engine(random_tiny=True, chunk=4)
    probe.tokenizer = spy
    _run(probe, max_new=9, sampling=temp)
    seq = spy.calls[-1]  # [prefill tok] + 8 decode toks (same seed => same seq)
    assert len(seq) == 9, seq

    # pick a token whose first occurrence is a mid-first-chunk decode slot
    j = next(i for i in (2, 3, 1) if seq[i] not in seq[:i])
    eos_tok = seq[j]

    engine = build_engine(random_tiny=True, chunk=4, eos_ids=(eos_tok,))
    last = _run(engine, max_new=9, sampling=temp)
    stats = last["stats"]
    # decode consumed exactly j slots: seq[1..j-1] then the EOS at slot j
    assert stats["decode_tokens"] == j, (stats, seq, j)


def test_decode_tokens_zero_when_first_token_is_eos():
    """Greedy tiny model emits a constant token; making it the EOS means the
    prefill-sampled token already terminates: zero decode work."""
    spy = SpyTokenizer()
    probe = build_engine(random_tiny=True, chunk=4)
    probe.tokenizer = spy
    _run(probe, max_new=5)
    first = spy.calls[-1][0]

    engine = build_engine(random_tiny=True, chunk=4, eos_ids=(first,))
    last = _run(engine, max_new=5)
    stats = last["stats"]
    assert stats["decode_tokens"] == 0 and stats["tok_per_s"] == 0.0, stats
    assert last["text"] == ""


def test_token_level_keyword_stopping():
    """Exact KeywordsStoppingCriteria parity (reference mm_utils.py:218-250):
    the output tail is compared token-for-token against each keyword's ids
    (leading BOS dropped), and generation stops with the keyword stripped."""
    engine = build_engine(random_tiny=True)
    kw = engine._keyword_token_ids(("ab", "", "xyz"))
    enc = engine.tokenizer("ab").input_ids
    assert kw[0] == [int(i) for i in enc]
    assert len(kw) == 2  # empty string skipped

    # find what the model actually emits, then stop on a tail of it
    prompt = engine.build_prompt("write")
    full, _ = engine.chat("write", max_new_tokens=12)
    if len(full) >= 4:
        stop = full[2:4]
        last = None
        for last in engine.stream(prompt, None, max_new_tokens=12,
                                  stop_strings=(stop,)):
            pass
        assert stop not in last["text"] or last["text"].index(stop) > \
            full.index(stop)  # stopped at (or before) the first occurrence
        assert len(last["text"]) <= len(full)
