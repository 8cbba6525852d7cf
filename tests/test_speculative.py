"""Prompt-lookup speculative decoding: exact-greedy parity + draft mechanics.

The reference gets this technique through HF assisted decoding
(``generate(prompt_lookup_num_tokens=...)``, transformers utils); here it is
a static-shape device loop (ops/speculative.py + vlm.generate_spec), so the
contract to pin is: same tokens as plain greedy ``generate``, fewer steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvlm_tpu.models import vlm
from fastvlm_tpu.ops.speculative import accept_counts, ngram_draft, spec_mask
from fastvlm_tpu.ops.splice import expand_image_ids, pad_batch

from tests.test_vlm import tiny_vlm_cfg


def test_ngram_draft_finds_most_recent_match():
    #         0  1  2  3  4  5  6  7  8      tail 3-gram = (7, 8, 9)
    hist = [[4, 7, 8, 9, 1, 2, 7, 8, 9, 0, 0, 0]]
    h = jnp.asarray(hist, jnp.int32)
    # trailing 3-gram at pos 6..8; earlier occurrence at pos 1..3 -> draft
    # continues from pos 4: tokens 1, 2, 7
    d = ngram_draft(h, jnp.asarray([9]), k=3, n=3)
    np.testing.assert_array_equal(np.asarray(d), [[1, 2, 7]])


def test_ngram_draft_prefers_recent_and_handles_no_match():
    h = jnp.asarray([[1, 2, 3, 5, 1, 2, 3, 6, 1, 2, 3, 0, 0]], jnp.int32)
    # tail (1,2,3) at 8..10; matches at 0 and 4; most recent = 4 -> next is 6
    d = ngram_draft(h, jnp.asarray([11]), k=2, n=3)
    np.testing.assert_array_equal(np.asarray(d), [[6, 1]])
    # no earlier occurrence -> fallback repeats the last token
    h2 = jnp.asarray([[9, 8, 7, 0, 0, 0, 0, 0]], jnp.int32)
    d2 = ngram_draft(h2, jnp.asarray([3]), k=3, n=3)
    np.testing.assert_array_equal(np.asarray(d2), [[7, 7, 7]])


def test_accept_counts():
    draft = jnp.asarray([[1, 2, 3], [1, 9, 3], [9, 9, 9]])
    model = jnp.asarray([[1, 2, 3], [1, 2, 3], [1, 2, 3]])
    np.testing.assert_array_equal(np.asarray(accept_counts(draft, model)),
                                  [3, 1, 0])


def test_spec_mask_matches_decode_mask_row0():
    from fastvlm_tpu.models.qwen2 import decode_mask

    lengths = jnp.asarray([3, 7])
    m = spec_mask(lengths, t=4, s_max=12)
    d = decode_mask(lengths, s_max=12)
    np.testing.assert_array_equal(np.asarray(m[:, :1]), np.asarray(d))
    # query i attends exactly lengths+i+1 keys
    np.testing.assert_array_equal(
        np.asarray(m.sum(-1)),
        np.asarray(lengths[:, None] + jnp.arange(4)[None, :] + 1))


def _spec_setup(seed=0, batch_rows=None, pad_to=24):
    cfg = tiny_vlm_cfg()
    params = vlm.init(jax.random.PRNGKey(seed), cfg)
    images = jax.random.uniform(jax.random.PRNGKey(seed + 1),
                                (len(batch_rows), 128, 128, 3))
    rows, starts = [], []
    for raw in batch_rows:
        r, s = expand_image_ids(raw, cfg.num_image_tokens)
        rows.append(r)
        starts.append(s)
    ids, seq_lens, starts = pad_batch(rows, starts, pad_to=pad_to)
    return cfg, params, images, (jnp.asarray(ids), jnp.asarray(seq_lens),
                                 jnp.asarray(starts))


@pytest.mark.parametrize("seed", [0, 3])
def test_spec_matches_greedy_generate(seed):
    """Same tokens/counts as plain greedy generate, in <= as many steps."""
    rows = [[5, 7, -200, 9, 11], [1, 2, 3, 4, 5, 6, 7]]
    cfg, params, images, (ids, lens, starts) = _spec_setup(seed, rows)
    max_new = 24

    ref = vlm.generate(params, cfg, images, ids, lens, starts,
                       jax.random.PRNGKey(9), max_new_tokens=max_new,
                       eos_ids=(251,))
    got = vlm.generate_spec(params, cfg, images, ids, lens, starts,
                            max_new_tokens=max_new, eos_ids=(251,),
                            draft_k=4)
    np.testing.assert_array_equal(np.asarray(got.num_generated),
                                  np.asarray(ref.num_generated))
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(ref.tokens))
    assert int(got.steps) <= max_new


def test_spec_eos_stops_rows_like_generate():
    """Pick a token greedy actually emits as EOS and re-run both paths."""
    rows = [[5, 7, -200, 9, 11]]
    cfg, params, images, (ids, lens, starts) = _spec_setup(1, rows)
    probe = vlm.generate(params, cfg, images, ids, lens, starts,
                         jax.random.PRNGKey(0), max_new_tokens=12,
                         eos_ids=(9999,))  # unhittable: vocab is 256
    toks = np.asarray(probe.tokens)[0]
    eos = int(toks[min(4, len(toks) - 1)])  # force a mid-stream EOS

    ref = vlm.generate(params, cfg, images, ids, lens, starts,
                       jax.random.PRNGKey(0), max_new_tokens=12,
                       eos_ids=(eos,))
    got = vlm.generate_spec(params, cfg, images, ids, lens, starts,
                            max_new_tokens=12, eos_ids=(eos,), draft_k=4)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.num_generated),
                                  np.asarray(ref.num_generated))


def test_spec_accepts_on_repetitive_prompt():
    """A prompt that loops lets the n-gram draft land >1 token per step."""
    # tiny random models fall into greedy repetition quickly; seed the
    # history with an explicit repeating pattern to guarantee lookups hit
    rows = [[11, 12, 13, 14] * 5]
    cfg, params, images, (ids, lens, starts) = _spec_setup(2, rows, pad_to=24)
    got = vlm.generate_spec(params, cfg, None, ids, lens,
                            jnp.full_like(starts, -1),
                            max_new_tokens=32, eos_ids=(9999,), draft_k=6)
    assert int(got.num_generated[0]) == 32
    # fewer verify passes than tokens => speculation committed >1/step
    assert int(got.steps) < 32
    assert int(got.accepted) > 0


def test_engine_generate_spec_matches_greedy_stream():
    """Engine surface: spec text == greedy stream text, stats carry accept."""
    import numpy as onp

    from fastvlm_tpu.engine import build_engine
    from fastvlm_tpu.ops.sampling import SamplingParams

    eng = build_engine(random_tiny=True, platform="cpu")
    img = onp.zeros((256, 256, 3), onp.float32)
    prompt = eng.build_prompt("describe describe describe")
    ref_text, _ = eng.generate(prompt, img, max_new_tokens=16,
                               sampling=SamplingParams())  # greedy
    got_text, stats = eng.generate_spec(prompt, img, max_new_tokens=16)
    assert got_text == ref_text
    assert stats["spec_steps"] >= 1
    assert 0.0 <= stats["spec_accept_rate"] <= 1.0


def test_engine_stream_spec_matches_greedy_stream():
    """Streaming surface: spec=True yields the same final text as plain
    greedy streaming, with incremental chunks that are prefixes of it
    (worker cadence preserved — engine.stream spec branch)."""
    import numpy as onp

    from fastvlm_tpu.engine import build_engine

    eng = build_engine(random_tiny=True, platform="cpu")
    img = onp.zeros((256, 256, 3), onp.float32)
    prompt = eng.build_prompt("describe describe describe")
    ref = list(eng.stream(prompt, img, max_new_tokens=16))
    got = list(eng.stream(prompt, img, max_new_tokens=16, spec=True))
    assert got[-1]["text"] == ref[-1]["text"]
    assert len(got) >= 2  # TTFT chunk + at least one decode chunk
    for c in got:
        assert got[-1]["text"].startswith(c["text"])
    assert got[-1]["stats"]["spec_steps"] >= 1
    # budget cap: a tiny budget commits exactly that many tokens
    small = list(eng.stream(prompt, img, max_new_tokens=3, spec=True))
    assert small[-1]["stats"]["decode_tokens"] <= 3


def test_engine_stream_spec_rejects_sampling():
    import numpy as onp

    from fastvlm_tpu.engine import build_engine
    from fastvlm_tpu.ops.sampling import SamplingParams

    eng = build_engine(random_tiny=True, platform="cpu")
    img = onp.zeros((256, 256, 3), onp.float32)
    with pytest.raises(ValueError, match="greedy"):
        next(eng.stream(eng.build_prompt("hi"), img, spec=True,
                        sampling=SamplingParams(temperature=0.7)))


def test_spec_budget_cap_exact():
    """num_generated never exceeds max_new_tokens even mid-acceptance."""
    rows = [[11, 12, 13, 14] * 5]
    cfg, params, images, (ids, lens, starts) = _spec_setup(2, rows, pad_to=24)
    for max_new in (3, 5):
        ref = vlm.generate(params, cfg, None, ids, lens,
                           jnp.full_like(starts, -1), jax.random.PRNGKey(0),
                           max_new_tokens=max_new, eos_ids=(9999,))
        got = vlm.generate_spec(params, cfg, None, ids, lens,
                                jnp.full_like(starts, -1),
                                max_new_tokens=max_new, eos_ids=(9999,),
                                draft_k=6)
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(ref.tokens))
        assert int(got.num_generated[0]) == max_new
