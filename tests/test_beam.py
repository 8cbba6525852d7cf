"""Beam search parity: ops/beam.beam_search (device-resident, static-shape)
vs an independent PyTorch beam search over the same HF tiny model
(reference predict.py:57,67 routes num_beams through HF generate; our
algorithm spec is documented in ops/beam.py and implemented twice —
once in JAX below the test, once in torch INSIDE the test — so agreement
pins the device implementation to the spec, not to itself)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fastvlm_tpu.config import (
    FastViTConfig,
    FastVLMConfig,
    ProjectorConfig,
)
from fastvlm_tpu.models import vlm
from fastvlm_tpu.ops import beam
from fastvlm_tpu.ops.kv_cache import init_cache
from tests.test_qwen2 import TINY, _hf_model, _params_from_hf


def _torch_beam(model, prompt_ids, num_beams, max_new, eos_ids, lp=1.0):
    """Independent reference: full-recompute beam search per ops/beam.py's
    documented algorithm (top-2W candidates, EOS -> finished set of W,
    fixed max_new steps, best of finished vs live-normalized)."""
    W = num_beams
    V = model.config.vocab_size
    n2 = min(2 * W, V)

    def logprobs(seq):
        with torch.no_grad():
            lg = model(torch.tensor([seq])).logits[0, -1].float()
        return torch.log_softmax(lg, -1)

    lp0 = logprobs(prompt_ids)
    scores, toks = torch.topk(lp0, n2)
    finished = []  # (norm_score, tokens)
    live = []      # (score, tokens)
    for s, t in zip(scores.tolist(), toks.tolist()):
        if t in eos_ids:
            finished.append((s / 1.0 ** lp, [t]))
        elif len(live) < W:
            live.append((s, [t]))
    finished = sorted(finished, key=lambda x: -x[0])[:W]

    for step in range(1, max_new):
        length = step + 1
        cands = []
        for bi, (sc, seq) in enumerate(live):
            lgp = logprobs(prompt_ids + seq)
            top = torch.topk(lgp, min(n2, V))
            for s, t in zip(top.values.tolist(), top.indices.tolist()):
                cands.append((sc + s, bi, t))
        cands.sort(key=lambda x: -x[0])
        cands = cands[:n2]
        new_live = []
        for csc, bi, tv in cands:
            if tv in eos_ids:
                finished.append((csc / length ** lp, live[bi][1] + [tv]))
            elif len(new_live) < W:
                new_live.append((csc, live[bi][1] + [tv]))
        finished = sorted(finished, key=lambda x: -x[0])[:W]
        live = new_live

    allh = finished + [(sc / float(max_new) ** lp, seq) for sc, seq in live]
    return max(allh, key=lambda x: x[0])


def _jax_beam(params, prompt_rows, num_beams, max_new, eos_ids, lp=1.0):
    vis = FastViTConfig(layers=(1, 1, 1, 1, 1),
                        embed_dims=(8, 16, 24, 32, 40), image_size=256)
    cfg = FastVLMConfig(
        vision=vis,
        projector=ProjectorConfig(mm_hidden_size=80,
                                  hidden_size=TINY.hidden_size),
        decoder=TINY)
    vparams = {"decoder": params}
    b = len(prompt_rows)
    t = max(len(r) for r in prompt_rows)
    ids = np.zeros((b, t), np.int32)
    lens = np.asarray([len(r) for r in prompt_rows], np.int32)
    for i, r in enumerate(prompt_rows):
        ids[i, : len(r)] = r
    starts = np.full((b,), -1, np.int32)
    cache = init_cache(TINY.num_layers, b, t + max_new, TINY.num_kv_heads,
                       TINY.head_dim, jnp.float32)
    logits, cache = vlm.prefill(vparams, cfg, None, jnp.asarray(ids),
                                jnp.asarray(lens), jnp.asarray(starts), cache)
    return beam.beam_search(
        vparams, cfg, logits, cache, num_beams=num_beams,
        max_new_tokens=max_new, eos_ids=eos_ids, length_penalty=lp)


def test_beam_matches_independent_torch():
    model = _hf_model(TINY)
    params = _params_from_hf(model, TINY)
    rng = np.random.default_rng(0)
    prompts = [[int(x) for x in rng.integers(1, TINY.vocab_size, 7)],
               [int(x) for x in rng.integers(1, TINY.vocab_size, 5)]]
    eos = (31,)  # arbitrary mid-vocab id: random weights make it reachable
    W, max_new = 3, 6

    res = _jax_beam(params, prompts, W, max_new, eos)
    for i, prompt in enumerate(prompts):
        want_score, want_seq = _torch_beam(model, prompt, W, max_new,
                                           list(eos))
        got_len = int(res.lengths[i])
        got_seq = [int(x) for x in np.asarray(res.tokens[i])[:got_len]]
        assert got_seq == want_seq, (i, got_seq, want_seq)
        np.testing.assert_allclose(float(res.scores[i]), want_score,
                                   rtol=1e-4, atol=1e-4)


def test_beam_width_one_equals_greedy():
    """W=1 beam search must reproduce greedy decoding (when no length
    renormalization flips the finished-vs-live pick, i.e. penalty 0)."""
    model = _hf_model(TINY)
    params = _params_from_hf(model, TINY)
    prompt = [5, 99, 23, 64]
    max_new = 8
    eos = (31,)
    res = _jax_beam(params, [prompt], 1, max_new, eos, lp=0.0)

    seq = list(prompt)
    got = []
    for _ in range(max_new):
        with torch.no_grad():
            lg = model(torch.tensor([seq])).logits[0, -1]
        t = int(lg.argmax())
        got.append(t)
        if t in eos:
            break
        seq.append(t)
    n = int(res.lengths[0])
    assert [int(x) for x in np.asarray(res.tokens[0])[:n]] == got
