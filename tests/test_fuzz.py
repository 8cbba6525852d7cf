"""Property/fuzz tests for the trickiest static-shape machinery: sentinel
expansion, overlay, KV-cache ragged decode, and top-p filtering."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvlm_tpu.config import Qwen2Config
from fastvlm_tpu.models import qwen2
from fastvlm_tpu.ops.kv_cache import init_cache
from fastvlm_tpu.ops.sampling import SamplingParams, _apply_top_p, sample
from fastvlm_tpu.ops.splice import (
    expand_image_ids, expand_image_ids_multi, overlay_image_embeds, pad_batch)


def test_fuzz_expand_and_overlay_roundtrip():
    rng = np.random.RandomState(0)
    d, n_img = 6, 3
    for trial in range(25):
        n_text = rng.randint(1, 12)
        ids = rng.randint(1, 50, n_text).tolist()
        n_imgs = rng.randint(0, 3)
        for _ in range(n_imgs):
            ids.insert(rng.randint(0, len(ids) + 1), -200)
        row, starts = expand_image_ids_multi(ids, n_img)
        assert len(row) == len(ids) + n_imgs * (n_img - 1)
        assert len(starts) == n_imgs

        if n_imgs == 0:
            continue
        text = rng.randn(1, len(row) + 4, d).astype(np.float32)
        vis = rng.randn(1, n_imgs, n_img, d).astype(np.float32)
        out = np.asarray(overlay_image_embeds(
            jnp.asarray(text),
            jnp.asarray(vis[:, 0]), jnp.asarray([starts[0]], np.int32)))
        # positions outside the span untouched
        s = starts[0]
        np.testing.assert_array_equal(out[0, :s], text[0, :s])
        np.testing.assert_array_equal(out[0, s + n_img: len(row)],
                                      text[0, s + n_img: len(row)])
        np.testing.assert_array_equal(out[0, s:s + n_img], vis[0, 0])


def test_fuzz_ragged_batch_decode_independence():
    """Every row in a ragged batch decodes exactly as it would alone."""
    cfg = Qwen2Config(vocab_size=97, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=2, head_dim=8,
                      intermediate_size=64)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    smax = 24

    # jitted prefill + decode step: one compile per batch size (b=4 once,
    # b=1 shared by all four solo decodes) instead of op-by-op eager
    # dispatch per call (~10 s each on this 1-core host)
    @jax.jit
    def _prefill(ids, lens):
        b = ids.shape[0]
        cache = init_cache(cfg.num_layers, b, smax, cfg.num_kv_heads,
                           cfg.head_dim, jnp.float32)
        e = qwen2.embed(params, ids)
        mask = qwen2.prefill_mask(lens, 12, smax)
        pos = jnp.arange(12)[None].repeat(b, 0)
        h, cache = qwen2.forward(params, cfg, e, pos, cache=cache, mask=mask)
        cache = cache._replace(lengths=lens)
        last = jnp.take_along_axis(h, (lens - 1)[:, None, None], 1)
        tok = jnp.argmax(qwen2.logits_from_hidden(params, last, cfg), -1)[:, 0]
        return tok, cache

    @jax.jit
    def _step(tok, cache):
        e1 = qwen2.embed(params, tok[:, None].astype(jnp.int32))
        m = qwen2.decode_mask(cache.lengths, smax)
        h, cache = qwen2.forward(params, cfg, e1, cache.lengths[:, None],
                                 cache=cache, mask=m, prefill=False)
        tok = jnp.argmax(qwen2.logits_from_hidden(params, h, cfg), -1)[:, 0]
        return tok, cache

    def greedy_decode(rows):
        b = len(rows)
        ids = np.zeros((b, 12), np.int32)
        lens = np.zeros((b,), np.int32)
        for i, r in enumerate(rows):
            ids[i, :len(r)] = r
            lens[i] = len(r)
        tok, cache = _prefill(jnp.asarray(ids), jnp.asarray(lens))
        outs = [[] for _ in range(b)]
        for step in range(4):
            host = np.asarray(tok)
            for i in range(b):
                outs[i].append(int(host[i]))
            tok, cache = _step(tok, cache)
        return outs

    rows = [rng.randint(1, 97, rng.randint(2, 12)).tolist() for _ in range(4)]
    batched = greedy_decode(rows)
    for i, r in enumerate(rows):
        alone = greedy_decode([r])
        assert batched[i] == alone[0], (i, batched[i], alone[0])


def test_fuzz_top_p_keeps_nucleus():
    rng = np.random.RandomState(2)
    for _ in range(20):
        logits = rng.randn(1, 32).astype(np.float32) * 3
        top_p = float(rng.uniform(0.1, 0.95))
        filtered = np.asarray(_apply_top_p(jnp.asarray(logits), top_p))
        kept = filtered[0] > -1e29
        # argmax always kept
        assert kept[logits[0].argmax()]
        # kept set is exactly the smallest prefix of sorted probs with
        # cumulative (exclusive) mass < top_p
        probs = np.exp(logits[0] - logits[0].max())
        probs /= probs.sum()
        order = np.argsort(-probs)
        cum = 0.0
        expect = np.zeros(32, bool)
        for idx in order:
            if cum < top_p:
                expect[idx] = True
            cum += probs[idx]
        # ties in logits can make boundary membership ambiguous; compare
        # only where probabilities are distinct from the boundary value
        boundary = probs[order][expect[order].sum() - 1]
        clear = np.abs(probs - boundary) > 1e-6
        np.testing.assert_array_equal(kept[clear], expect[clear])


def test_fuzz_sampling_respects_support():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray([[0.0, -1e30, 5.0, -1e30, 2.0]], jnp.float32)
    for i in range(30):
        k = jax.random.fold_in(key, i)
        t = sample(k, logits, SamplingParams(temperature=1.5, top_p=0.99))
        assert int(t[0]) in (0, 2, 4)
