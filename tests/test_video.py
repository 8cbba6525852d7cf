"""Video QA path: prefix-reuse continuation must match a full prefill."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvlm_tpu.engine import build_engine
from fastvlm_tpu.models import vlm
from fastvlm_tpu.ops.kv_cache import init_cache
from fastvlm_tpu.ops.splice import expand_image_ids, pad_batch
from fastvlm_tpu.video import VideoQA, qa_over_stream


def test_prefill_continue_matches_full_prefill():
    engine = build_engine(random_tiny=True)
    cfg = engine.cfg
    params = engine.params
    n = cfg.num_image_tokens

    raw = [5, 7, 11, -200, 9, 13]
    row, start = expand_image_ids(raw, n)
    total = len(row)
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3))

    # full prefill
    ids, lens, starts = pad_batch([row], [start], total)
    cache_a = init_cache(cfg.decoder.num_layers, 1, total + 8,
                         cfg.decoder.num_kv_heads, cfg.decoder.head_dim,
                         jnp.float32)
    logits_a, cache_a = vlm.prefill(params, cfg, images, jnp.asarray(ids),
                                    jnp.asarray(lens), jnp.asarray(starts),
                                    cache_a)

    # prefix (before image span) then continuation
    prefix = row[:start]
    suffix = row[start:]
    cache_b = init_cache(cfg.decoder.num_layers, 1, total + 8,
                         cfg.decoder.num_kv_heads, cfg.decoder.head_dim,
                         jnp.float32)
    pids, plens, pstarts = pad_batch([prefix], [-1], len(prefix))
    _, cache_b = vlm.prefill(params, cfg, None, jnp.asarray(pids),
                             jnp.asarray(plens), jnp.asarray(pstarts), cache_b)
    sids, slens, _ = pad_batch([suffix], [0], len(suffix))
    logits_b, cache_b = vlm.prefill_continue(
        params, cfg, images, jnp.asarray(sids), jnp.asarray(slens),
        jnp.asarray([0], np.int32), len(prefix), cache_b)

    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(cache_a.lengths),
                                  np.asarray(cache_b.lengths))
    # cached K/V identical over the valid region
    np.testing.assert_allclose(np.asarray(cache_a.k[:, :, :total]),
                               np.asarray(cache_b.k[:, :, :total]),
                               rtol=1e-4, atol=1e-4)


def test_video_qa_frames_consistent_and_independent():
    """Same frame twice -> same answer; cache reuse must not leak between
    frames (frame 3 == frame 1 gives frame-1's answer again)."""
    engine = build_engine(random_tiny=True)
    vq = VideoQA(engine, "What do you see?", max_new_tokens=6)

    f1 = np.random.RandomState(0).rand(256, 256, 3).astype(np.float32)
    f2 = np.random.RandomState(1).rand(256, 256, 3).astype(np.float32)

    a1, s1 = vq.ask(f1)
    a2, s2 = vq.ask(f2)
    a3, s3 = vq.ask(f1)
    assert a1 == a3, "cache state leaked between frames"
    assert s1["ttft_ms"] > 0 and s3["tokens"] == s1["tokens"]


def test_qa_over_stream():
    engine = build_engine(random_tiny=True)
    vq = VideoQA(engine, "Describe", max_new_tokens=3)
    frames = [np.zeros((256, 256, 3), np.float32) for _ in range(3)]
    results = list(qa_over_stream(vq, frames, latest_only=False))
    assert len(results) == 3
    assert all(isinstance(t, str) for t, _ in results)


def test_video_qa_nonsquare_uint8_frame_is_preprocessed():
    """A raw camera frame at a non-native size must be resized/padded on
    device so the tower emits exactly num_image_tokens (ADVICE r1: array
    inputs previously bypassed preprocessing)."""
    engine = build_engine(random_tiny=True)
    vq = VideoQA(engine, "What?", max_new_tokens=4)

    native = np.random.RandomState(0).rand(256, 256, 3).astype(np.float32)
    odd = (np.random.RandomState(1).rand(480, 640, 3) * 255).astype(np.uint8)
    a1, s1 = vq.ask(native)
    a2, s2 = vq.ask(odd)  # must not crash or silently mis-splice
    assert isinstance(a2, str) and s2["ttft_ms"] > 0

    # uint8 vs prescaled float of the same content agree exactly
    square = (np.random.RandomState(2).rand(256, 256, 3) * 255).astype(np.uint8)
    a_u8, _ = vq.ask(square)
    a_f32, _ = vq.ask(square.astype(np.float32) / 255.0)
    assert a_u8 == a_f32


def test_engine_prepare_array_image_shapes():
    engine = build_engine(random_tiny=True)
    s = engine.cfg.vision.image_size
    for shape, dtype in [((s, s, 3), np.uint8), ((100, 300, 3), np.uint8),
                         ((2, 77, 33, 3), np.float32)]:
        arr = np.zeros(shape, dtype)
        out = engine.prepare_array_image(arr)
        b = shape[0] if len(shape) == 4 else 1
        assert out.shape == (b, s, s, 3), (shape, out.shape)


def test_spec_video_matches_plain_and_accepts_across_frames():
    """spec=True must answer exactly like the plain greedy loop (CPU f32),
    and the previous-answer corpus seeding must land accepted drafts on a
    repeated frame."""
    engine = build_engine(random_tiny=True)
    frames = [np.random.RandomState(s).rand(256, 256, 3).astype(np.float32)
              for s in (0, 1)]

    vq = VideoQA(engine, "What do you see?", max_new_tokens=12)
    plain = [vq.ask(f) for f in (frames[0], frames[1], frames[0])]

    vq_s = VideoQA(engine, "What do you see?", max_new_tokens=12, spec=True,
                   draft_k=4)
    spec = [vq_s.ask(f) for f in (frames[0], frames[1], frames[0])]

    assert [t for t, _ in spec] == [t for t, _ in plain]
    assert [s["tokens"] for _, s in spec] == [s["tokens"] for _, s in plain]
    # frame 3 repeats frame 1 -> its full answer sits in the corpus; the
    # lookup should verify multi-token spans (strictly positive acceptance)
    assert spec[2][1]["spec_accept_rate"] > 0

    # pipelined spec path agrees too
    vq_p = VideoQA(engine, "What do you see?", max_new_tokens=12, spec=True,
                   draft_k=4)
    piped = [t for t, _ in qa_over_stream(
        vq_p, [frames[0], frames[1], frames[0]], latest_only=False,
        pipelined=True)]
    assert piped == [t for t, _ in plain]

    import pytest

    from fastvlm_tpu.ops.sampling import SamplingParams

    with pytest.raises(ValueError):
        VideoQA(engine, "x", spec=True,
                sampling=SamplingParams(temperature=0.7))


def test_pipelined_stream_matches_sequential():
    """Double-buffered dispatch/finish must yield the same answers as the
    sequential ask() loop (greedy, same frames)."""
    engine = build_engine(random_tiny=True)
    frames = [np.random.RandomState(s).rand(256, 256, 3).astype(np.float32)
              for s in (0, 1, 2)]

    vq_a = VideoQA(engine, "What do you see?", max_new_tokens=6)
    seq = [vq_a.ask(f)[0] for f in frames]

    vq_b = VideoQA(engine, "What do you see?", max_new_tokens=6)
    piped = [t for t, _ in qa_over_stream(vq_b, frames, latest_only=False,
                                          pipelined=True)]
    assert piped == seq, (piped, seq)
