"""Pipeline parallelism (parallel/pipeline.py): the GPipe schedule over the
stacked-layer decoder must be bit-close to the plain forward, and its
gradients must match (ppermute is differentiable — same math, different
collective layout)."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvlm_tpu.config import Qwen2Config
from fastvlm_tpu.models import qwen2
from fastvlm_tpu.parallel import make_mesh
from fastvlm_tpu.parallel.pipeline import (
    forward_pipelined,
    shard_decoder_pipeline,
    stage_specs,
)

CFG = Qwen2Config(vocab_size=64, hidden_size=32, num_layers=4, num_heads=4,
                  num_kv_heads=2, head_dim=8, intermediate_size=64,
                  tie_word_embeddings=True)


def _inputs(m, b, t, seed=0):
    ids = jax.random.randint(jax.random.PRNGKey(seed), (m * b, t), 0,
                             CFG.vocab_size)
    lens = jnp.asarray([t, t - 2, t, t - 1][: m * b], jnp.int32)
    return ids, lens


def _microbatch(x, m):
    return x.reshape((m, -1) + x.shape[1:])


def test_pipelined_forward_matches_plain():
    mesh = make_mesh(dp=2, tp=4)  # 4 pipeline stages on the model axis
    params = qwen2.init(jax.random.PRNGKey(0), CFG)
    m, b, t = 4, 1, 8
    ids, lens = _inputs(m, b, t)
    embeds = qwen2.embed(params, ids)
    positions = jnp.arange(t, dtype=jnp.int32)[None].repeat(m * b, 0)
    mask = qwen2.prefill_mask(lens, t, t)

    want, _ = qwen2.forward(params, CFG, embeds, positions, mask=mask)

    sharded = shard_decoder_pipeline(params, mesh)
    got = forward_pipelined(
        sharded, CFG, _microbatch(embeds, m), _microbatch(positions, m),
        _microbatch(mask, m), mesh)
    got = got.reshape(m * b, t, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pipelined_gradients_match_plain():
    mesh = make_mesh(dp=2, tp=4)
    params = qwen2.init(jax.random.PRNGKey(1), CFG)
    m, b, t = 2, 2, 8
    ids, lens = _inputs(m, b, t, seed=2)
    positions = jnp.arange(t, dtype=jnp.int32)[None].repeat(m * b, 0)
    mask = qwen2.prefill_mask(lens, t, t)
    tgt = jax.random.normal(jax.random.PRNGKey(3),
                            (m * b, t, CFG.hidden_size))

    def loss_plain(p):
        e = qwen2.embed(p, ids)
        h, _ = qwen2.forward(p, CFG, e, positions, mask=mask)
        return jnp.mean((h - tgt) ** 2)

    def loss_pp(p):
        e = qwen2.embed(p, ids)
        h = forward_pipelined(p, CFG, _microbatch(e, m),
                              _microbatch(positions, m),
                              _microbatch(mask, m), mesh)
        return jnp.mean((h.reshape(m * b, t, -1) - tgt) ** 2)

    g_ref = jax.grad(loss_plain)(params)
    g_pp = jax.grad(loss_pp)(shard_decoder_pipeline(params, mesh))
    for (k, a), (_, b_) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(jax.device_get(g_pp))[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, err_msg=str(k))


def test_stage_specs_shard_only_layers():
    params = qwen2.init(jax.random.PRNGKey(4), CFG)
    specs = stage_specs(params)
    from jax.sharding import PartitionSpec as P

    assert specs["embed"] == P()
    assert specs["layers"]["q"]["w"] == P("model")
    assert specs["final_norm"] == P()
