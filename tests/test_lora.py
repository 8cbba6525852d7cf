"""LoRA adapter tests: identity at init, training updates only adapters,
merge reproduces adapted forward."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvlm_tpu.config import Qwen2Config
from fastvlm_tpu.models import qwen2
from fastvlm_tpu.train import lora

CFG = Qwen2Config(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                  num_kv_heads=2, head_dim=8, intermediate_size=64,
                  tie_word_embeddings=True)


def _forward(params, ids):
    h, _ = qwen2.forward(params, CFG, qwen2.embed(params, jnp.asarray(ids)),
                         jnp.arange(ids.shape[1])[None])
    return np.asarray(qwen2.logits_from_hidden(params, h, CFG))


def test_lora_identity_at_init():
    params = qwen2.init(jax.random.PRNGKey(0), CFG)
    lparams = lora.add_lora(params, jax.random.PRNGKey(1), r=4)
    ids = np.array([[3, 9, 22]], np.int32)
    np.testing.assert_allclose(_forward(params, ids), _forward(lparams, ids),
                               rtol=1e-6, atol=1e-6)


def test_lora_training_updates_only_adapters():
    import optax

    params = qwen2.init(jax.random.PRNGKey(0), CFG)
    lparams = lora.add_lora(params, jax.random.PRNGKey(1), r=4)
    tx = lora.make_lora_optimizer(lparams, lr=1e-2)
    opt_state = tx.init(lparams)

    ids = np.array([[3, 9, 22, 7]], np.int32)
    tgt = np.array([[9, 22, 7, 5]], np.int32)

    def loss(p):
        h, _ = qwen2.forward(p, CFG, qwen2.embed(p, jnp.asarray(ids)),
                             jnp.arange(4)[None])
        logits = qwen2.logits_from_hidden(p, h, CFG)
        onehot = jax.nn.one_hot(tgt, CFG.vocab_size)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))

    l0 = float(loss(lparams))
    p = lparams
    for _ in range(5):
        g = jax.grad(loss)(p)
        updates, opt_state = tx.update(g, opt_state, p)
        p = optax.apply_updates(p, updates)
    assert float(loss(p)) < l0
    # dense weights untouched
    np.testing.assert_array_equal(
        np.asarray(p["layers"]["q"]["w"]),
        np.asarray(lparams["layers"]["q"]["w"]))
    np.testing.assert_array_equal(np.asarray(p["embed"]),
                                  np.asarray(lparams["embed"]))
    # adapters moved
    assert not np.allclose(np.asarray(p["layers"]["q"]["lora_b"]), 0)

    # merge folds the adaptation into dense weights
    merged = lora.merge(p)
    assert "lora_a" not in merged["layers"]["q"]
    np.testing.assert_allclose(_forward(p, ids), _forward(merged, ids),
                               rtol=2e-5, atol=2e-5)

    # split save extracts adapter leaves only
    split = lora.split_lora_state(p)
    assert set(split) <= {"q", "k", "v", "o", "gate", "up", "down"}
    assert "lora_a" in split["q"]
