"""Mesh/sharding/training tests on the 8-device virtual CPU mesh
(SURVEY.md §4 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvlm_tpu.config import FastViTConfig, FastVLMConfig, ProjectorConfig, Qwen2Config
from fastvlm_tpu.models import vlm
from fastvlm_tpu.ops.splice import expand_image_ids, pad_batch
from fastvlm_tpu.parallel import make_mesh, sharding
from fastvlm_tpu.parallel.mesh import data_sharding
from fastvlm_tpu.train import step as train_step_mod


def tiny_cfg(vocab=256):
    vision = FastViTConfig(layers=(1, 1, 1, 1, 1), embed_dims=(8, 16, 32, 64, 128),
                           image_size=128, attn_head_dim=16)
    decoder = Qwen2Config(vocab_size=vocab, hidden_size=64, num_layers=2,
                          num_heads=4, num_kv_heads=2, head_dim=16,
                          intermediate_size=128)
    proj = ProjectorConfig(mm_hidden_size=vision.out_channels, hidden_size=64)
    return FastVLMConfig(vision=vision, projector=proj, decoder=decoder)


def _batch(cfg, batch_size, pad_to=16):
    rows, starts = [], []
    for i in range(batch_size):
        row, s = expand_image_ids([5, 7 + i, -200, 9], cfg.num_image_tokens)
        rows.append(row)
        starts.append(s)
    ids, lens, starts = pad_batch(rows, starts, pad_to)
    return ids, lens, starts


def test_mesh_shapes():
    mesh = make_mesh(tp=4)
    assert mesh.shape == {"data": 2, "model": 4}
    mesh = make_mesh(tp=1)
    assert mesh.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=3)


def test_tp_generate_matches_single_device():
    """TP-sharded generate must equal unsharded generate bit-for-bit path."""
    cfg = tiny_cfg()
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3))
    ids, lens, starts = _batch(cfg, 2)

    res_ref = vlm.generate(params, cfg, images, jnp.asarray(ids),
                           jnp.asarray(lens), jnp.asarray(starts),
                           jax.random.PRNGKey(2), max_new_tokens=4,
                           eos_ids=(255,))

    mesh = make_mesh(dp=2, tp=4)
    sharded = sharding.shard_vlm(params, cfg, mesh)
    imgs_s = jax.device_put(images, data_sharding(mesh))
    res_tp = vlm.generate(sharded, cfg, imgs_s, jnp.asarray(ids),
                          jnp.asarray(lens), jnp.asarray(starts),
                          jax.random.PRNGKey(2), max_new_tokens=4,
                          eos_ids=(255,))
    np.testing.assert_array_equal(np.asarray(res_ref.tokens),
                                  np.asarray(res_tp.tokens))


def test_train_step_decreases_loss():
    cfg = tiny_cfg(vocab=64)
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    tx = train_step_mod.make_optimizer(lr=1e-3, freeze_vision=True)
    state = train_step_mod.make_train_state(params, tx)

    ids, lens, starts = _batch(cfg, 2)
    ids = ids % 64
    labels = np.where(np.arange(ids.shape[1])[None] < lens[:, None], ids, -100)
    # ignore the image placeholder span in the labels
    for b in range(2):
        labels[b, starts[b]: starts[b] + cfg.num_image_tokens] = -100
    batch = {
        "images": jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3)),
        "ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "image_starts": jnp.asarray(starts),
        "attn_lens": jnp.asarray(lens),
    }
    losses = []
    for _ in range(5):
        state, loss = train_step_mod.train_step(state, cfg, tx, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_train_step_sharded_runs():
    """Full train step under DP x TP mesh executes and returns finite loss."""
    cfg = tiny_cfg(vocab=64)
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=2, tp=4)
    params = sharding.shard_vlm(params, cfg, mesh)
    tx = train_step_mod.make_optimizer(lr=1e-3)
    state = train_step_mod.make_train_state(params, tx)

    ids, lens, starts = _batch(cfg, 2)
    ids = ids % 64
    labels = np.where(np.arange(ids.shape[1])[None] < lens[:, None], ids, -100)
    batch = {
        "images": jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3)),
            data_sharding(mesh)),
        "ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "image_starts": jnp.asarray(starts),
        "attn_lens": jnp.asarray(lens),
    }
    state, loss = train_step_mod.train_step(state, cfg, tx, batch)
    assert np.isfinite(float(loss))


def test_frozen_vision_unchanged_after_step():
    cfg = tiny_cfg(vocab=64)
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    tx = train_step_mod.make_optimizer(lr=1e-2, freeze_vision=True)
    state = train_step_mod.make_train_state(params, tx)
    before = jax.tree.map(np.asarray, state.params["vision"])

    ids, lens, starts = _batch(cfg, 1)
    ids = ids % 64
    labels = np.where(np.arange(ids.shape[1])[None] < lens[:, None], ids, -100)
    batch = {
        "images": jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3)),
        "ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
        "image_starts": jnp.asarray(starts), "attn_lens": jnp.asarray(lens),
    }
    state, _ = train_step_mod.train_step(state, cfg, tx, batch)
    after = jax.tree.map(np.asarray, state.params["vision"])
    jax.tree.map(np.testing.assert_array_equal, before, after)


def test_zero1_opt_state_sharding_matches_replicated():
    """Training with ZeRO-1-sharded optimizer state must produce identical
    params to the replicated run."""
    cfg = tiny_cfg(vocab=64)
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    tx = train_step_mod.make_optimizer(lr=1e-3)

    ids, lens, starts = _batch(cfg, 2)
    ids = ids % 64
    labels = np.where(np.arange(ids.shape[1])[None] < lens[:, None], ids, -100)
    batch = {
        "images": jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3)),
        "ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
        "image_starts": jnp.asarray(starts), "attn_lens": jnp.asarray(lens),
    }

    state_a = train_step_mod.make_train_state(params, tx)
    state_a, loss_a = train_step_mod.train_step(state_a, cfg, tx, batch)

    # train_step donates its input state; rebuild params for run B
    params_b = vlm.init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=8, tp=1)
    state_b = train_step_mod.make_train_state(params_b, tx)
    state_b = state_b._replace(
        opt_state=sharding.shard_opt_state_zero1(state_b.opt_state, mesh))
    state_b, loss_b = train_step_mod.train_step(state_b, cfg, tx, batch)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    # sharded update reassociates float math; tolerance reflects that
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        state_a.params, state_b.params)


def test_engine_bucketing_and_stop_strings():
    from fastvlm_tpu.engine import build_engine

    engine = build_engine(random_tiny=True)
    # short and long prompts land in different buckets but both work
    t1, s1 = engine.chat("hi", max_new_tokens=3)
    t2, s2 = engine.chat("hi " * 40, max_new_tokens=3)
    assert s2["prompt_tokens"] > s1["prompt_tokens"]
    # stop string truncates the stream
    text, _ = engine.generate(engine.build_prompt("hello"),
                              max_new_tokens=8, stop_strings=["\n"])
    assert "\n" not in text


def test_fsdp_sharded_training_matches_replicated():
    """FSDP-style fully-sharded params: same loss/params as replicated."""
    cfg = tiny_cfg(vocab=64)
    tx = train_step_mod.make_optimizer(lr=1e-3)

    ids, lens, starts = _batch(cfg, 2)
    ids = ids % 64
    labels = np.where(np.arange(ids.shape[1])[None] < lens[:, None], ids, -100)
    batch = {
        "images": jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3)),
        "ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
        "image_starts": jnp.asarray(starts), "attn_lens": jnp.asarray(lens),
    }

    params_a = vlm.init(jax.random.PRNGKey(0), cfg)
    state_a = train_step_mod.make_train_state(params_a, tx)
    state_a, loss_a = train_step_mod.train_step(state_a, cfg, tx, batch)

    mesh = make_mesh(dp=8, tp=1)
    params_b = sharding.shard_vlm_fsdp(
        vlm.init(jax.random.PRNGKey(0), cfg), mesh, min_size=64)
    state_b = train_step_mod.make_train_state(params_b, tx)
    state_b, loss_b = train_step_mod.train_step(state_b, cfg, tx, batch)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    # atol 5e-5: the sharded all-reduce sums grads in a different order
    # than the replicated step, and a near-zero adam denominator amplifies
    # a 1-ulp grad difference (observed: 1/16384 elements at 1.3e-5 abs)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5),
        state_a.params, state_b.params)


def test_freeze_projector_actually_freezes():
    """Regression: freeze_projector (and explicit 0.0 LRs) must not fall
    back to the base learning rate."""
    cfg = tiny_cfg(vocab=64)
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    tx = train_step_mod.make_optimizer(lr=1e-2, freeze_projector=True,
                                       freeze_vision=True)
    state = train_step_mod.make_train_state(params, tx)
    before = jax.tree.map(np.asarray, state.params["projector"])

    ids, lens, starts = _batch(cfg, 1)
    ids = ids % 64
    labels = np.where(np.arange(ids.shape[1])[None] < lens[:, None], ids, -100)
    batch = {
        "images": jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3)),
        "ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
        "image_starts": jnp.asarray(starts), "attn_lens": jnp.asarray(lens),
    }
    state, _ = train_step_mod.train_step(state, cfg, tx, batch)
    after = jax.tree.map(np.asarray, state.params["projector"])
    jax.tree.map(np.testing.assert_array_equal, before, after)


def test_optimizer_handles_image_newline_param():
    """Params with the top-level image_newline leaf (unpad merges) must
    label/init/shard cleanly."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg(vocab=64),
                              mm_patch_merge_type="spatial_unpad")
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    assert "image_newline" in params
    tx = train_step_mod.make_optimizer(lr=1e-3)
    tx.init(params)  # labeler must route the extra key
    mesh = make_mesh(dp=2, tp=4)
    sharded = sharding.shard_vlm(params, cfg, mesh)  # specs must cover it
    assert "image_newline" in sharded


def test_train_step_sequence_parallel_matches_unsharded():
    """Sequence-parallel activations (T over the model axis) must produce
    the SAME parameters after one step as the plain single-device step —
    SP only changes the collective layout, never the math."""
    from fastvlm_tpu.parallel.mesh import seq_sharding

    cfg = tiny_cfg(vocab=64)
    params0 = vlm.init(jax.random.PRNGKey(0), cfg)
    ids, lens, starts = _batch(cfg, 2)
    ids = ids % 64
    labels = np.where(np.arange(ids.shape[1])[None] < lens[:, None], ids, -100)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3))

    def run(sharded: bool):
        params = jax.tree.map(jnp.copy, params0)
        batch = {
            "ids": jnp.asarray(ids),
            "labels": jnp.asarray(labels),
            "image_starts": jnp.asarray(starts),
            "attn_lens": jnp.asarray(lens),
        }
        tx = train_step_mod.make_optimizer(lr=1e-3)
        if sharded:
            mesh = make_mesh(dp=2, tp=4)
            params = sharding.shard_vlm(params, cfg, mesh)
            batch["images"] = jax.device_put(images, data_sharding(mesh))
            sp = seq_sharding(mesh)
        else:
            batch["images"] = images
            sp = None
        state = train_step_mod.make_train_state(params, tx)
        state, loss = train_step_mod.train_step(state, cfg, tx, batch,
                                                seq_sharding=sp)
        return jax.device_get(state.params), float(loss)

    p_ref, l_ref = run(False)
    p_sp, l_sp = run(True)
    assert abs(l_ref - l_sp) < 1e-5, (l_ref, l_sp)
    for (k, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_ref)[0],
            jax.tree_util.tree_flatten_with_path(p_sp)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, err_msg=str(k))
