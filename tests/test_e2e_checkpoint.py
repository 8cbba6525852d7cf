"""End-to-end checkpoint path: synthesize a llava_qwen2-style HF checkpoint
dir (config.json + model.safetensors with the reference's exact key names),
load it with load_vlm, and generate. This is the exact path released
FastVLM checkpoints take."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvlm_tpu.config import FastViTConfig, load_vlm_config
from fastvlm_tpu.utils import checkpoint as ckpt

from tests.test_checkpoint import _make_vision_sd, tiny_cfg as tiny_vision_cfg


HF_CONFIG = {
    "model_type": "llava_qwen2",
    "vocab_size": 258,
    "hidden_size": 64,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "intermediate_size": 128,
    "rope_theta": 1000000.0,
    "rms_norm_eps": 1e-6,
    "tie_word_embeddings": True,
    "max_position_embeddings": 32768,
    "mm_vision_tower": "mobileclip_l_128",
    "mm_projector_type": "mlp2x_gelu",
    "mm_hidden_size": 256,
    "image_aspect_ratio": "pad",
    "mm_patch_merge_type": "flat",
}


def _make_decoder_sd(rng, cfg_dict):
    d, v = cfg_dict["hidden_size"], cfg_dict["vocab_size"]
    hd = cfg_dict["head_dim"]
    nh, nkv = cfg_dict["num_attention_heads"], cfg_dict["num_key_value_heads"]
    inter = cfg_dict["intermediate_size"]
    sd = {"model.embed_tokens.weight": rng.randn(v, d).astype(np.float32) * 0.02,
          "model.norm.weight": np.ones(d, np.float32)}
    for i in range(cfg_dict["num_hidden_layers"]):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(d, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(d, np.float32)
        for n, rows in [("q", nh * hd), ("k", nkv * hd), ("v", nkv * hd)]:
            sd[p + f"self_attn.{n}_proj.weight"] = \
                rng.randn(rows, d).astype(np.float32) * 0.05
            sd[p + f"self_attn.{n}_proj.bias"] = \
                rng.randn(rows).astype(np.float32) * 0.01
        sd[p + "self_attn.o_proj.weight"] = \
            rng.randn(d, nh * hd).astype(np.float32) * 0.05
        sd[p + "mlp.gate_proj.weight"] = rng.randn(inter, d).astype(np.float32) * 0.05
        sd[p + "mlp.up_proj.weight"] = rng.randn(inter, d).astype(np.float32) * 0.05
        sd[p + "mlp.down_proj.weight"] = rng.randn(d, inter).astype(np.float32) * 0.05
    return sd


@pytest.fixture
def checkpoint_dir(tmp_path):
    from safetensors.numpy import save_file

    rng = np.random.RandomState(7)
    vision_cfg = FastViTConfig(layers=(1, 2, 1, 1, 1),
                               embed_dims=(8, 16, 32, 64, 128),
                               image_size=128, attn_head_dim=16)
    sd = _make_vision_sd(vision_cfg, rng)
    sd.update(_make_decoder_sd(rng, HF_CONFIG))
    # projector 256 -> 64 (mlp2x_gelu => Sequential indices 0 and 2)
    sd["model.mm_projector.0.weight"] = rng.randn(64, 256).astype(np.float32) * 0.05
    sd["model.mm_projector.0.bias"] = np.zeros(64, np.float32)
    sd["model.mm_projector.2.weight"] = rng.randn(64, 64).astype(np.float32) * 0.05
    sd["model.mm_projector.2.bias"] = np.zeros(64, np.float32)

    d = tmp_path / "llava-fastvithd_tiny_stage3"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(HF_CONFIG))
    save_file(sd, str(d / "model.safetensors"))
    return str(d), vision_cfg


def test_config_ingestion(checkpoint_dir):
    path, vision_cfg = checkpoint_dir
    cfg = load_vlm_config(path)
    assert cfg.decoder.hidden_size == 64
    assert cfg.decoder.num_kv_heads == 2
    assert cfg.vision.image_size == 128  # parsed from mobileclip_l_128
    assert cfg.projector.mm_hidden_size == 256
    assert cfg.image_aspect_ratio == "pad"


def test_load_and_generate(checkpoint_dir):
    path, vision_cfg = checkpoint_dir
    # the default FastViTConfig has the full 44-block stack; our synthetic
    # checkpoint is tiny, so override the vision config to match
    import dataclasses

    cfg = load_vlm_config(path)
    cfg = dataclasses.replace(cfg, vision=vision_cfg)

    sd = ckpt.load_state_dict(path)
    params = ckpt.convert_vlm(sd, cfg)

    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.ops.splice import expand_image_ids, pad_batch

    row, start = expand_image_ids([5, -200, 9], cfg.num_image_tokens)
    ids, lens, starts = pad_batch([row], [start], 16)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 128, 128, 3))
    res = vlm.generate(params, cfg, images, jnp.asarray(ids),
                       jnp.asarray(lens), jnp.asarray(starts),
                       jax.random.PRNGKey(1), max_new_tokens=4,
                       eos_ids=(257,))
    assert np.asarray(res.tokens).shape == (1, 4)
    assert int(res.num_generated[0]) >= 1


def test_predict_cli_with_checkpoint(checkpoint_dir, tmp_path, capsys):
    """Run the predict CLI main() against the synthetic checkpoint dir with a
    ByteTokenizer stub exposed as an AutoTokenizer (no tokenizer files in the
    synthetic dir, so we monkeypatch)."""
    path, vision_cfg = checkpoint_dir
    import dataclasses

    from PIL import Image

    import fastvlm_tpu.predict as predict_cli
    import fastvlm_tpu.utils.checkpoint as ckpt_mod
    from fastvlm_tpu.data.preprocessing import ByteTokenizer

    img = tmp_path / "img.jpg"
    Image.new("RGB", (200, 150), (90, 10, 240)).save(img)

    # patch: tokenizer + vision-config override for the tiny checkpoint
    import unittest.mock as mock

    def load_small(p, dtype=None):
        c = load_vlm_config(p)
        c = dataclasses.replace(c, vision=vision_cfg)
        sd = ckpt_mod.load_state_dict(p)
        return c, ckpt_mod.convert_vlm(sd, c, dtype)

    tok = ByteTokenizer()
    tok.convert_tokens_to_ids = lambda s: None

    with mock.patch("fastvlm_tpu.utils.checkpoint.load_vlm",
                    side_effect=lambda p, dtype: load_small(p, dtype)), \
         mock.patch("transformers.AutoTokenizer") as auto:
        auto.from_pretrained.return_value = tok
        rc = predict_cli.main([
            "--model-path", path, "--image-file", str(img),
            "--prompt", "Describe.", "--temperature", "0",
            "--max-new-tokens", "4", "--dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out is not None  # produced some caption bytes (random weights)
