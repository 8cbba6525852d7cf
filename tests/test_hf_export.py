"""HF-format export (utils/hf_export.py): reference-keyed state dicts that
round-trip through our own importer bit-exactly (VERDICT r1 #7 —
load(HF) -> save(HF) -> load(HF) identical params)."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvlm_tpu.config import (
    FastViTConfig,
    FastVLMConfig,
    ProjectorConfig,
    Qwen2Config,
)
from fastvlm_tpu.models import qwen2, vlm
from fastvlm_tpu.utils import checkpoint as ckpt
from fastvlm_tpu.utils.hf_export import (
    export_hf,
    export_state_dict,
    vlm_config_to_hf_dict,
)

VIS = FastViTConfig(layers=(1, 2, 1, 1, 1), embed_dims=(8, 16, 32, 64, 128),
                    image_size=128, attn_head_dim=16)
DEC = Qwen2Config(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                  num_kv_heads=2, head_dim=8, intermediate_size=64,
                  tie_word_embeddings=False)


def full_cfg(**kw):
    base = dict(
        vision=VIS,
        projector=ProjectorConfig(mm_hidden_size=VIS.out_channels,
                                  hidden_size=DEC.hidden_size),
        decoder=DEC,
        image_aspect_ratio="anyres",
        image_grid_pinpoints=((128, 256), (256, 128)),
        mm_patch_merge_type="spatial_unpad",  # exercises image_newline
    )
    base.update(kw)
    return FastVLMConfig(**base)


def test_roundtrip_bit_exact(tmp_path):
    cfg = full_cfg()
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    out = export_hf(params, cfg, str(tmp_path / "ckpt"))

    sd = ckpt.load_state_dict(out)
    params2 = ckpt.convert_vlm(sd, cfg, jnp.float32)

    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(params2)[0]
    assert [k for k, _ in flat1] == [k for k, _ in flat2]
    for (k, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(k))

    # save(HF) -> load(HF) -> save(HF): byte-stable state dicts
    sd2 = export_state_dict(params2, cfg)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd2[k], np.asarray(sd[k], np.float32),
                                      err_msg=k)


def test_config_json_roundtrip(tmp_path):
    from fastvlm_tpu.config import vlm_config_from_hf_dict

    cfg = full_cfg()
    d = vlm_config_to_hf_dict(cfg)
    assert d["model_type"] == "llava_qwen2"
    cfg2 = vlm_config_from_hf_dict(json.loads(json.dumps(d)))
    assert cfg2.decoder == cfg.decoder
    assert cfg2.projector == cfg.projector
    assert cfg2.vision.image_size == cfg.vision.image_size
    assert cfg2.image_grid_pinpoints == cfg.image_grid_pinpoints
    assert cfg2.mm_patch_merge_type == cfg.mm_patch_merge_type


def test_vision_keys_match_reference_module_tree():
    """Exported vision keys must be exactly the reference's module tree —
    pinned against the synthetic reference-layout builder used by the
    import-parity tests (tests/test_checkpoint.py)."""
    from test_checkpoint import _make_vision_sd, tiny_cfg

    vcfg = tiny_cfg()
    ref_sd = _make_vision_sd(vcfg, np.random.RandomState(0))
    cfg = full_cfg(vision=vcfg,
                   projector=ProjectorConfig(mm_hidden_size=vcfg.out_channels,
                                             hidden_size=DEC.hidden_size),
                   image_aspect_ratio="pad", image_grid_pinpoints=None,
                   mm_patch_merge_type="flat")
    params = vlm.init(jax.random.PRNGKey(1), cfg)
    sd = export_state_dict(params, cfg)
    got = {k for k in sd if k.startswith(ckpt.VISION_PREFIX)}
    want = set(ref_sd)
    # the synthetic builder writes folded ffn convs (conv.conv + conv.bn)
    assert got == want, (sorted(got ^ want))


def test_fused_decoder_exports_like_unfused():
    params = qwen2.init(jax.random.PRNGKey(2), DEC)
    fused = qwen2.fuse_decoder_params(params, DEC)
    sd_a, sd_b = {}, {}
    from fastvlm_tpu.utils.hf_export import export_decoder

    export_decoder(params, DEC, sd_a)
    export_decoder(fused, DEC, sd_b)
    assert set(sd_a) == set(sd_b)
    for k in sd_a:
        np.testing.assert_array_equal(sd_a[k], sd_b[k], err_msg=k)


def test_rejects_quantized_and_lora():
    from fastvlm_tpu.ops.quant import quantize_decoder
    from fastvlm_tpu.utils.hf_export import export_decoder

    params = qwen2.init(jax.random.PRNGKey(3), DEC)
    qparams = quantize_decoder(params, 8)
    with pytest.raises(ValueError, match="quantized"):
        export_decoder(qparams, DEC, {})

    lparams = jax.tree_util.tree_map(lambda x: x, params)
    layers = dict(lparams["layers"])
    layers["q"] = dict(layers["q"],
                       lora_a=jnp.zeros((DEC.num_layers, DEC.hidden_size, 2)),
                       lora_b=jnp.zeros((DEC.num_layers, 2, DEC.q_dim)),
                       lora_scale=jnp.ones((DEC.num_layers,)))
    lparams["layers"] = layers
    with pytest.raises(ValueError, match="LoRA"):
        export_decoder(lparams, DEC, {})


def test_mpt_vlm_roundtrip_bit_exact(tmp_path):
    """llava_mpt layout (transformer.* keys): export -> load_vlm-style
    convert -> identical params, and the emitted config.json round-trips
    back into an MPT-family decoder config."""
    from fastvlm_tpu.config import mpt_7b, vlm_config_from_hf_dict

    dec = mpt_7b(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                 num_kv_heads=4, head_dim=8, intermediate_size=128,
                 tie_word_embeddings=False)
    cfg = full_cfg(decoder=dec,
                   projector=ProjectorConfig(mm_hidden_size=VIS.out_channels,
                                             hidden_size=dec.hidden_size))
    params = vlm.init(jax.random.PRNGKey(5), cfg)
    out = export_hf(params, cfg, str(tmp_path / "mpt"))

    d = json.load(open(os.path.join(out, "config.json")))
    assert d["model_type"] == "llava_mpt"
    cfg2 = vlm_config_from_hf_dict(d)
    assert cfg2.decoder.norm_type == "layernorm"
    assert cfg2.decoder.mlp_type == "gelu"
    assert cfg2.decoder.pos_emb == "alibi"
    assert cfg2.decoder.hidden_size == 32

    sd = ckpt.load_state_dict(out)
    assert any(k.startswith("transformer.blocks.") for k in sd)
    params2 = ckpt.convert_vlm(sd, cfg, jnp.float32)
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(params2)[0]
    assert [k for k, _ in flat1] == [k for k, _ in flat2]
    for (k, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(k))

    audit = ckpt.audit_key_map(sd, cfg)
    assert audit["unused_keys"] == []


def test_mpt_qkv_bias_roundtrip(tmp_path):
    """no_bias=False MPT family: Wqkv.bias must survive export -> import
    (review r2: biases were silently dropped)."""
    from fastvlm_tpu.config import mpt_7b

    dec = mpt_7b(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                 num_kv_heads=4, head_dim=8, intermediate_size=128,
                 tie_word_embeddings=True, qkv_bias=True)
    params = qwen2.init(jax.random.PRNGKey(7), dec)
    # give the biases non-zero values so a drop is detectable
    layers = dict(params["layers"])
    for n in ("q", "k", "v"):
        layers[n] = dict(layers[n],
                         b=jax.random.normal(jax.random.PRNGKey(8),
                                             layers[n]["b"].shape))
    params["layers"] = layers

    from fastvlm_tpu.utils.hf_export import export_decoder_mpt

    sd = {}
    export_decoder_mpt(params, dec, sd)
    assert "transformer.blocks.0.attn.Wqkv.bias" in sd
    params2 = ckpt.convert_decoder_mpt(sd, dec)
    for n in ("q", "k", "v"):
        np.testing.assert_array_equal(
            np.asarray(params["layers"][n]["b"]),
            np.asarray(params2["layers"][n]["b"]), err_msg=n)


def test_mpt_untied_missing_lm_head_raises():
    from fastvlm_tpu.config import mpt_7b

    dec = mpt_7b(vocab_size=64, hidden_size=32, num_layers=1, num_heads=4,
                 num_kv_heads=4, head_dim=8, intermediate_size=128,
                 tie_word_embeddings=False)
    tied = dataclasses.replace(dec, tie_word_embeddings=True)
    params = qwen2.init(jax.random.PRNGKey(9), tied)
    from fastvlm_tpu.utils.hf_export import export_decoder_mpt

    sd = {}
    export_decoder_mpt(params, tied, sd)  # no lm_head written (tied)
    with pytest.raises(KeyError, match="lm_head"):
        ckpt.convert_decoder_mpt(sd, dec)
