"""CLIP ViT tower parity vs HF CLIPVisionModel (tiny random config)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fastvlm_tpu.models import clip_vit


def tiny_cfg(**kw):
    base = dict(image_size=28, patch_size=14, hidden_size=32, num_layers=3,
                num_heads=4, intermediate_size=64)
    base.update(kw)
    return clip_vit.CLIPViTConfig(**base)


def _hf_model(cfg):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size, hidden_act="quick_gelu",
        layer_norm_eps=cfg.ln_eps)
    torch.manual_seed(0)
    m = CLIPVisionModel(hf_cfg)
    m.eval()
    return m


def test_hidden_states_match_hf_penultimate():
    cfg = tiny_cfg(select_layer=-2, select_feature="patch")
    hf = _hf_model(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = clip_vit.convert_from_hf(sd, cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                 output_hidden_states=True)
    want = out.hidden_states[-2].numpy()[:, 1:]  # penultimate, drop CLS

    got = np.asarray(clip_vit.features(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_select_last_layer_and_cls_patch():
    cfg = tiny_cfg(select_layer=-1, select_feature="cls_patch")
    hf = _hf_model(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = clip_vit.convert_from_hf(sd, cfg)
    rng = np.random.RandomState(1)
    x = rng.randn(1, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                 output_hidden_states=True)
    want = out.hidden_states[-1].numpy()
    got = np.asarray(clip_vit.features(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_s2_multiscale_shapes():
    cfg = tiny_cfg(s2_scales=(28, 56))
    params = clip_vit.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    out = clip_vit.features_s2(params, x, cfg)
    assert out.shape == (2, cfg.num_patches, cfg.hidden_size * 2)
    assert cfg.out_hidden_size == cfg.hidden_size * 2
    # scale-1 channels must equal the plain single-scale features
    single = np.asarray(clip_vit.features(params, x, cfg))
    np.testing.assert_allclose(np.asarray(out[..., :cfg.hidden_size]),
                               single, rtol=1e-5, atol=1e-5)


def test_clip_tower_in_vlm_generate():
    """FastVLM with a CLIP ViT tower end-to-end (reference supports CLIP
    towers via build_vision_tower dispatch)."""
    import numpy as np

    from fastvlm_tpu.config import FastVLMConfig, ProjectorConfig, Qwen2Config
    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.ops.splice import expand_image_ids, pad_batch

    vision = tiny_cfg()  # 28px, patch 14 -> 4 tokens, hidden 32
    decoder = Qwen2Config(vocab_size=128, hidden_size=48, num_layers=2,
                          num_heads=4, num_kv_heads=2, head_dim=12,
                          intermediate_size=96)
    cfg = FastVLMConfig(
        vision=vision, decoder=decoder,
        projector=ProjectorConfig(mm_hidden_size=vision.out_hidden_size,
                                  hidden_size=48))
    assert cfg.num_image_tokens == 4
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    row, start = expand_image_ids([5, -200, 9], cfg.num_image_tokens)
    ids, lens, starts = pad_batch([row], [start], 16)
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 28, 28, 3))
    res = vlm.generate(params, cfg, images, jnp.asarray(ids),
                       jnp.asarray(lens), jnp.asarray(starts),
                       jax.random.PRNGKey(2), max_new_tokens=3,
                       eos_ids=(127,))
    assert np.asarray(res.tokens).shape == (1, 3)
