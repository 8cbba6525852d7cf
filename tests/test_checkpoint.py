"""Checkpoint converter parity: build a random state dict with the reference's
exact key names (LlavaQwen2 layout), evaluate it with an independent torch
functional forward implementing the reference semantics (live eval-mode BN,
NCHW), and require our converted JAX encoder to match to <1e-4 in fp32.

This is the encoder-parity harness of SURVEY.md §4 item 2, with random weights
standing in for the released checkpoints (no network access in CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fastvlm_tpu.config import FastViTConfig, FastVLMConfig, ProjectorConfig, Qwen2Config
from fastvlm_tpu.models import fastvit, projector
from fastvlm_tpu.utils import checkpoint as ckpt

V = ckpt.VISION_PREFIX


def tiny_cfg():
    return FastViTConfig(
        layers=(1, 2, 1, 1, 1), embed_dims=(8, 16, 32, 64, 128),
        image_size=128, attn_head_dim=16,
    )


def _make_vision_sd(cfg: FastViTConfig, rng) -> dict:
    """Random state dict with the reference's key names/shapes (inference mode)."""
    sd = {}

    def conv(name, cout, cin_g, k):
        sd[name + ".weight"] = rng.randn(cout, cin_g, k, k).astype(np.float32) * 0.1
        sd[name + ".bias"] = rng.randn(cout).astype(np.float32) * 0.1

    def bn(name, c):
        sd[name + ".weight"] = (1 + 0.1 * rng.randn(c)).astype(np.float32)
        sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = np.abs(1 + 0.1 * rng.randn(c)).astype(np.float32)

    def lin(name, cout, cin, bias=True):
        sd[name + ".weight"] = rng.randn(cout, cin).astype(np.float32) * 0.05
        if bias:
            sd[name + ".bias"] = rng.randn(cout).astype(np.float32) * 0.05

    def vec(name, c, scale=0.1):
        sd[name] = rng.randn(c, 1, 1).astype(np.float32) * scale

    c0 = cfg.embed_dims[0]
    conv(V + "patch_embed.0.reparam_conv", c0, 3, 3)
    conv(V + "patch_embed.1.reparam_conv", c0, 1, 3)
    conv(V + "patch_embed.2.reparam_conv", c0, c0, 1)

    def ffn(base, c):
        conv(base + ".conv.conv", c, 1, 7)
        del sd[base + ".conv.conv.bias"]  # conv has bias=False before BN
        bn(base + ".conv.bn", c)
        conv(base + ".fc1", 4 * c, c, 1)
        conv(base + ".fc2", c, 4 * c, 1)

    net = 0
    for i, n_blocks in enumerate(cfg.layers):
        c = cfg.embed_dims[i]
        if cfg.pos_embs[i]:
            conv(V + f"network.{net}.reparam_conv", c, 1, 7)
            net += 1
        for b in range(n_blocks):
            base = V + f"network.{net}.{b}"
            if cfg.token_mixers[i] == "repmixer":
                conv(base + ".token_mixer.reparam_conv", c, 1, 3)
                ffn(base + ".convffn", c)
                vec(base + ".layer_scale", c)
            else:
                sd[base + ".norm.weight"] = rng.randn(c).astype(np.float32)
                sd[base + ".norm.bias"] = rng.randn(c).astype(np.float32) * 0.1
                lin(base + ".token_mixer.qkv", 3 * c, c, bias=False)
                lin(base + ".token_mixer.proj", c, c)
                ffn(base + ".convffn", c)
                vec(base + ".layer_scale_1", c)
                vec(base + ".layer_scale_2", c)
        net += 1
        if i + 1 < len(cfg.layers):
            cn = cfg.embed_dims[i + 1]
            conv(V + f"network.{net}.proj.0.lkb_reparam", cn, 1, 7)
            conv(V + f"network.{net}.proj.1.reparam_conv", cn, cn, 1)
            net += 1

    cexp = int(cfg.embed_dims[-1] * cfg.cls_ratio)
    conv(V + "conv_exp.reparam_conv", cexp, 1, 3)
    rd = int(cexp * cfg.se_rd_ratio)
    conv(V + "conv_exp.se.reduce", rd, cexp, 1)
    conv(V + "conv_exp.se.expand", cexp, rd, 1)
    return sd


def _torch_forward(sd, cfg: FastViTConfig, x_nchw):
    """Independent torch eval of the reference inference graph from the sd."""
    t = lambda n: torch.from_numpy(sd[n]).double()  # noqa: E731

    def conv(x, name, stride=1, groups=1):
        w = t(name + ".weight")
        k = w.shape[-1]
        b = t(name + ".bias") if name + ".bias" in sd else None
        return F.conv2d(x, w, b, stride=stride, padding=k // 2, groups=groups)

    def gelu(x):
        return F.gelu(x, approximate="none")

    def ffn(x, base, c):
        y = conv(x, base + ".conv.conv", groups=c)
        y = F.batch_norm(
            y, t(base + ".conv.bn.running_mean"), t(base + ".conv.bn.running_var"),
            t(base + ".conv.bn.weight"), t(base + ".conv.bn.bias"),
            training=False, eps=1e-5)
        y = conv(y, base + ".fc1")
        y = gelu(y)
        return conv(y, base + ".fc2")

    c0 = cfg.embed_dims[0]
    x = gelu(conv(x_nchw, V + "patch_embed.0.reparam_conv", stride=2))
    x = gelu(conv(x, V + "patch_embed.1.reparam_conv", stride=2, groups=c0))
    x = gelu(conv(x, V + "patch_embed.2.reparam_conv"))

    net = 0
    for i, n_blocks in enumerate(cfg.layers):
        c = cfg.embed_dims[i]
        if cfg.pos_embs[i]:
            x = conv(x, V + f"network.{net}.reparam_conv", groups=c)
            net += 1
        for bidx in range(n_blocks):
            base = V + f"network.{net}.{bidx}"
            if cfg.token_mixers[i] == "repmixer":
                x = conv(x, base + ".token_mixer.reparam_conv", groups=c)
                ls = t(base + ".layer_scale")[None]
                x = x + ls * ffn(x, base + ".convffn", c)
            else:
                u = x.mean(1, keepdim=True)
                s = (x - u).pow(2).mean(1, keepdim=True)
                nrm = (x - u) / torch.sqrt(s + cfg.ln_eps)
                nrm = t(base + ".norm.weight")[None, :, None, None] * nrm \
                    + t(base + ".norm.bias")[None, :, None, None]
                bsz, _, h, w = nrm.shape
                n = h * w
                hd = cfg.attn_head_dim
                tok = nrm.flatten(2).transpose(-2, -1)
                qkv = tok @ t(base + ".token_mixer.qkv.weight").T
                qkv = qkv.reshape(bsz, n, 3, c // hd, hd).permute(2, 0, 3, 1, 4)
                q, k_, v_ = qkv[0], qkv[1], qkv[2]
                attn = ((q * hd ** -0.5) @ k_.transpose(-2, -1)).softmax(-1)
                o = (attn @ v_).transpose(1, 2).reshape(bsz, n, c)
                o = o @ t(base + ".token_mixer.proj.weight").T \
                    + t(base + ".token_mixer.proj.bias")
                o = o.transpose(-2, -1).reshape(bsz, c, h, w)
                x = x + t(base + ".layer_scale_1")[None] * o
                x = x + t(base + ".layer_scale_2")[None] * ffn(x, base + ".convffn", c)
        net += 1
        if i + 1 < len(cfg.layers):
            cn = cfg.embed_dims[i + 1]
            x = gelu(conv(x, V + f"network.{net}.proj.0.lkb_reparam", stride=2, groups=c))
            x = gelu(conv(x, V + f"network.{net}.proj.1.reparam_conv"))
            net += 1

    cl = cfg.embed_dims[-1]
    y = conv(x, V + "conv_exp.reparam_conv", groups=cl)
    pooled = y.mean((2, 3), keepdim=True)
    z = F.relu(conv(pooled, V + "conv_exp.se.reduce"))
    z = torch.sigmoid(conv(z, V + "conv_exp.se.expand"))
    y = gelu(y * z)
    b_, c_, h_, w_ = y.shape
    return y.flatten(2).transpose(-2, -1).numpy()  # (B, N, C)


def test_vision_converter_full_parity():
    cfg = tiny_cfg()
    rng = np.random.RandomState(42)
    sd = _make_vision_sd(cfg, rng)

    x = rng.randn(2, 3, cfg.image_size, cfg.image_size).astype(np.float32) * 0.5
    want = _torch_forward(sd, cfg, torch.from_numpy(x).double())

    params = ckpt.convert_vision(sd, cfg)
    got = np.asarray(fastvit.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), cfg))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_projector_converter():
    rng = np.random.RandomState(0)
    pcfg = ProjectorConfig(mm_hidden_size=16, hidden_size=8)
    sd = {
        "model.mm_projector.0.weight": rng.randn(8, 16).astype(np.float32),
        "model.mm_projector.0.bias": rng.randn(8).astype(np.float32),
        "model.mm_projector.2.weight": rng.randn(8, 8).astype(np.float32),
        "model.mm_projector.2.bias": rng.randn(8).astype(np.float32),
    }
    params = ckpt.convert_projector(sd, pcfg)
    x = rng.randn(2, 4, 16).astype(np.float32)
    got = np.asarray(projector.apply(params, jnp.asarray(x), pcfg))

    xt = torch.from_numpy(x)
    y = xt @ torch.from_numpy(sd["model.mm_projector.0.weight"]).T \
        + torch.from_numpy(sd["model.mm_projector.0.bias"])
    y = F.gelu(y, approximate="none")
    y = y @ torch.from_numpy(sd["model.mm_projector.2.weight"]).T \
        + torch.from_numpy(sd["model.mm_projector.2.bias"])
    np.testing.assert_allclose(got, y.numpy(), rtol=1e-5, atol=1e-5)


def test_decoder_converter_matches_hf():
    from transformers import Qwen2Config as HFCfg
    from transformers.models.qwen2 import Qwen2ForCausalLM

    cfg = Qwen2Config(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=8, intermediate_size=64,
                      tie_word_embeddings=True)
    torch.manual_seed(1)
    hf = Qwen2ForCausalLM(HFCfg(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, tie_word_embeddings=True,
        rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_eps))
    hf.eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = ckpt.convert_decoder(sd, cfg)

    from fastvlm_tpu.models import qwen2 as q
    ids = np.array([[3, 9, 27, 5]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    hidden, _ = q.forward(params, cfg, q.embed(params, jnp.asarray(ids)),
                          jnp.arange(4)[None])
    got = np.asarray(q.logits_from_hidden(params, hidden, cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
