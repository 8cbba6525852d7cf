"""Branch-fusion import (utils/reparam.py) vs an independent torch
evaluation of the train-time multi-branch forward.

The torch side below is written from the reparameterization spec
(mci.py:200-217 MobileOne forward, :444-452 RepLK forward, :808-817 RepMixer
forward, :986-992 RepCPE forward), not from the fused math — so agreement
checks the fusion algebra, not a tautology."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fastvlm_tpu.utils.reparam import fuse_reparam_branches, needs_fusion

RNG = np.random.RandomState(0)


def _bn_params(c, prefix, sd):
    sd[prefix + ".weight"] = RNG.randn(c).astype(np.float32) * 0.5 + 1.0
    sd[prefix + ".bias"] = RNG.randn(c).astype(np.float32) * 0.1
    sd[prefix + ".running_mean"] = RNG.randn(c).astype(np.float32) * 0.2
    sd[prefix + ".running_var"] = (RNG.rand(c).astype(np.float32) + 0.5)


def _conv_bn(sd, prefix, out_c, in_per_group, k):
    sd[prefix + ".conv.weight"] = RNG.randn(
        out_c, in_per_group, k, k).astype(np.float32) * 0.2
    _bn_params(out_c, prefix + ".bn", sd)


def _bn_eval(x, sd, prefix, eps=1e-5):
    return F.batch_norm(
        x,
        torch.tensor(sd[prefix + ".running_mean"]),
        torch.tensor(sd[prefix + ".running_var"]),
        torch.tensor(sd[prefix + ".weight"]),
        torch.tensor(sd[prefix + ".bias"]),
        training=False, eps=eps)


def _conv_bn_eval(x, sd, prefix, stride=1, padding=0, groups=1):
    y = F.conv2d(x, torch.tensor(sd[prefix + ".conv.weight"]),
                 stride=stride, padding=padding, groups=groups)
    return _bn_eval(y, sd, prefix + ".bn")


def _fused_eval(x, fused, prefix, key="reparam_conv", stride=1, padding=0,
                groups=1):
    return F.conv2d(x, torch.tensor(fused[prefix + f".{key}.weight"]),
                    torch.tensor(fused[prefix + f".{key}.bias"]),
                    stride=stride, padding=padding, groups=groups)


def test_mobileone_full_branches():
    """2 conv branches + scale + BN skip (in==out, stride 1, groups=1)."""
    c, k = 6, 3
    sd = {}
    _conv_bn(sd, "blk.rbr_conv.0", c, c, k)
    _conv_bn(sd, "blk.rbr_conv.1", c, c, k)
    _conv_bn(sd, "blk.rbr_scale", c, c, 1)
    _bn_params(c, "blk.rbr_skip", sd)

    assert needs_fusion(sd)
    fused = fuse_reparam_branches(sd)
    assert not needs_fusion(fused)
    assert set(fused) == {"blk.reparam_conv.weight", "blk.reparam_conv.bias"}

    x = torch.tensor(RNG.randn(2, c, 8, 8).astype(np.float32))
    want = (_conv_bn_eval(x, sd, "blk.rbr_conv.0", padding=k // 2)
            + _conv_bn_eval(x, sd, "blk.rbr_conv.1", padding=k // 2)
            + _conv_bn_eval(x, sd, "blk.rbr_scale", padding=0)
            + _bn_eval(x, sd, "blk.rbr_skip"))
    got = _fused_eval(x, fused, "blk", padding=k // 2)
    np.testing.assert_allclose(got.numpy(), want.numpy(), atol=1e-5)


def test_mobileone_depthwise_stride2_no_skip():
    """Depthwise stride-2 block (stem/downsampler shape): no BN skip."""
    c, k = 4, 3
    sd = {}
    _conv_bn(sd, "dw.rbr_conv.0", c, 1, k)
    _conv_bn(sd, "dw.rbr_scale", c, 1, 1)
    fused = fuse_reparam_branches(sd)

    x = torch.tensor(RNG.randn(1, c, 8, 8).astype(np.float32))
    want = (_conv_bn_eval(x, sd, "dw.rbr_conv.0", stride=2, padding=k // 2,
                          groups=c)
            + _conv_bn_eval(x, sd, "dw.rbr_scale", stride=2, groups=c))
    got = _fused_eval(x, fused, "dw", stride=2, padding=k // 2, groups=c)
    np.testing.assert_allclose(got.numpy(), want.numpy(), atol=1e-5)


def test_replk_small_kernel():
    c, k, sk = 4, 7, 3
    sd = {}
    _conv_bn(sd, "down.lkb_origin", c, 1, k)
    _conv_bn(sd, "down.small_conv", c, 1, sk)
    fused = fuse_reparam_branches(sd)
    assert "down.lkb_reparam.weight" in fused

    x = torch.tensor(RNG.randn(1, c, 16, 16).astype(np.float32))
    want = (_conv_bn_eval(x, sd, "down.lkb_origin", stride=2, padding=k // 2,
                          groups=c)
            + _conv_bn_eval(x, sd, "down.small_conv", stride=2,
                            padding=sk // 2, groups=c))
    got = _fused_eval(x, fused, "down", key="lkb_reparam", stride=2,
                      padding=k // 2, groups=c)
    np.testing.assert_allclose(got.numpy(), want.numpy(), atol=1e-5)


@pytest.mark.parametrize("with_ls", [True, False])
def test_repmixer(with_ls):
    """x + ls*(mixer(x) - norm(x)) with depthwise MobileOne mixer/norm."""
    c, k = 4, 3
    sd = {}
    p = "b.token_mixer"
    _conv_bn(sd, p + ".mixer.rbr_conv.0", c, 1, k)
    _conv_bn(sd, p + ".mixer.rbr_scale", c, 1, 1)
    _bn_params(c, p + ".mixer.rbr_skip", sd)
    _bn_params(c, p + ".norm.rbr_skip", sd)
    if with_ls:
        sd[p + ".layer_scale"] = (
            RNG.rand(c, 1, 1).astype(np.float32) * 1e-2)
    fused = fuse_reparam_branches(sd)
    assert set(fused) == {p + ".reparam_conv.weight", p + ".reparam_conv.bias"}

    x = torch.tensor(RNG.randn(2, c, 8, 8).astype(np.float32))
    mixer = (_conv_bn_eval(x, sd, p + ".mixer.rbr_conv.0", padding=k // 2,
                           groups=c)
             + _conv_bn_eval(x, sd, p + ".mixer.rbr_scale", groups=c)
             + _bn_eval(x, sd, p + ".mixer.rbr_skip"))
    norm = _bn_eval(x, sd, p + ".norm.rbr_skip")
    if with_ls:
        ls = torch.tensor(sd[p + ".layer_scale"])
        want = x + ls * (mixer - norm)
    else:
        want = x + mixer - norm
    got = _fused_eval(x, fused, p, padding=k // 2, groups=c)
    np.testing.assert_allclose(got.numpy(), want.numpy(), atol=1e-5)


def test_repcpe():
    c, k = 4, 7
    sd = {
        "net.0.pe.weight": RNG.randn(c, 1, k, k).astype(np.float32) * 0.1,
        "net.0.pe.bias": RNG.randn(c).astype(np.float32) * 0.1,
    }
    fused = fuse_reparam_branches(sd)
    x = torch.tensor(RNG.randn(1, c, 8, 8).astype(np.float32))
    want = x + F.conv2d(x, torch.tensor(sd["net.0.pe.weight"]),
                        torch.tensor(sd["net.0.pe.bias"]),
                        padding=k // 2, groups=c)
    got = _fused_eval(x, fused, "net.0", padding=k // 2, groups=c)
    np.testing.assert_allclose(got.numpy(), want.numpy(), atol=1e-5)


def test_fused_state_dict_passthrough_and_idempotence():
    sd = {"model.layers.0.self_attn.q_proj.weight":
          RNG.randn(4, 4).astype(np.float32),
          "vis.patch_embed.0.reparam_conv.weight":
          RNG.randn(4, 3, 3, 3).astype(np.float32)}
    assert not needs_fusion(sd)
    out = fuse_reparam_branches(sd)
    assert set(out) == set(sd)
    for key in sd:
        np.testing.assert_array_equal(out[key], sd[key])


def test_full_tower_import_from_train_mode_checkpoint():
    """A synthetic train-mode vision state dict converts through the normal
    import path and matches the fused-then-converted result numerically."""
    import jax.numpy as jnp

    from fastvlm_tpu.config import FastViTConfig
    from fastvlm_tpu.models import fastvit
    from fastvlm_tpu.utils.checkpoint import convert_vision

    cfg = FastViTConfig(layers=(1, 1, 1, 1, 1), embed_dims=(8, 16, 24, 32, 64),
                        image_size=256)
    sd = {}
    pfx = "model.vision_tower.vision_tower.model."

    # stem: 3 MobileOne blocks (3->8 s2, dw s2, pw)
    _conv_bn(sd, pfx + "patch_embed.0.rbr_conv.0", 8, 3, 3)
    _conv_bn(sd, pfx + "patch_embed.0.rbr_scale", 8, 3, 1)
    _conv_bn(sd, pfx + "patch_embed.1.rbr_conv.0", 8, 1, 3)
    _conv_bn(sd, pfx + "patch_embed.1.rbr_scale", 8, 1, 1)
    _conv_bn(sd, pfx + "patch_embed.2.rbr_conv.0", 8, 8, 1)
    _bn_params(8, pfx + "patch_embed.2.rbr_skip", sd)

    def repmixer_stage(net, dim):
        p = f"{pfx}network.{net}.0.token_mixer"
        _conv_bn(sd, p + ".mixer.rbr_conv.0", dim, 1, 3)
        _conv_bn(sd, p + ".mixer.rbr_scale", dim, 1, 1)
        _bn_params(dim, p + ".mixer.rbr_skip", sd)
        _bn_params(dim, p + ".norm.rbr_skip", sd)
        sd[p + ".layer_scale"] = RNG.rand(dim, 1, 1).astype(np.float32) * 1e-2
        base = f"{pfx}network.{net}.0"
        _conv_bn(sd, base + ".convffn.conv", dim, 1, 7)
        sd[base + ".convffn.fc1.weight"] = RNG.randn(
            dim * 4, dim, 1, 1).astype(np.float32) * 0.1
        sd[base + ".convffn.fc1.bias"] = RNG.randn(dim * 4).astype(np.float32)
        sd[base + ".convffn.fc2.weight"] = RNG.randn(
            dim, dim * 4, 1, 1).astype(np.float32) * 0.1
        sd[base + ".convffn.fc2.bias"] = RNG.randn(dim).astype(np.float32)
        sd[base + ".layer_scale"] = RNG.rand(dim, 1, 1).astype(np.float32) * 1e-2

    def attn_stage(net, dim):
        base = f"{pfx}network.{net}.0"
        sd[base + ".norm.weight"] = RNG.randn(dim).astype(np.float32) * 0.1 + 1
        sd[base + ".norm.bias"] = RNG.randn(dim).astype(np.float32) * 0.1
        sd[base + ".token_mixer.qkv.weight"] = RNG.randn(
            dim * 3, dim).astype(np.float32) * 0.1
        sd[base + ".token_mixer.proj.weight"] = RNG.randn(
            dim, dim).astype(np.float32) * 0.1
        sd[base + ".token_mixer.proj.bias"] = RNG.randn(dim).astype(np.float32)
        _conv_bn(sd, base + ".convffn.conv", dim, 1, 7)
        sd[base + ".convffn.fc1.weight"] = RNG.randn(
            dim * 4, dim, 1, 1).astype(np.float32) * 0.1
        sd[base + ".convffn.fc1.bias"] = RNG.randn(dim * 4).astype(np.float32)
        sd[base + ".convffn.fc2.weight"] = RNG.randn(
            dim, dim * 4, 1, 1).astype(np.float32) * 0.1
        sd[base + ".convffn.fc2.bias"] = RNG.randn(dim).astype(np.float32)
        sd[base + ".layer_scale_1"] = RNG.rand(dim, 1, 1).astype(np.float32) * 1e-2
        sd[base + ".layer_scale_2"] = RNG.rand(dim, 1, 1).astype(np.float32) * 1e-2

    def down(net, cin, cout):
        _conv_bn(sd, f"{pfx}network.{net}.proj.0.lkb_origin", cin, 1, 7)
        _conv_bn(sd, f"{pfx}network.{net}.proj.0.small_conv", cin, 1, 3)
        _conv_bn(sd, f"{pfx}network.{net}.proj.1.rbr_conv.0", cout, cin, 1)

    def cpe(net, dim):
        sd[f"{pfx}network.{net}.pe.weight"] = RNG.randn(
            dim, 1, 7, 7).astype(np.float32) * 0.1
        sd[f"{pfx}network.{net}.pe.bias"] = RNG.randn(dim).astype(np.float32)

    dims = cfg.embed_dims
    repmixer_stage(0, dims[0]); down(1, dims[0], dims[1])
    repmixer_stage(2, dims[1]); down(3, dims[1], dims[2])
    repmixer_stage(4, dims[2]); down(5, dims[2], dims[3])
    cpe(6, dims[3]); attn_stage(7, dims[3]); down(8, dims[3], dims[4])
    cpe(9, dims[4]); attn_stage(10, dims[4])

    # conv_exp: grouped 3x3 widening (groups=embed_dims[-1], mci.py:1401-1411)
    out_c = cfg.out_channels
    _conv_bn(sd, pfx + "conv_exp.rbr_conv.0", out_c, 1, 3)
    _conv_bn(sd, pfx + "conv_exp.rbr_scale", out_c, 1, 1)
    rd = max(1, int(out_c * cfg.se_rd_ratio))
    sd[pfx + "conv_exp.se.reduce.weight"] = RNG.randn(
        rd, out_c, 1, 1).astype(np.float32) * 0.1
    sd[pfx + "conv_exp.se.reduce.bias"] = RNG.randn(rd).astype(np.float32)
    sd[pfx + "conv_exp.se.expand.weight"] = RNG.randn(
        out_c, rd, 1, 1).astype(np.float32) * 0.1
    sd[pfx + "conv_exp.se.expand.bias"] = RNG.randn(out_c).astype(np.float32)

    # convert (fusion happens inside convert_vision) and run the tower
    params = convert_vision(sd, cfg, jnp.float32)
    x = jnp.asarray(RNG.rand(1, 256, 256, 3).astype(np.float32))
    feats = fastvit.apply(params, x, cfg)
    assert feats.shape[0] == 1 and np.all(np.isfinite(np.asarray(feats)))

    # and it matches converting an explicitly pre-fused dict
    pre = fuse_reparam_branches(sd)
    params2 = convert_vision(pre, cfg, jnp.float32)
    feats2 = fastvit.apply(params2, x, cfg)
    np.testing.assert_allclose(np.asarray(feats2), np.asarray(feats),
                               atol=1e-6)
