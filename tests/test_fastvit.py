"""FastViTHD encoder tests: block parity vs independent torch math, shape
contract, and token ordering (SURVEY.md §4 items 1-2)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fastvlm_tpu.config import FastViTConfig
from fastvlm_tpu.models import fastvit


def tiny_cfg(**kw):
    base = dict(
        layers=(1, 1, 1, 1, 1),
        embed_dims=(8, 16, 32, 64, 128),
        image_size=128,
        attn_head_dim=16,
    )
    base.update(kw)
    return FastViTConfig(**base)


def _np(x):
    return np.asarray(x)


def _t(x_nhwc):
    return torch.from_numpy(np.transpose(_np(x_nhwc), (0, 3, 1, 2))).double()


def _tw(w_hwio):
    return torch.from_numpy(np.transpose(_np(w_hwio), (3, 2, 0, 1))).double()


def _from_t(xt):
    return np.transpose(xt.numpy(), (0, 2, 3, 1))


def _torch_ffn(xt, p):
    """Independent torch evaluation of the inference ConvFFN."""
    c = xt.shape[1]
    y = F.conv2d(xt, _tw(p["dw"]["w"]), torch.from_numpy(_np(p["dw"]["b"])).double(),
                 padding=3, groups=c)
    y = F.conv2d(y, _tw(p["fc1"]["w"]), torch.from_numpy(_np(p["fc1"]["b"])).double())
    y = F.gelu(y, approximate="none")
    y = F.conv2d(y, _tw(p["fc2"]["w"]), torch.from_numpy(_np(p["fc2"]["b"])).double())
    return y


def test_repmixer_block_parity():
    cfg = tiny_cfg()
    c = 16
    key = jax.random.PRNGKey(0)
    p = fastvit._repmixer_block_init(key, c, cfg, jnp.float32)
    # use a non-trivial layer scale
    p["ls"] = jnp.asarray(np.random.RandomState(0).randn(c).astype(np.float32) * 0.1)
    x = np.random.RandomState(1).randn(1, 10, 10, c).astype(np.float32)

    got = _np(fastvit._repmixer_block(jnp.asarray(x), p, cfg))

    xt = _t(x)
    mixed = F.conv2d(xt, _tw(p["mixer"]["w"]),
                     torch.from_numpy(_np(p["mixer"]["b"])).double(),
                     padding=1, groups=c)
    ls = torch.from_numpy(_np(p["ls"])).double()[None, :, None, None]
    want = _from_t(mixed + ls * _torch_ffn(mixed, p["ffn"]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_attention_block_parity():
    cfg = tiny_cfg()
    c = 32  # 2 heads of 16
    p = fastvit._attention_block_init(jax.random.PRNGKey(2), c, cfg, jnp.float32)
    rng = np.random.RandomState(3)
    p["ls1"] = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    p["ls2"] = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    p["norm_scale"] = jnp.asarray(rng.randn(c).astype(np.float32))
    p["norm_bias"] = jnp.asarray(rng.randn(c).astype(np.float32))
    x = rng.randn(2, 6, 6, c).astype(np.float32)

    got = _np(fastvit._attention_block(jnp.asarray(x), p, cfg))

    # torch eval: LN over channel -> MHSA -> ls1 residual -> ConvFFN -> ls2
    xt = _t(x)
    u = xt.mean(1, keepdim=True)
    s = (xt - u).pow(2).mean(1, keepdim=True)
    normed = (xt - u) / torch.sqrt(s + cfg.ln_eps)
    normed = torch.from_numpy(_np(p["norm_scale"])).double()[None, :, None, None] * normed \
        + torch.from_numpy(_np(p["norm_bias"])).double()[None, :, None, None]

    b, _, h, w = normed.shape
    n = h * w
    tokens = normed.flatten(2).transpose(-2, -1)  # (B, N, C)
    qkv = tokens @ torch.from_numpy(_np(p["qkv"]["w"])).double()
    qkv = qkv.reshape(b, n, 3, c // 16, 16).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * 16 ** -0.5) @ k.transpose(-2, -1)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, n, c)
    out = out @ torch.from_numpy(_np(p["proj"]["w"])).double() \
        + torch.from_numpy(_np(p["proj"]["b"])).double()
    out = out.transpose(-2, -1).reshape(b, c, h, w)

    ls1 = torch.from_numpy(_np(p["ls1"])).double()[None, :, None, None]
    ls2 = torch.from_numpy(_np(p["ls2"])).double()[None, :, None, None]
    xt = xt + ls1 * out
    want = _from_t(xt + ls2 * _torch_ffn(xt, p["ffn"]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_encoder_shape_contract():
    """(B, H, W, 3) -> (B, (H/64)^2, 2*dims[-1]) — reference mobileclip_l.json:4-7."""
    cfg = tiny_cfg()
    params = fastvit.init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    out = fastvit.apply(params, x, cfg)
    g = cfg.image_size // 64
    assert cfg.total_stride == 64
    assert out.shape == (2, g * g, cfg.out_channels)


def test_encoder_jit_and_determinism():
    cfg = tiny_cfg()
    params = fastvit.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 3))
    f = jax.jit(lambda p, x: fastvit.apply(p, x, cfg))
    a = f(params, x)
    b = f(params, x)
    np.testing.assert_array_equal(_np(a), _np(b))


def test_token_order_row_major():
    """feature_select flattens NCHW row-major over (H, W)
    (reference mobileclip_encoder.py:60-68); NHWC reshape must agree."""
    cfg = tiny_cfg()
    params = fastvit.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 3))
    tokens = fastvit.apply(params, x, cfg)
    grid = fastvit.features_grid(params, x, cfg)
    g = cfg.image_size // 64
    np.testing.assert_array_equal(
        _np(tokens).reshape(1, g, g, -1), _np(grid)
    )


def test_pallas_ffn_backend_matches_xla():
    """Encoder with ffn_backend='pallas' (interpret on CPU) must match XLA."""
    import dataclasses

    cfg_x = tiny_cfg()
    cfg_p = dataclasses.replace(cfg_x, ffn_backend="pallas")
    params = fastvit.init(jax.random.PRNGKey(0), cfg_x)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 3)) * 0.5
    a = _np(fastvit.apply(params, x, cfg_x))
    b = _np(fastvit.apply(params, x, cfg_p))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fold_layer_scale_exact_and_removes_leaves():
    """fold_layer_scale must be numerically exact (ls ⊙ (Wh+b) ==
    (ls⊙W)h + ls⊙b) and strip every ls leaf from the runtime tree."""
    cfg = tiny_cfg(layers=(1, 2, 1, 1, 1))
    params = fastvit.init(jax.random.PRNGKey(0), cfg)
    # non-trivial layer scales so the fold is actually exercised
    for st in params["stages"]:
        for k in ("ls", "ls1", "ls2"):
            if k in st["blocks"]:
                st["blocks"][k] = st["blocks"][k] + jnp.linspace(
                    0.5, 2.0, st["blocks"][k].shape[-1])
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3))
    ref = fastvit.apply(params, x, cfg)
    folded = fastvit.fold_layer_scale(params)
    got = fastvit.apply(folded, x, cfg)
    np.testing.assert_allclose(_np(got), _np(ref), atol=1e-5)
    paths = ["/".join(str(p) for p in path) for path, _ in
             jax.tree_util.tree_leaves_with_path(folded)]
    assert not any("'ls'" in p or "ls1" in p or "ls2" in p for p in paths)
