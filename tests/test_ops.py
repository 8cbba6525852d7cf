"""Golden tests for core ops vs independent torch math (SURVEY.md §4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fastvlm_tpu.ops.conv import conv2d, gelu, layer_norm, rms_norm, se_gate


def _np(x):
    return np.asarray(x)


def _torch_conv(x_nhwc, w_hwio, b, stride, padding, groups):
    xt = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))).double()
    wt = torch.from_numpy(np.transpose(w_hwio, (3, 2, 0, 1))).double()
    bt = torch.from_numpy(b).double() if b is not None else None
    out = F.conv2d(xt, wt, bt, stride=stride, padding=padding, groups=groups)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize(
    "cin,cout,k,stride,groups,hw",
    [
        (3, 8, 3, 2, 1, 16),      # stem conv
        (8, 8, 3, 2, 8, 16),      # depthwise stride-2
        (8, 8, 1, 1, 1, 8),       # pointwise
        (8, 16, 7, 2, 8, 14),     # RepLK downsampler (out = 2*in, dw groups)
        (8, 8, 7, 1, 8, 9),       # RepCPE / ConvFFN dw 7x7, odd size
        (8, 16, 3, 1, 8, 8),      # conv_exp-style widening dw
    ],
)
def test_conv2d_matches_torch(cin, cout, k, stride, groups, hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, hw, hw, cin).astype(np.float32)
    w = rng.randn(k, k, cin // groups, cout).astype(np.float32)
    b = rng.randn(cout).astype(np.float32)
    got = _np(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                     stride=stride, groups=groups))
    want = _torch_conv(x, w, b, stride, k // 2, groups)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gelu_is_exact_erf():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    got = _np(gelu(jnp.asarray(x)))
    want = F.gelu(torch.from_numpy(x), approximate="none").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_layer_norm_matches_torch_layernormchannel():
    # LayerNormChannel normalizes NCHW over C (reference mci.py:606-623);
    # ours normalizes NHWC over the trailing axis — same math.
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 5, 16).astype(np.float32)
    scale = rng.randn(16).astype(np.float32)
    bias = rng.randn(16).astype(np.float32)
    got = _np(layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    u = xt.mean(1, keepdim=True)
    s = (xt - u).pow(2).mean(1, keepdim=True)
    yt = (xt - u) / torch.sqrt(s + 1e-5)
    yt = torch.from_numpy(scale)[None, :, None, None] * yt \
        + torch.from_numpy(bias)[None, :, None, None]
    want = np.transpose(yt.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rms_norm_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 7, 32).astype(np.float32)
    scale = rng.randn(32).astype(np.float32)
    got = _np(rms_norm(jnp.asarray(x), jnp.asarray(scale), eps=1e-6))
    xt = torch.from_numpy(x)
    want = (xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6)
            * torch.from_numpy(scale)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_se_gate_matches_reference_math():
    # SEBlock: avgpool -> 1x1 reduce -> relu -> 1x1 expand -> sigmoid gate
    # (reference mci.py:42-81).
    rng = np.random.RandomState(3)
    c, rd = 16, 4
    x = rng.randn(2, 6, 6, c).astype(np.float32)
    p = {
        "reduce_w": jnp.asarray(rng.randn(1, 1, c, rd).astype(np.float32)),
        "reduce_b": jnp.asarray(rng.randn(rd).astype(np.float32)),
        "expand_w": jnp.asarray(rng.randn(1, 1, rd, c).astype(np.float32)),
        "expand_b": jnp.asarray(rng.randn(c).astype(np.float32)),
    }
    got = _np(se_gate(jnp.asarray(x), p))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    pooled = F.avg_pool2d(xt, kernel_size=[6, 6])
    rw = torch.from_numpy(np.transpose(_np(p["reduce_w"]), (3, 2, 0, 1)))
    ew = torch.from_numpy(np.transpose(_np(p["expand_w"]), (3, 2, 0, 1)))
    z = F.conv2d(pooled, rw, torch.from_numpy(_np(p["reduce_b"])))
    z = F.relu(z)
    z = F.conv2d(z, ew, torch.from_numpy(_np(p["expand_b"])))
    want = np.transpose((xt * torch.sigmoid(z)).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
