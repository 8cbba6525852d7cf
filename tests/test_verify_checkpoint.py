"""Checkpoint key-map audit (VERDICT r1 #6): every state-dict key must be
consumed by the converter, so a wrong key guess surfaces as an unconsumed
reference key the day real weights arrive — instead of passing every
synthetic test silently."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from fastvlm_tpu.models import vlm
from fastvlm_tpu.utils import checkpoint as ckpt
from fastvlm_tpu.utils.hf_export import export_hf, export_state_dict


def _cfg():
    from test_hf_export import full_cfg

    return full_cfg()


def test_audit_consumes_every_key():
    cfg = _cfg()
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    sd = export_state_dict(params, cfg)
    audit = ckpt.audit_key_map(sd, cfg)
    assert audit["unused_keys"] == []
    assert audit["used"] >= len(sd)


def test_audit_flags_unknown_keys():
    cfg = _cfg()
    params = vlm.init(jax.random.PRNGKey(1), cfg)
    sd = export_state_dict(params, cfg)
    # a key our map doesn't know about — e.g. the wrong SE naming the
    # VERDICT warned about (conv_exp.se.fc1 instead of se.reduce)
    sd[ckpt.VISION_PREFIX + "conv_exp.se.fc1.weight"] = np.zeros(
        (4, 4, 1, 1), np.float32)
    audit = ckpt.audit_key_map(sd, cfg)
    assert audit["unused_keys"] == [
        ckpt.VISION_PREFIX + "conv_exp.se.fc1.weight"]


def test_audit_ignores_hf_buffers_and_tied_head():
    import dataclasses

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder,
                                         tie_word_embeddings=True))
    params = vlm.init(jax.random.PRNGKey(2), cfg)
    sd = export_state_dict(params, cfg)
    sd["model.layers.0.self_attn.rotary_emb.inv_freq"] = np.zeros(
        4, np.float32)
    sd["lm_head.weight"] = np.zeros((8, 8), np.float32)  # tied duplicate
    audit = ckpt.audit_key_map(sd, cfg)
    assert audit["unused_keys"] == []


def test_verify_checkpoint_end_to_end(tmp_path):
    cfg = _cfg()
    params = vlm.init(jax.random.PRNGKey(3), cfg)
    d = export_hf(params, cfg, str(tmp_path / "ckpt"))

    # goldens produced "by the reference" — here our own encode stands in,
    # proving the golden comparison plumbing and the 1e-3 bar
    s = cfg.vision.image_size
    x = np.random.RandomState(0).rand(1, s, s, 3).astype(np.float32)
    feats = np.asarray(vlm.encode_images(params, cfg, jnp.asarray(x)))
    gpath = str(tmp_path / "goldens.npz")
    np.savez(gpath, input=x, features=feats)

    report = ckpt.verify_checkpoint(d, gpath, cfg=cfg)
    assert report["unused_keys"] == []
    assert report["features_finite"] and report["tower_grid_finite"]
    assert report["golden_pass_1e-3"], report["golden_max_abs_diff"]
    json.dumps(report)  # must be JSON-serializable for the CLI


def test_predict_cli_verify_mode(tmp_path):
    """--verify-checkpoint exits 0 and prints the JSON report."""
    import io
    from contextlib import redirect_stdout

    from fastvlm_tpu import predict

    cfg = _cfg()
    params = vlm.init(jax.random.PRNGKey(4), cfg)
    d = export_hf(params, cfg, str(tmp_path / "ckpt"))

    # the CLI path reads config.json; our tiny dims aren't representable
    # there, so patch the loader the way a custom config user would
    import fastvlm_tpu.utils.checkpoint as C

    orig = C.verify_checkpoint
    C.verify_checkpoint = lambda path, g=None: orig(path, g, cfg=cfg)
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = predict.main(["--model-path", d, "--verify-checkpoint"])
        assert rc == 0
        report = json.loads(buf.getvalue())
        assert report["unused_keys"] == []
    finally:
        C.verify_checkpoint = orig


def test_audit_train_mode_checkpoint(tmp_path):
    """Train-mode (multi-branch) checkpoints must audit clean — the fusion
    pre-pass runs BEFORE the recording wrapper, so fused reads are seen and
    the original branch keys are accounted as consumed by fusion."""
    from test_reparam import _conv_bn

    cfg = _cfg()
    params = vlm.init(jax.random.PRNGKey(5), cfg)
    sd = dict(export_state_dict(params, cfg))
    # swap one fused stem conv for its train-time multi-branch form
    pfx = ckpt.VISION_PREFIX + "patch_embed.1."
    del sd[pfx + "reparam_conv.weight"], sd[pfx + "reparam_conv.bias"]
    c0 = cfg.vision.embed_dims[0]
    _conv_bn(sd, pfx + "rbr_conv.0", c0, 1, 3)
    _conv_bn(sd, pfx + "rbr_scale", c0, 1, 1)

    audit = ckpt.audit_key_map(sd, cfg)
    assert audit["fused_train_branches"]
    assert audit["unused_keys"] == [], audit["unused_keys"][:5]


def test_verify_checkpoint_missing_goldens_errors(tmp_path):
    from fastvlm_tpu.utils.hf_export import export_hf
    import pytest

    cfg = _cfg()
    params = vlm.init(jax.random.PRNGKey(6), cfg)
    d = export_hf(params, cfg, str(tmp_path / "ckpt"))
    with pytest.raises(FileNotFoundError):
        ckpt.verify_checkpoint(d, str(tmp_path / "nope.npz"), cfg=cfg)
