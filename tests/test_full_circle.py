"""Full-circle integration: SFT-train a tiny model on synthetic captions,
checkpoint, reload, and verify generation reproduces the data. Exercises
dataset -> masking -> train loop -> Orbax save -> restore -> fused generate.

Deterministic (fixed seeds, greedy decode); ~2 min on the CI CPU.
"""

import json

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_train_then_generate_reproduces_captions(tmp_path):
    from PIL import Image

    from fastvlm_tpu.config import (
        FastViTConfig, FastVLMConfig, ProjectorConfig, Qwen2Config)
    from fastvlm_tpu.data.preprocessing import ByteTokenizer, ImageProcessor
    from fastvlm_tpu.data.sft import DataArguments, SupervisedDataset
    from fastvlm_tpu.engine import Engine
    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.train.trainer import Trainer, TrainingArguments
    from fastvlm_tpu.utils.checkpoint import restore_native

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Image.new("RGB", (100, 80), (10, 200, 30)).save(img_dir / "x.jpg")
    data = [{"id": str(i), "image": "x.jpg", "conversations": [
        {"from": "human", "value": "<image>\nDescribe."},
        {"from": "gpt", "value": "green rectangle"}]} for i in range(12)]
    (tmp_path / "data.json").write_text(json.dumps(data))

    vision = FastViTConfig(layers=(1, 1, 1, 1, 1),
                           embed_dims=(8, 16, 32, 64, 128),
                           image_size=128, attn_head_dim=16)
    decoder = Qwen2Config(vocab_size=258, hidden_size=64, num_layers=2,
                          num_heads=4, num_kv_heads=2, head_dim=16,
                          intermediate_size=128)
    cfg = FastVLMConfig(
        vision=vision, decoder=decoder,
        projector=ProjectorConfig(mm_hidden_size=vision.out_channels,
                                  hidden_size=64))
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    dataset = SupervisedDataset(
        DataArguments(data_path=str(tmp_path / "data.json"),
                      image_folder=str(img_dir)),
        tok, ImageProcessor(128))

    args = TrainingArguments(
        output_dir=str(tmp_path / "run"), batch_size=4, max_steps=110,
        learning_rate=3e-3, save_steps=0, log_steps=50,
        unfreeze_mm_vision_tower=True, warmup_ratio=0.0)
    trainer = Trainer(cfg, params, dataset, args)
    result = trainer.train()
    assert result["final_loss"] < 0.5, result

    restored = restore_native(
        str(tmp_path / "run" / f"checkpoint-{result['steps']}" / "params"),
        vlm.init(jax.random.PRNGKey(0), cfg))
    engine = Engine(cfg, restored, tok, eos_ids=(tok.eos_token_id,))
    text, _ = engine.chat("Describe.", Image.open(img_dir / "x.jpg"),
                          max_new_tokens=20)
    assert "green rectangle" in text, text


def test_qlora_trainer_trains_and_saves_adapters(tmp_path):
    """Trainer with bits=8 + lora_enable (QLoRA, reference train_qwen.py:
    1050-1067 + 1113-1129): the quantized-base LoRA step must run, reduce
    the loss, and the split save must write adapter leaves only."""
    import os

    from PIL import Image

    from fastvlm_tpu.config import (
        FastViTConfig, FastVLMConfig, ProjectorConfig, Qwen2Config)
    from fastvlm_tpu.data.preprocessing import ByteTokenizer, ImageProcessor
    from fastvlm_tpu.data.sft import DataArguments, SupervisedDataset
    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.train.trainer import Trainer, TrainingArguments

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Image.new("RGB", (100, 80), (10, 200, 30)).save(img_dir / "x.jpg")
    data = [{"id": str(i), "image": "x.jpg", "conversations": [
        {"from": "human", "value": "<image>\nDescribe."},
        {"from": "gpt", "value": "green rectangle"}]} for i in range(8)]
    (tmp_path / "data.json").write_text(json.dumps(data))

    vision = FastViTConfig(layers=(1, 1, 1, 1, 1),
                           embed_dims=(8, 16, 32, 64, 128),
                           image_size=128, attn_head_dim=16)
    decoder = Qwen2Config(vocab_size=258, hidden_size=64, num_layers=2,
                          num_heads=4, num_kv_heads=2, head_dim=16,
                          intermediate_size=128)
    cfg = FastVLMConfig(
        vision=vision, decoder=decoder,
        projector=ProjectorConfig(mm_hidden_size=vision.out_channels,
                                  hidden_size=64))
    params = vlm.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    dataset = SupervisedDataset(
        DataArguments(data_path=str(tmp_path / "data.json"),
                      image_folder=str(img_dir)),
        tok, ImageProcessor(128))

    args = TrainingArguments(
        output_dir=str(tmp_path / "qlora"), batch_size=4, max_steps=8,
        learning_rate=1e-2, save_steps=0, log_steps=4,
        lora_enable=True, lora_r=4, bits=8, warmup_ratio=0.0)
    trainer = Trainer(cfg, params, dataset, args)
    # base really is quantized and adapters really attached
    q = trainer.state.params["decoder"]["layers"]["q"]
    assert "w_q" in q and "lora_a" in q
    result = trainer.train()
    assert np.isfinite(result["final_loss"])
    ckpt = tmp_path / "qlora" / f"checkpoint-{result['steps']}"
    assert os.path.isdir(ckpt / "lora_adapters")
    # adapters moved; quantized base untouched
    p = trainer.state.params["decoder"]["layers"]["q"]
    assert not np.allclose(np.asarray(p["lora_b"], np.float32), 0)

    # bits without lora is rejected (a full int fine-tune is meaningless)
    with pytest.raises(ValueError):
        Trainer(cfg, params, dataset,
                TrainingArguments(output_dir=str(tmp_path / "bad"),
                                  bits=8, max_steps=1))
