"""SFT data pipeline tests: target masking, dataset loading, collation,
sampler grouping (SURVEY.md §4; reference behaviors from train_qwen.py)."""

import json
import os

import numpy as np
import pytest

from fastvlm_tpu.data.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from fastvlm_tpu.data.preprocessing import ByteTokenizer
from fastvlm_tpu.data.sft import (
    DataArguments, SupervisedDataset, collate, preprocess_plain,
    preprocess_qwen_2)
from fastvlm_tpu.train.sampler import (
    LengthGroupedSampler, get_modality_length_grouped_indices)


TOK = ByteTokenizer()


def test_qwen2_masking_only_assistant_is_target():
    convs = [
        {"from": "human", "value": "<image>\nWhat is this?"},
        {"from": "gpt", "value": "A cat."},
        {"from": "human", "value": "Color?"},
        {"from": "gpt", "value": "Black."},
    ]
    ids, labels = preprocess_qwen_2(convs, TOK)
    assert len(ids) == len(labels)
    # every target position matches its input id
    for i, l in zip(ids, labels):
        assert l == IGNORE_INDEX or l == i
    # the target text is exactly the assistant replies + separators
    target_ids = [l for l in labels if l != IGNORE_INDEX]
    text = TOK.decode(target_ids)
    assert "A cat." in text and "Black." in text
    assert "What is this?" not in text and "Color?" not in text
    # image sentinel present exactly once and masked
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    assert labels[ids.index(IMAGE_TOKEN_INDEX)] == IGNORE_INDEX


def test_qwen2_span_tokenization_matches_whole_string():
    """Span-wise tokenization must concatenate to the same ids as tokenizing
    the full rendered conversation (the reference's approach)."""
    from fastvlm_tpu.data.conversation import conv_templates
    from fastvlm_tpu.data.preprocessing import tokenizer_image_token

    convs = [
        {"from": "human", "value": "hello"},
        {"from": "gpt", "value": "world"},
    ]
    ids, _ = preprocess_qwen_2(convs, TOK)
    conv = conv_templates["qwen_2"].copy()
    conv.append_message(conv.roles[0], "hello")
    conv.append_message(conv.roles[1], "world")
    whole = tokenizer_image_token(conv.get_prompt(), TOK)
    assert ids == whole


def test_preprocess_plain():
    convs = [
        {"from": "human", "value": "<image>"},
        {"from": "gpt", "value": "a photo of a dog"},
    ]
    ids, labels = preprocess_plain(convs, TOK)
    assert ids[0] == IMAGE_TOKEN_INDEX
    assert labels[0] == IGNORE_INDEX
    assert TOK.decode([l for l in labels if l != IGNORE_INDEX]).startswith(
        "a photo of a dog")


@pytest.fixture
def dataset_dir(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Image.new("RGB", (80, 50), (120, 30, 200)).save(img_dir / "a.jpg")
    data = [
        {"id": "0", "image": "a.jpg", "conversations": [
            {"from": "human", "value": "<image>\nDescribe."},
            {"from": "gpt", "value": "A purple rectangle."}]},
        {"id": "1", "conversations": [
            {"from": "human", "value": "Hi"},
            {"from": "gpt", "value": "Hello!"}]},
        {"id": "2", "image": "missing.jpg", "conversations": [
            {"from": "human", "value": "<image>\nX"},
            {"from": "gpt", "value": "Y"}]},
    ]
    p = tmp_path / "data.json"
    p.write_text(json.dumps(data))
    return str(p), str(img_dir)


def test_dataset_and_collate(dataset_dir):
    from fastvlm_tpu.data.preprocessing import ImageProcessor

    data_path, image_folder = dataset_dir
    ds = SupervisedDataset(
        DataArguments(data_path=data_path, image_folder=image_folder),
        TOK, ImageProcessor(64))
    assert len(ds) == 3
    # modality lengths: image samples positive, text-only negative
    ml = ds.modality_lengths
    assert ml[0] > 0 and ml[1] < 0

    s0 = ds[0]
    assert s0["image"].shape == (64, 64, 3)
    assert s0["has_image"]
    s1 = ds[1]
    assert not s1["has_image"]
    assert s1["image"].shape == (64, 64, 3)  # dummy zero image
    assert np.all(s1["image"] == 0)
    # broken image falls back to sample 0
    s2 = ds[2]
    assert s2["ids"] == s0["ids"]

    batch = collate([s0, s1], num_image_tokens=4, pad_to_multiple=16)
    assert batch["ids"].shape == batch["labels"].shape
    assert batch["ids"].shape[1] % 16 == 0
    assert batch["image_starts"][0] >= 0 and batch["image_starts"][1] == -1
    assert batch["images"].shape[0] == 2
    # image span in labels is ignored
    st = batch["image_starts"][0]
    assert np.all(batch["labels"][0, st:st + 4] == IGNORE_INDEX)
    # padding labels ignored
    assert np.all(batch["labels"][0, batch["attn_lens"][0]:] == IGNORE_INDEX)


def test_modality_grouped_sampler():
    rng_lengths = [10, -5, 20, -8, 30, -2, 15, -9]
    sampler = LengthGroupedSampler(rng_lengths, batch_size=2,
                                   group_by_modality=True, seed=1)
    idx = list(sampler)
    assert sorted(idx) == list(range(8))
    # within each megabatch of 2, indices share modality
    for i in range(0, 8, 2):
        a, b = rng_lengths[idx[i]], rng_lengths[idx[i + 1]]
        assert (a > 0) == (b > 0), (idx, i)


def test_sampler_epoch_reshuffles():
    sampler = LengthGroupedSampler(list(range(1, 33)), batch_size=4, seed=0)
    e1, e2 = list(sampler), list(sampler)
    assert sorted(e1) == sorted(e2)
    assert e1 != e2


def test_llama2_and_mpt_masking():
    from fastvlm_tpu.data.sft import preprocess_llama_2, preprocess_mpt

    convs = [
        {"from": "human", "value": "q1"},
        {"from": "gpt", "value": "a1"},
        {"from": "human", "value": "q2"},
        {"from": "gpt", "value": "a2"},
    ]
    for fn in (preprocess_llama_2, preprocess_mpt):
        ids, labels = fn(convs, TOK)
        assert len(ids) == len(labels)
        tgt = TOK.decode([l for l in labels if l != IGNORE_INDEX])
        assert "a1" in tgt and "a2" in tgt
        assert "q1" not in tgt and "q2" not in tgt


def test_qwen2_template_renders_byte_exact():
    """qwen_2 rendering must match the reference format exactly
    (conversation.py:407-415 + QWEN_2 style :67-75)."""
    from fastvlm_tpu.data.conversation import conv_templates

    conv = conv_templates["qwen_2"].copy()
    conv.append_message(conv.roles[0], "Describe.")
    conv.append_message(conv.roles[1], None)
    assert conv.get_prompt() == (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\nDescribe.<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    conv.messages[-1][1] = "A cat."
    conv.append_message(conv.roles[0], "Color?")
    conv.append_message(conv.roles[1], None)
    assert conv.get_prompt().endswith(
        "<|im_start|>assistant\nA cat.<|im_end|>\n"
        "<|im_start|>user\nColor?<|im_end|>\n"
        "<|im_start|>assistant\n")


class BOSByteTokenizer(ByteTokenizer):
    """ByteTokenizer that prepends BOS on every __call__, like HF Llama-family
    tokenizers with add_special_tokens=True (ADVICE r1: span-constructed
    masking must not inject BOS mid-sequence)."""

    def __call__(self, text: str):
        return self._Enc([self.bos_token_id] + list(text.encode("utf-8")))


@pytest.mark.parametrize("version", ["qwen_2", "v1", "llama_2", "mpt", "plain"])
def test_bos_tokenizer_single_bos_at_start(version):
    from fastvlm_tpu.data.sft import PREPROCESSORS

    tok = BOSByteTokenizer()
    convs = [
        {"from": "human", "value": "<image>\nwhat?"},
        {"from": "gpt", "value": "a cat"},
    ]
    if version != "plain":
        convs += [
            {"from": "human", "value": "color?"},
            {"from": "gpt", "value": "black"},
        ]
    ids, labels = PREPROCESSORS[version](convs, tok)
    assert ids[0] == tok.bos_token_id
    assert ids.count(tok.bos_token_id) == 1, ids
    # BOS is never a learning target
    assert labels[0] == IGNORE_INDEX
    assert tok.bos_token_id not in [l for l in labels if l != IGNORE_INDEX]


def test_bos_tokenizer_spans_match_whole_string():
    """With a BOS-adding tokenizer, span concatenation must still equal the
    reference's tokenize-once-over-the-rendered-conversation ids."""
    from fastvlm_tpu.data.conversation import conv_templates
    from fastvlm_tpu.data.preprocessing import tokenizer_image_token

    tok = BOSByteTokenizer()
    convs = [
        {"from": "human", "value": "hello"},
        {"from": "gpt", "value": "world"},
    ]
    ids, _ = preprocess_qwen_2(convs, tok)
    conv = conv_templates["qwen_2"].copy()
    conv.append_message(conv.roles[0], "hello")
    conv.append_message(conv.roles[1], "world")
    whole = tokenizer_image_token(conv.get_prompt(), tok)
    assert ids == whole


def test_single_separator_style_vicuna_v0():
    """SINGLE style (reference conversation.py:47-55, conv_vicuna_v0):
    system<sep>Role: msg<sep>…; the open assistant turn renders 'Role:'."""
    from fastvlm_tpu.data.conversation import conv_templates

    conv = conv_templates["vicuna_v0"].copy()
    conv.append_message(conv.roles[0], "hello")
    conv.append_message(conv.roles[1], None)
    got = conv.get_prompt()
    assert got == conv.system + "###Human: hello###Assistant:"
    conv.messages[-1][1] = "hi there"
    assert conv.get_prompt() == (
        conv.system + "###Human: hello###Assistant: hi there###")
    assert conv_templates["v0"] is conv_templates["vicuna_v0"]


# ---------------------------------------------------------------------------
# anyres training (reference train_qwen.py:957-958 -> process_anyres_image)
# ---------------------------------------------------------------------------


def _anyres_cfg():
    from fastvlm_tpu.config import (
        FastViTConfig, FastVLMConfig, ProjectorConfig, Qwen2Config)

    vision = FastViTConfig(layers=(1, 1, 1, 1, 1),
                           embed_dims=(8, 16, 32, 64, 128),
                           image_size=128, attn_head_dim=16)
    decoder = Qwen2Config(vocab_size=258, hidden_size=64, num_layers=2,
                          num_heads=4, num_kv_heads=2, head_dim=16,
                          intermediate_size=128)
    return FastVLMConfig(
        vision=vision, decoder=decoder,
        projector=ProjectorConfig(mm_hidden_size=vision.out_channels,
                                  hidden_size=64),
        image_aspect_ratio="anyres",
        image_grid_pinpoints=((128, 256), (256, 128), (256, 256)))


@pytest.fixture()
def anyres_dataset(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    # tall image -> best (128, 256) -> (1, 2) tile grid
    Image.new("RGB", (100, 220), (120, 30, 200)).save(img_dir / "tall.jpg")
    # wide image -> best (256, 128) -> (2, 1) grid
    Image.new("RGB", (220, 100), (30, 120, 10)).save(img_dir / "wide.jpg")
    data = [
        {"id": "0", "image": "tall.jpg", "conversations": [
            {"from": "human", "value": "<image>\nDescribe."},
            {"from": "gpt", "value": "A purple rectangle."}]},
        {"id": "1", "image": "wide.jpg", "conversations": [
            {"from": "human", "value": "<image>\nDescribe."},
            {"from": "gpt", "value": "A green rectangle."}]},
        {"id": "2", "image": "tall.jpg", "conversations": [
            {"from": "human", "value": "<image>\nAgain."},
            {"from": "gpt", "value": "Still purple."}]},
        {"id": "3", "conversations": [
            {"from": "human", "value": "Hi"},
            {"from": "gpt", "value": "Hello!"}]},
    ]
    p = tmp_path / "data.json"
    p.write_text(json.dumps(data))
    return str(p), str(img_dir)


def test_anyres_dataset_collate_masking_and_shapes(anyres_dataset):
    from fastvlm_tpu.data.preprocessing import ImageProcessor
    from fastvlm_tpu.ops.anyres import num_merged_tokens

    cfg = _anyres_cfg()
    data_path, image_folder = anyres_dataset
    ds = SupervisedDataset(
        DataArguments(data_path=data_path, image_folder=image_folder,
                      image_aspect_ratio="anyres",
                      image_grid_pinpoints=cfg.image_grid_pinpoints),
        TOK, ImageProcessor(128))
    s0 = ds[0]
    # global view + 2 tiles for the (1, 2) grid
    assert s0["image"].shape == (3, 128, 128, 3)
    assert s0["anyres"][0] == (1, 2)
    assert ds.anyres_meta(0) == ((1, 2), (100, 220))
    # text-only: dummy single-tile stack on the (1, 1) grid
    s3 = ds[3]
    assert s3["image"].shape == (1, 128, 128, 3)
    assert not s3["has_image"]

    n_tok = num_merged_tokens((1, 2), cfg.vision.grid_size,
                              cfg.mm_patch_merge_type, (100, 220))
    batch = collate([s0, ds[2]], cfg.num_image_tokens, pad_to_multiple=16,
                    cfg=cfg)
    assert batch["tiles"].shape == (2, 3, 128, 128, 3)
    assert batch["_anyres"][0] == (1, 2)
    st = batch["image_starts"][0]
    # the sentinel expanded to the MERGED token count, all label-masked
    assert np.all(batch["labels"][0, st:st + n_tok] == IGNORE_INDEX)
    row = batch["ids"][0]
    assert batch["attn_lens"][0] >= n_tok
    # mixing grids in one batch is a contract violation
    with pytest.raises(ValueError, match="grid-uniform"):
        collate([s0, ds[1]], cfg.num_image_tokens, cfg=cfg)


def test_anyres_train_batches_and_step(anyres_dataset):
    import jax
    import jax.numpy as jnp

    from fastvlm_tpu.data.preprocessing import ImageProcessor
    from fastvlm_tpu.models import vlm
    from fastvlm_tpu.train import step as ts
    from fastvlm_tpu.train.sampler import LengthGroupedSampler
    from fastvlm_tpu.train.trainer import batches

    cfg = _anyres_cfg()
    data_path, image_folder = anyres_dataset
    ds = SupervisedDataset(
        DataArguments(data_path=data_path, image_folder=image_folder,
                      image_aspect_ratio="anyres",
                      image_grid_pinpoints=cfg.image_grid_pinpoints,
                      max_len=256),
        TOK, ImageProcessor(128))
    sampler = LengthGroupedSampler(ds.lengths, 2, seed=0)
    got = list(batches(ds, sampler, 2, cfg.num_image_tokens, cfg=cfg))
    # the two (1,2)-grid samples batch together; wide + text-only are
    # ragged per-grid tails (dropped, static shapes)
    assert len(got) == 1
    batch = got[0]
    anyres = batch.pop("_anyres")
    assert anyres[0] == (1, 2)

    params = vlm.init(jax.random.PRNGKey(0), cfg)
    tx = ts.make_optimizer(lr=1e-3)
    state = ts.make_train_state(params, tx)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, loss = ts.train_step(state, cfg, tx, jbatch, anyres=anyres)
    l0 = float(loss)
    assert np.isfinite(l0)
    # gradients flowed into the tower (tiles path is differentiable)
    state, loss = ts.train_step(state, cfg, tx, jbatch, anyres=anyres)
    assert np.isfinite(float(loss)) and float(loss) != l0
