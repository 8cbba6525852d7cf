"""SFT masking vs a REAL sentencepiece-style BPE tokenizer (VERDICT r2 #5).

The synthetic byte tokenizers can't exhibit Llama's ``add_dummy_prefix``
whitespace semantics (a ``▁`` is prepended to the input and spaces become
``▁``, so token boundaries shift when a string is tokenized in pieces).
Here we train a tiny BPE offline with the ``tokenizers`` library using
exactly those semantics (Metaspace pre-tokenizer, BOS post-processor) and
assert the span-constructed masking produces ids identical to
whole-conversation tokenization — the reference's guarded invariant
(train_qwen.py:624-630)."""

import numpy as np
import pytest

from fastvlm_tpu.data.constants import IGNORE_INDEX
from fastvlm_tpu.data.sft import (
    PREPROCESSORS,
    V1_SYSTEM,
    _SpanBuilder,
    _tok_full,
)

CORPUS = [
    "A chat between a curious human and an artificial intelligence "
    "assistant. The assistant gives helpful, detailed, and polite answers "
    "to the human's questions.",
    "[INST] What color is the sky? [/INST] The sky is blue.",
    "<<SYS>> You are a helpful language and vision assistant. <</SYS>>",
    "USER: what is in this image? ASSISTANT: a black cat on a mat.",
    "the quick brown fox jumps over the lazy dog",
    "answer the questions briefly and accurately please",
]


@pytest.fixture(scope="module")
def llama_bpe():
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    # Metaspace with prepend_scheme="first" == sentencepiece add_dummy_prefix
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="first")
    trainer = trainers.BpeTrainer(
        vocab_size=320, special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=list(
            "abcdefghijklmnopqrstuvwxyz"
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,?!:'<>/[]()▁\n"))
    tok.train_from_iterator(CORPUS, trainer)
    bos = tok.token_to_id("<s>")
    tok.post_processor = TemplateProcessing(
        single="<s> $A", pair="<s> $A <s> $B",
        special_tokens=[("<s>", bos)])
    hf = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        unk_token="<unk>")
    return hf


def _render(version, convs):
    """The whole conversation as ONE string, exactly as the preprocessors
    accumulate it (their .text) — the reference's tokenize-once input."""
    if version == "llama_2":
        from fastvlm_tpu.data.conversation import conv_llama_2

        wrap = f"<<SYS>>\n{conv_llama_2.system}\n<</SYS>>\n\n"
        out, first = "", True
        for t in convs:
            if t["from"] == "human":
                q = (wrap if first else "") + t["value"]
                out += f"[INST] {q} [/INST]"
                first = False
            else:
                out += f" {t['value']} </s>"
        return out
    if version == "v1":
        out = V1_SYSTEM + " "
        for t in convs:
            if t["from"] == "human":
                out += "USER: " + t["value"] + " "
            else:
                out += "ASSISTANT: " + t["value"] + "</s>"
        return out
    raise ValueError(version)


CONVS = [
    {"from": "human", "value": "what color is the sky?"},
    {"from": "gpt", "value": "the sky is blue."},
    {"from": "human", "value": "and the cat?"},
    {"from": "gpt", "value": "a black cat."},
]


@pytest.mark.parametrize("version", ["llama_2", "v1"])
def test_span_ids_equal_whole_string_tokenization(version, llama_bpe):
    ids, labels = PREPROCESSORS[version](CONVS, llama_bpe)
    want = _tok_full(llama_bpe, _render(version, CONVS))
    assert ids == want, (ids, want)
    assert len(labels) == len(ids)
    # exactly one BOS, never a target
    assert ids[0] == llama_bpe.bos_token_id
    assert ids.count(llama_bpe.bos_token_id) == 1
    assert labels[0] == IGNORE_INDEX


@pytest.mark.parametrize("version", ["llama_2", "v1"])
def test_target_spans_decode_to_answers(version, llama_bpe):
    """Every contiguous unmasked span must decode to one assistant answer
    (modulo the ▁ whitespace marker and the eos marker)."""
    ids, labels = PREPROCESSORS[version](CONVS, llama_bpe)
    spans, cur = [], []
    for i, l in enumerate(labels):
        if l != IGNORE_INDEX:
            cur.append(ids[i])
        elif cur:
            spans.append(cur)
            cur = []
    if cur:
        spans.append(cur)
    answers = [t["value"] for t in CONVS if t["from"] == "gpt"]
    assert len(spans) == len(answers), (spans, answers)
    for span, ans in zip(spans, answers):
        text = llama_bpe.decode(span, skip_special_tokens=False)
        # decode joins tokens with spaces; ▁ is the real space marker
        text = " ".join(text.replace(" ", "").replace("▁", " ")
                        .replace("</s>", "").split())
        want = " ".join(ans.split())
        # a boundary-merge mask may shave the first character(s) of the
        # answer out of the target span; everything kept must match the tail
        assert want.endswith(text) and len(text) >= len(want) - 2, (text, want)


def test_dummy_prefix_actually_bites(llama_bpe):
    """Sanity: this tokenizer really has the Llama whitespace hazard —
    tokenizing a mid-string span alone differs from its in-context ids
    (otherwise this file tests nothing)."""
    whole = llama_bpe("USER: hi ASSISTANT:the cat").input_ids
    alone = llama_bpe("the cat").input_ids[1:]  # strip BOS
    assert whole[-len(alone):] != alone


class MergingTokenizer:
    """Deterministic mock whose BPE merges 'x'+'y' across any boundary:
    encodes text bytewise except the pair "xy" -> one id (500)."""

    bos_token_id = 1

    class _Enc(list):
        @property
        def input_ids(self):
            return list(self)

    def __call__(self, text):
        ids, i = [self.bos_token_id], 0
        while i < len(text):
            if text[i : i + 2] == "xy":
                ids.append(500)
                i += 2
            else:
                ids.append(ord(text[i]))
                i += 1
        return self._Enc(ids)


def test_boundary_merge_masks_straddling_token():
    """A merge across the instruction/answer boundary must (a) keep ids
    identical to whole-string tokenization and (b) mask the merged token."""
    tok = MergingTokenizer()
    b = _SpanBuilder(tok)
    b.add("ax", False)   # instruction ends in 'x'
    b.add("yb", True)    # answer starts with 'y' -> "xy" merges
    want = tok("axyb").input_ids
    assert b.ids == want
    assert b.boundary_merges == 1
    merged_pos = b.ids.index(500)
    assert b.labels[merged_pos] == IGNORE_INDEX  # straddling token masked
    assert b.labels[-1] == ord("b")              # rest of the answer kept
