"""Hermetic RoBERTa tokenization: pure-BPE oracle parity + hashed fallback.

The pure-python byte-level BPE is compared against transformers' slow
RobertaTokenizer CONSTRUCTED FROM THE SAME local vocab/merges files — a
real oracle with zero downloads.  With the genuine roberta-base files the
same code path therefore yields the reference token ids.
"""

import json

import numpy as np
import pytest

from syncfusion_tpu.models.clap import bpe


def _make_tiny_roberta_files(tmp_path):
    """A tiny but VALID roberta-format vocab/merges over the GH label
    alphabet, with multi-level merges to exercise rank-greedy order."""
    table = bpe.bytes_to_unicode()
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
    for ch in sorted(set(table.values())):
        vocab[ch] = len(vocab)
    merges = [
        "h i", "hi t", "Ġ w", "Ġw o", "Ġwo o", "Ġwoo d",
        "Ġ m", "Ġm e", "Ġme t", "Ġmet a", "Ġmeta l",
        "s c", "sc r", "scr a", "scra t", "scrat c", "scratc h",
        "t a",  # decoy rank that must lose to earlier merges
    ]
    for m in merges:
        tok = m.replace(" ", "")
        if tok not in vocab:
            vocab[tok] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(merges) + "\n"
    )
    return tmp_path / "vocab.json", tmp_path / "merges.txt"


TEXTS = ["hit wood", "scratch metal", "hit  metal!", "", "tap tap tap wood"]


def test_pure_bpe_matches_transformers_slow_tokenizer(tmp_path):
    transformers = pytest.importorskip("transformers")
    from transformers import RobertaTokenizer

    vocab_file, merges_file = _make_tiny_roberta_files(tmp_path)
    ref = RobertaTokenizer(str(vocab_file), str(merges_file))
    mine = bpe.ByteLevelBPE(vocab_file, merges_file)

    for text in TEXTS:
        got = bpe.encode_batch(mine, [text], max_length=16)
        want = ref([text], padding="max_length", truncation=True,
                   max_length=16, return_tensors="np")
        np.testing.assert_array_equal(got["input_ids"], want["input_ids"],
                                      err_msg=f"text={text!r}")
        np.testing.assert_array_equal(
            got["attention_mask"], want["attention_mask"]
        )


def test_tokenize_falls_back_to_pure_bpe_files(tmp_path, monkeypatch):
    from syncfusion_tpu.models.clap import roberta

    vocab_file, _ = _make_tiny_roberta_files(tmp_path)
    monkeypatch.setattr(roberta, "_TOKENIZER", None)

    # force the transformers path to fail (as in a hermetic env)
    import transformers

    def boom(*a, **k):
        raise OSError("no local files")

    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained", boom)
    out = roberta.tokenize(["hit wood"], max_length=8,
                           tokenizer_path=str(tmp_path))
    assert out["input_ids"].shape == (1, 8)
    assert out["input_ids"][0, 0] == bpe.BOS
    assert bpe.EOS in out["input_ids"][0]
    monkeypatch.setattr(roberta, "_TOKENIZER", None)


def test_tokenize_hashed_fallback_runs_hermetically(monkeypatch):
    from syncfusion_tpu.models.clap import roberta

    monkeypatch.setattr(roberta, "_TOKENIZER", None)
    import transformers

    def boom(*a, **k):
        raise OSError("no local files")

    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained", boom)
    a = roberta.tokenize(["hit wood", "scratch metal"], max_length=12)
    b = roberta.tokenize(["hit wood", "scratch metal"], max_length=12)
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])  # deterministic
    assert a["input_ids"][0, 0] == bpe.BOS and a["input_ids"][0, 3] == bpe.EOS
    assert (a["attention_mask"][0] == np.array([1, 1, 1, 1] + [0] * 8)).all()
    assert a["input_ids"][0, 1] != a["input_ids"][0, 2]
    assert 0 < a["input_ids"][0, 1] < bpe.VOCAB_SIZE
    monkeypatch.setattr(roberta, "_TOKENIZER", None)
