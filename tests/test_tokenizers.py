"""Tokenizer tests: golden CLIP ids, roundtrips, padding contracts."""

import os

import numpy as np
import pytest

from lavila_tpu.data.tokenizers import (ClipBpeTokenizer, Gpt2BpeTokenizer,
                                        WordPieceTokenizer,
                                        generate_tokenizer)


@pytest.fixture(scope="module")
def clip_tok():
    return ClipBpeTokenizer()


def test_clip_vocab_size(clip_tok):
    assert len(clip_tok.encoder) == 49408
    assert clip_tok.sot_token == 49406
    assert clip_tok.eot_token == 49407


def test_clip_golden_tokens(clip_tok):
    # well-known public CLIP tokenization
    ids = clip_tok.encode("a photo of a cat")
    assert ids == [320, 1125, 539, 320, 2368]


def test_clip_call_shape_and_padding(clip_tok):
    arr = clip_tok(["hello world", "a"])
    assert arr.shape == (2, 77)
    assert arr.dtype == np.int32
    assert arr[0, 0] == 49406
    # EOT present, then zero padding
    row = arr[1]
    eot_pos = int(np.argmax(row))  # EOT is the max id
    assert row[eot_pos] == 49407
    assert (row[eot_pos + 1:] == 0).all()
    single = clip_tok("hello world")
    assert single.shape == (77,)


def test_clip_roundtrip(clip_tok):
    text = "cutting an onion on the chopping board"
    ids = clip_tok.encode(text)
    assert clip_tok.decode(ids).strip() == text


def test_clip_truncation(clip_tok):
    long_text = "word " * 200
    arr = clip_tok(long_text, context_length=77)
    assert arr.shape == (77,)
    assert (arr != 0).all()  # fully used


def test_clip_unicode_and_cleanup(clip_tok):
    ids = clip_tok.encode("  Hello   WORLD!  ")
    assert ids == clip_tok.encode("hello world!")


@pytest.fixture()
def tiny_gpt2_dir(tmp_path):
    """Synthetic GPT-2-style vocab to exercise the byte-level BPE."""
    import json
    # base alphabet + a few merges
    vocab = {}
    from lavila_tpu.data.tokenizers import byte_unicode_table
    for b, u in byte_unicode_table().items():
        vocab[u] = len(vocab)
    merges = ["Ġ t", "Ġt h", "Ġth e", "h e", "l l", "he ll", "hell o"]
    for m in merges:
        vocab["".join(m.split())] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(tmp_path)


def test_gpt2_bpe_merges(tiny_gpt2_dir):
    tok = Gpt2BpeTokenizer.from_dir(tiny_gpt2_dir, add_bos=True)
    ids = tok.encode(" the")
    assert len(ids) == 1  # Ġthe merged fully
    assert tok.decode(ids) == " the"
    ids = tok.encode("hello")
    assert tok.decode(ids) == "hello"
    arr = tok("hello the", context_length=10)
    assert arr[0] == tok.bos_token_id
    assert tok.eos_token_id in arr.tolist()


@pytest.fixture()
def tiny_bert_dir(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "cat", "sat", "on", "mat", "un", "##aff", "##able",
             "##s", ",", "."]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")
    return str(tmp_path)


def test_wordpiece(tiny_bert_dir):
    tok = WordPieceTokenizer(os.path.join(tiny_bert_dir, "vocab.txt"))
    ids, mask = tok("the cat sat", context_length=8)
    assert ids[0] == tok.cls_id
    n = int(mask.sum())
    assert ids[n - 1] == tok.sep_id
    assert tok.decode(ids[1:n - 1].tolist()) == "the cat sat"
    # greedy longest-match: "unaffable" -> un ##aff ##able
    ids2, _ = tok("unaffable", context_length=8)
    assert ids2[1] == tok.vocab["un"]
    assert ids2[2] == tok.vocab["##aff"]
    assert ids2[3] == tok.vocab["##able"]
    # unknown word -> [UNK]
    ids3, _ = tok("xyzzy", context_length=8)
    assert ids3[1] == tok.unk_id


def test_generate_tokenizer_fallback_is_clip():
    tok = generate_tokenizer("CLIP_OPENAI_TIMESFORMER_BASE")
    assert isinstance(tok, ClipBpeTokenizer)
