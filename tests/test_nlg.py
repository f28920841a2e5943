"""NLG metric sanity: perfect match scores 1 (or max), disjoint ~0,
partial in between."""

import numpy as np
import pytest

from lavila_tpu.eval.nlg import bleu, cider, meteor, nlg_scores, rouge_l


def test_bleu_perfect_and_zero():
    hyp = ["the cat sat on the mat"]
    refs = [["the cat sat on the mat"]]
    b = bleu(hyp, refs)
    assert all(abs(x - 1.0) < 1e-9 for x in b)
    b0 = bleu(["dog"], [["completely different words here"]])
    assert b0[0] == 0.0


def test_bleu_partial_ordering():
    refs = [["the cat sat on the mat"]]
    near = bleu(["the cat sat on a mat"], refs)
    far = bleu(["a dog ran in a park"], refs)
    assert near[4 - 1] > far[4 - 1]
    assert near[0] > far[0]


def test_rouge_l():
    refs = [["the cat sat on the mat"]]
    assert rouge_l(["the cat sat on the mat"], refs) == pytest.approx(1.0)
    assert rouge_l(["mat the on sat cat the"], refs) < 1.0
    assert rouge_l(["zebra"], refs) == 0.0


def test_meteor():
    refs = [["the cat sat"]]
    perfect = meteor(["the cat sat"], refs)
    scrambled = meteor(["sat cat the"], refs)
    assert perfect > scrambled > 0.0
    assert meteor(["xyz"], refs) == 0.0


def test_meteor_stem_stage_matches_inflections():
    # 'cuts' vs 'cutting' only match through the Porter-stem stage
    refs = [["a person cutting onions"]]
    with_stem = meteor(["a person cuts onion"], refs, use_stem=True)
    without = meteor(["a person cuts onion"], refs, use_stem=False)
    assert with_stem > without


def test_bert_style_normalize_basic():
    from lavila_tpu.eval.nlg import bert_style_normalize
    # lowercase + punctuation splitting, the reference's BERT-tokenizer
    # round-trip effect (reference eval_narrator.py:267-271)
    assert bert_style_normalize("#C C Opens the Drawer.") == \
        "# c c opens the drawer ."
    assert bert_style_normalize("Don't stop!") == "don ' t stop !"


def test_bert_style_normalize_wordpiece_roundtrip(tmp_path):
    from lavila_tpu.data.tokenizers import WordPieceTokenizer
    from lavila_tpu.eval.nlg import bert_style_normalize
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "open", "##s", "the",
             "drawer", "."]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")
    tok = WordPieceTokenizer(str(tmp_path / "vocab.txt"))
    # in-vocab text: wordpiece round-trip == basic normalization
    assert bert_style_normalize("Opens the drawer.", tok) == \
        "opens the drawer ."
    # OOV word becomes [UNK], matching BertTokenizer decode semantics
    assert bert_style_normalize("opens the fridge.", tok) == \
        "opens the [UNK] ."


def test_cider_ranks_similarity():
    refs = [["a person cuts an onion"], ["a person opens a drawer"]]
    hyps_good = ["a person cuts an onion", "a person opens a drawer"]
    hyps_bad = ["birds fly south", "the stock market rose"]
    assert cider(hyps_good, refs) > cider(hyps_bad, refs)


def test_nlg_scores_keys():
    out = nlg_scores(["a b c"], [["a b c"]])
    assert set(out) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                        "ROUGE_L", "CIDEr"}
