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


def test_cider_ranks_similarity():
    refs = [["a person cuts an onion"], ["a person opens a drawer"]]
    hyps_good = ["a person cuts an onion", "a person opens a drawer"]
    hyps_bad = ["birds fly south", "the stock market rose"]
    assert cider(hyps_good, refs) > cider(hyps_bad, refs)


def test_nlg_scores_keys():
    out = nlg_scores(["a b c"], [["a b c"]])
    assert set(out) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                        "ROUGE_L", "CIDEr"}
