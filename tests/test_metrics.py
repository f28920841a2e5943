"""Metric library tests on tiny hand-checkable matrices."""

import numpy as np
import pytest

from lavila_tpu.eval import metrics as M


def test_topk_accuracy():
    logits = np.array([[0.1, 0.9, 0.0],
                       [0.8, 0.1, 0.1],
                       [0.2, 0.3, 0.5]])
    targets = np.array([1, 1, 2])
    acc1, acc2 = M.topk_accuracy(logits, targets, ks=(1, 2))
    assert acc1 == pytest.approx(100 * 2 / 3)
    assert acc2 == pytest.approx(100.0)


def test_mean_class_accuracy():
    cm = np.array([[2, 0], [1, 1]])
    mean_acc, overall = M.mean_class_accuracy(cm)
    assert mean_acc == pytest.approx(75.0)
    assert overall == pytest.approx(75.0)


def test_retrieval_map_perfect_and_worst():
    rel = np.eye(3)
    sim = np.array([[0.9, 0.1, 0.0],
                    [0.0, 0.8, 0.1],
                    [0.1, 0.0, 0.7]])
    v, t, avg = M.retrieval_map(sim, rel)
    assert avg == pytest.approx(1.0)
    # worst: the true match is ranked last
    sim_bad = 1.0 - sim
    v, t, avg = M.retrieval_map(sim_bad, rel)
    assert avg < 0.6


def test_retrieval_map_graded_relevancy():
    # Reference rule: cumsum GRADED relevancy, zero positions with rel != 1,
    # normalize by count of rel==1 docs. With the 0.5-item ranked first,
    # the rel==1 item at rank 2 gets p(2) = (0.5 + 1.0)/2 = 0.75.
    rel = np.array([[1.0, 0.5], [0.5, 1.0]])
    sim = np.array([[0.1, 0.9], [0.9, 0.1]])  # ranks the 0.5 items first
    v, _, _ = M.retrieval_map(sim, rel)
    assert v == pytest.approx(0.75)


def test_retrieval_map_matches_reference_algorithm():
    # Independent loop-based transcription of the reference calculate_mAP
    # math (evaluation_ek100mir.py:151-177), checked on a random graded
    # relevancy matrix with ties at 0 / 0.5 / 1.
    rng = np.random.default_rng(3)
    sim = rng.uniform(size=(12, 17))
    rel = rng.choice([0.0, 0.1, 0.5, 1.0], size=(12, 17),
                     p=[0.55, 0.2, 0.15, 0.1])
    rel[:, 0] = 1.0  # every query has at least one exact match

    def ap_row(s, r):
        order = np.argsort(-s)
        rr = r[order]
        n_rel = (rr == 1).sum()
        if n_rel == 0:  # reference would NaN here; we define AP = 0
            return 0.0
        total, cum = 0.0, 0.0
        for k in range(len(rr)):
            cum += rr[k]
            if rr[k] == 1:
                total += cum / (k + 1)
        return total / n_rel

    expect_v = np.mean([ap_row(sim[i], rel[i]) for i in range(sim.shape[0])])
    expect_t = np.mean([ap_row(sim[:, j], rel[:, j])
                        for j in range(sim.shape[1])])
    v, t, avg = M.retrieval_map(sim, rel)
    assert v == pytest.approx(expect_v)
    assert t == pytest.approx(expect_t)
    assert avg == pytest.approx((expect_v + expect_t) / 2)


def test_retrieval_ndcg_perfect():
    rel = np.array([[1.0, 0.3, 0.0],
                    [0.2, 1.0, 0.1],
                    [0.0, 0.2, 1.0]])
    # similarity proportional to relevancy -> perfect ranking -> nDCG 1
    v, t, avg = M.retrieval_ndcg(rel.copy(), rel)
    assert avg == pytest.approx(1.0)
    # random ranking is worse
    rng = np.random.default_rng(0)
    v2, t2, avg2 = M.retrieval_ndcg(rng.uniform(size=(3, 3)), rel)
    assert avg2 < 1.0


def test_multilabel_map():
    gts = np.array([[1, 0], [0, 1], [1, 1], [0, 0]])
    scores = np.array([[0.9, 0.1], [0.2, 0.8], [0.7, 0.6], [0.1, 0.2]])
    m, aps = M.multilabel_map(scores, gts)
    assert aps.shape == (2,)
    assert m == pytest.approx(100.0)  # both classes perfectly ranked
    # flip one: class 0 ranks a negative first
    scores2 = scores.copy()
    scores2[1, 0] = 0.95
    m2, _ = M.multilabel_map(scores2, gts)
    assert m2 < 100.0


def test_egomcq_accuracy():
    preds = np.array([[0.9, 0.1, 0, 0, 0],
                      [0.1, 0.9, 0, 0, 0],
                      [0, 0, 0.9, 0.1, 0]])
    answers = np.array([0, 0, 2])
    types = np.array([1, 1, 2])
    out = M.egomcq_accuracy(preds, answers, types)
    assert out["Intra-video"] == pytest.approx(50.0)
    assert out["Inter-video"] == pytest.approx(100.0)


def test_marginalization():
    # 4 actions: (verb, noun) = (0,0), (0,1), (1,0), (1,1)
    a2p = np.array([[0, 0], [0, 1], [1, 0], [1, 1]])
    vi = M.marginal_indexes(a2p, 0)
    probs = np.array([[0.1, 0.2, 0.3, 0.4]])
    vmarg = M.marginalize(probs, vi)
    np.testing.assert_allclose(vmarg, [[0.3, 0.7]])
    ni = M.marginal_indexes(a2p, 1)
    nmarg = M.marginalize(probs, ni)
    np.testing.assert_allclose(nmarg, [[0.4, 0.6]])
