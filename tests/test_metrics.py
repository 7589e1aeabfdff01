"""Recall/MRR oracle tests: vectorized implementation vs the literal
transcription of the reference loop (src/client/client_lib.cpp:243-337)."""

import numpy as np
import pytest

from prefhetch_tpu.metrics import benchmark_results, benchmark_results_scalar


def test_perfect_results():
    gt = np.arange(500).reshape(5, 100)
    rep = benchmark_results(gt.copy(), gt, k=100)
    assert rep.recall_1 == 1.0
    assert rep.recall_10 == 1.0
    assert rep.recall_100 == 1.0
    assert rep.mrr_1 == 1.0
    assert rep.mrr_10 == 1.0
    assert rep.mrr_100 == 1.0


def test_no_overlap():
    gt = np.arange(500).reshape(5, 100)
    obs = gt + 1000
    rep = benchmark_results(obs, gt, k=100)
    assert rep.recall_100 == 0.0
    assert rep.mrr_100 == 0.0


def test_reference_recall_semantics():
    """recall@1 credits ANY of the top-100 GT ids at observed rank 0 —
    the reference's idiosyncratic definition (SURVEY.md §3.5)."""
    gt = np.arange(100).reshape(1, 100)
    obs = np.full((1, 100), -1)
    obs[0, 0] = 50  # GT id #50 (not GT[0]) at rank 0
    rep = benchmark_results(obs, gt, k=100)
    assert rep.recall_1 == 1.0      # credited
    assert rep.mrr_1 == 0.0         # MRR only credits GT[0]


def test_mrr_first_gt_only():
    gt = np.arange(100).reshape(1, 100)
    obs = np.full((1, 100), -1)
    obs[0, 4] = 0   # GT[0] found at observed rank 4
    rep = benchmark_results(obs, gt, k=100)
    assert rep.mrr_1 == 0.0
    assert rep.mrr_10 == pytest.approx(1.0 / 5.0)
    assert rep.mrr_100 == pytest.approx(1.0 / 5.0)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_vectorized_matches_scalar_oracle(seed):
    rng = np.random.default_rng(seed)
    nq, k = 5, 100
    gt = rng.permutation(10_000)[: nq * k].reshape(nq, k)
    # observed: partial overlap with GT in shuffled positions
    obs = gt.copy()
    for i in range(nq):
        rng.shuffle(obs[i])
        kill = rng.random(k) < 0.4
        obs[i][kill] = -rng.integers(1, 1_000_000, size=kill.sum())
    a = benchmark_results(obs, gt, k=k)
    b = benchmark_results_scalar(obs, gt, k=k)
    for f in ("recall_1", "recall_10", "recall_100"):
        assert getattr(a, f) == getattr(b, f)
    for f in ("mrr_1", "mrr_10", "mrr_100"):
        assert getattr(a, f) == pytest.approx(getattr(b, f))


def test_k_exceeds_gt_guard():
    gt = np.arange(50).reshape(1, 50)
    obs = np.arange(100).reshape(1, 100)
    with pytest.raises(ValueError):
        benchmark_results(obs, gt, k=100)


def test_duplicate_observed_ids_first_match_wins():
    """The reference breaks on first match — duplicates in observed results
    must credit the earliest rank only."""
    gt = np.arange(100).reshape(1, 100)
    obs = np.full((1, 100), -1)
    obs[0, 3] = 0
    obs[0, 7] = 0  # duplicate later
    rep = benchmark_results(obs, gt, k=100)
    srep = benchmark_results_scalar(obs, gt, k=100)
    assert rep.mrr_10 == pytest.approx(1.0 / 4.0)
    assert rep.mrr_10 == pytest.approx(srep.mrr_10)
