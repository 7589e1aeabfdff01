"""Synthetic dataset generator tests."""

import numpy as np

from prefhetch_tpu.data.io import read_fvecs, read_ivecs
from prefhetch_tpu.data.synthetic import (
    brute_force_ground_truth,
    make_clustered_dataset,
    write_sift_style_dataset,
)


def test_shapes_and_range():
    d = make_clustered_dataset(nbase=500, ntrain=600, nquery=10, d=16, n_clusters=8, gt_k=20)
    assert d["base"].shape == (500, 16)
    assert d["train"].shape == (600, 16)
    assert d["query"].shape == (10, 16)
    assert d["groundtruth"].shape == (10, 20)
    assert d["base"].min() >= 0 and d["base"].max() <= 255
    # SIFT-like integer-valued floats
    assert np.all(d["base"] == np.round(d["base"]))


def test_ground_truth_is_exact():
    rng = np.random.default_rng(3)
    base = rng.normal(size=(300, 8)).astype(np.float32)
    query = rng.normal(size=(7, 8)).astype(np.float32)
    gt = brute_force_ground_truth(base, query, k=5)
    # naive check
    d2 = ((query[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    ref = np.argsort(d2, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(gt, ref)


def test_gt_first_neighbor_is_nearest():
    d = make_clustered_dataset(nbase=400, ntrain=500, nquery=5, d=8, n_clusters=5, gt_k=10)
    q, b, gt = d["query"], d["base"], d["groundtruth"]
    d2 = ((q[:, None, :].astype(np.float64) - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(gt[:, 0], d2.argmin(axis=1))


def test_write_reference_file_layout(tmp_path):
    paths = write_sift_style_dataset(
        str(tmp_path), prefix="syn", nbase=200, ntrain=300, nquery=4, d=8,
        n_clusters=4, gt_k=10,
    )
    assert paths["train"].endswith("syn_learn.fvecs")
    assert read_fvecs(paths["base"]).shape == (200, 8)
    assert read_ivecs(paths["groundtruth"]).shape == (4, 10)
