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


def test_hard_dataset_is_hard():
    """Overlapping workload: exact-IVF probing recall must be < 1 while the
    data still has usable cluster structure (recall well above random)."""
    import numpy as np

    from prefhetch_tpu.data.synthetic import make_hard_dataset
    from prefhetch_tpu.index.build import build_ivf_index
    from prefhetch_tpu.utils.config import IndexParams

    data = make_hard_dataset(
        nbase=20000, ntrain=20000, nquery=16, d=32, n_clusters=64,
        gt_k=20, seed=5,
    )
    params = IndexParams(d=32, nlist=64, pq_m=0, kmeans_iters=8)
    idx = build_ivf_index(data["train"], data["base"], params)
    centroids = np.asarray(idx.centroids)
    list_ids = np.asarray(idx.list_ids)
    list_sizes = np.asarray(idx.list_sizes)
    hits = 0
    nprobe, k = 4, 10
    for qi, q in enumerate(data["query"]):
        d2c = ((centroids - q) ** 2).sum(-1)
        probes = np.argsort(d2c)[:nprobe]
        cand = np.concatenate([list_ids[p, : list_sizes[p]] for p in probes])
        d2 = ((data["base"][cand] - q) ** 2).sum(-1)
        top = cand[np.argsort(d2, kind="stable")[:k]]
        hits += len(np.intersect1d(top, data["groundtruth"][qi, :k]))
    r = hits / (k * len(data["query"]))
    assert 0.3 < r < 0.999, f"hard-set oracle recall {r} out of expected band"
