"""Model-family coverage: IVF-SQ8 and angular (cosine) metric."""

import numpy as np
import pytest

from prefhetch_tpu.data.synthetic import (
    make_angular_dataset,
    make_clustered_dataset,
    normalize_rows,
)
from prefhetch_tpu.models import IVFFlat, IVFPQ, IVFSQ8
from prefhetch_tpu.utils.config import IndexParams


@pytest.fixture(scope="module")
def data():
    return make_clustered_dataset(
        nbase=2000, ntrain=4000, nquery=20, d=32, n_clusters=40, gt_k=50, seed=7
    )


def test_sq8_recall_close_to_flat(data):
    params = dict(d=32, nlist=16, kmeans_iters=8)
    flat = IVFFlat(IndexParams(pq_m=0, **params))
    flat.train_add(data["train"], data["base"])
    flat.nprobe = 8
    _, flat_ids = flat.search(data["query"], k=10)

    sq = IVFSQ8(IndexParams(pq_m=0, quantizer="sq8", **params))
    sq.train_add(data["train"], data["base"])
    sq.nprobe = 8
    _, sq_ids = sq.search(data["query"], k=10)

    gt1 = data["groundtruth"][:, 0]
    flat_hit = (flat_ids == gt1[:, None]).any(axis=1).mean()
    sq_hit = (sq_ids == gt1[:, None]).any(axis=1).mean()
    assert sq_hit >= flat_hit - 0.1  # 8-bit loss must be tiny at SIFT scale


def test_sq8_distance_accuracy(data):
    sq = IVFSQ8(IndexParams(d=32, nlist=16, quantizer="sq8", kmeans_iters=8))
    sq.train_add(data["train"], data["base"])
    import jax.numpy as jnp

    from prefhetch_tpu.ops.distances import rank_centroids

    q = data["query"][:2]
    _, probe = rank_centroids(jnp.asarray(q, jnp.float32), sq.index.centroids, 4)
    res = sq.coarse_scan(q, probe)
    mask = np.asarray(res.mask)
    ids = np.asarray(res.ids)
    dist = np.asarray(res.distances)
    for qi in range(2):
        v = np.where(mask[qi])[0][:100]
        exact = ((data["base"][ids[qi, v]] - q[qi]) ** 2).sum(-1)
        # 8-bit quantization error: small relative to SIFT-scale distances
        np.testing.assert_allclose(dist[qi, v], exact, rtol=0.02, atol=100.0)


def test_sq8_save_load(tmp_path, data):
    sq = IVFSQ8(IndexParams(d=32, nlist=8, quantizer="sq8", kmeans_iters=5))
    sq.train_add(data["train"][:1000], data["base"][:500])
    p = sq.save(str(tmp_path))
    assert "SQ8" in p
    sq2 = IVFSQ8.load(p)
    np.testing.assert_array_equal(
        np.asarray(sq.index.list_sq), np.asarray(sq2.index.list_sq)
    )


def test_angular_metric_recall():
    data = make_angular_dataset(
        nbase=2000, ntrain=3000, nquery=20, d=25, n_clusters=50, gt_k=20, seed=9
    )
    m = IVFFlat(IndexParams(d=25, nlist=16, pq_m=0, metric="cosine",
                            kmeans_iters=8))
    m.train_add(data["train"], data["base"])
    m.nprobe = 8
    _, ids = m.search(data["query"], k=10)
    gt1 = data["groundtruth"][:, 0]
    hit = (ids == gt1[:, None]).any(axis=1).mean()
    assert hit > 0.85


def test_angular_unnormalized_queries_ok():
    """Cosine-metric models must normalize incoming queries themselves."""
    data = make_angular_dataset(
        nbase=1000, ntrain=2000, nquery=5, d=16, n_clusters=20, gt_k=10, seed=3
    )
    m = IVFFlat(IndexParams(d=16, nlist=8, pq_m=0, metric="cosine",
                            kmeans_iters=5))
    m.train_add(data["train"], data["base"])
    m.nprobe = 8
    _, a = m.search(data["query"], k=5)
    _, b = m.search(data["query"] * 37.5, k=5)  # arbitrary scaling
    np.testing.assert_array_equal(a, b)


def test_pq_cosine_combination():
    data = make_angular_dataset(
        nbase=2000, ntrain=3000, nquery=10, d=32, n_clusters=40, gt_k=20, seed=4
    )
    m = IVFPQ(IndexParams(d=32, nlist=16, pq_m=8, metric="cosine",
                          kmeans_iters=8, pq_kmeans_iters=8))
    m.train_add(data["train"], data["base"])
    m.nprobe = 8
    _, ids = m.search(data["query"], k=10, coarse_probe=50)
    gt1 = data["groundtruth"][:, 0]
    assert (ids == gt1[:, None]).any(axis=1).mean() > 0.6
