"""IVF index build / scan / rerank / save-load tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from prefhetch_tpu.index.build import build_ivf_index, load_index, save_index
from prefhetch_tpu.models.flat import FlatL2
from prefhetch_tpu.models.ivf import IVFFlat, IVFPQ, rerank_exact
from prefhetch_tpu.ops.distances import rank_centroids
from prefhetch_tpu.ops.topk import masked_topk_smallest
from prefhetch_tpu.utils.config import IndexParams


def np_sq_l2(q, x):
    return ((q[:, None, :].astype(np.float64) - x[None, :, :]) ** 2).sum(-1)


@pytest.fixture(scope="module")
def built_flat(small_dataset_mod):
    d = small_dataset_mod
    params = IndexParams(d=32, nlist=16, pq_m=0, kmeans_iters=10)
    return build_ivf_index(d["train"], d["base"], params), d


@pytest.fixture(scope="module")
def small_dataset_mod():
    from prefhetch_tpu.data.synthetic import make_clustered_dataset

    return make_clustered_dataset(
        nbase=2000, ntrain=4000, nquery=20, d=32, n_clusters=40, gt_k=100, seed=7
    )


def test_build_invariants(built_flat):
    idx, d = built_flat
    sizes = np.asarray(idx.list_sizes)
    assert sizes.sum() == 2000
    ids = np.asarray(idx.list_ids)
    valid_ids = ids[ids >= 0]
    assert len(valid_ids) == 2000
    assert sorted(valid_ids.tolist()) == list(range(2000))  # every vector indexed once
    # stored vectors match base rows
    lv = np.asarray(idx.list_vectors)
    for l in [0, 5, 15]:
        for r in range(min(3, sizes[l])):
            np.testing.assert_array_equal(lv[l, r], d["base"][ids[l, r]])


def test_assignment_is_nearest_centroid(built_flat):
    idx, d = built_flat
    ids = np.asarray(idx.list_ids)
    cent = np.asarray(idx.centroids)
    # For a sample of lists, every member's nearest centroid is that list
    a = np_sq_l2(d["base"], cent).argmin(axis=1)
    for l in range(16):
        members = ids[l][ids[l] >= 0]
        assert np.all(a[members] == l)


def test_scan_flat_distances_exact(built_flat):
    idx, d = built_flat
    q = d["query"][:4]
    _, probe = rank_centroids(jnp.asarray(q), idx.centroids, 4)
    from prefhetch_tpu.ops.scan import coarse_scan_flat

    res = coarse_scan_flat(
        idx.list_vectors, idx.list_ids, idx.list_sizes,
        jnp.asarray(q), probe,
    )
    dist = np.asarray(res.distances)
    ids = np.asarray(res.ids)
    mask = np.asarray(res.mask)
    counts = np.asarray(res.counts)
    assert (mask.sum(axis=1) == counts).all()
    # spot check: every valid candidate's distance == exact L2 to that base row
    for qi in range(4):
        v = np.where(mask[qi])[0][:50]
        ref = ((d["base"][ids[qi, v]] - q[qi]) ** 2).sum(-1)
        np.testing.assert_allclose(dist[qi, v], ref, rtol=1e-4, atol=0.5)


def test_scan_candidate_order_is_probe_then_storage(built_flat):
    """Wire-contract: candidates appear probe-order-major, storage-order
    within each list (SURVEY.md §2.3)."""
    idx, d = built_flat
    q = d["query"][:2]
    _, probe = rank_centroids(jnp.asarray(q), idx.centroids, 3)
    res = IVFFlat.load.__self__ if False else None  # noqa — clarity only
    from prefhetch_tpu.ops.scan import coarse_scan_flat

    r = coarse_scan_flat(idx.list_vectors, idx.list_ids, idx.list_sizes,
                         jnp.asarray(q), probe)
    ids, mask = np.asarray(r.ids), np.asarray(r.mask)
    probe_np = np.asarray(probe)
    lmax = idx.lmax
    lids_np = np.asarray(idx.list_ids)
    sizes_np = np.asarray(idx.list_sizes)
    for qi in range(2):
        expect = np.concatenate([
            lids_np[p][: sizes_np[p]] for p in probe_np[qi]
        ])
        got = ids[qi][mask[qi]]
        np.testing.assert_array_equal(got, expect)


def test_ivfflat_end_to_end_recall(small_dataset_mod):
    d = small_dataset_mod
    m = IVFFlat(IndexParams(d=32, nlist=16, pq_m=0, kmeans_iters=10))
    m.train_add(d["train"], d["base"])
    m.nprobe = 8
    _, ids = m.search(d["query"], k=10)
    gt1 = d["groundtruth"][:, 0]
    hit = (ids == gt1[:, None]).any(axis=1).mean()
    assert hit > 0.9  # nprobe=8/16 lists should nearly always contain the NN


def test_ivfpq_adc_beats_random(small_dataset_mod):
    d = small_dataset_mod
    m = IVFPQ(IndexParams(d=32, nlist=16, pq_m=8, pq_nbits=8,
                          kmeans_iters=10, pq_kmeans_iters=10))
    m.train_add(d["train"], d["base"])
    m.nprobe = 8
    _, ids = m.search(d["query"], k=10, coarse_probe=50)
    gt1 = d["groundtruth"][:, 0]
    hit = (ids == gt1[:, None]).any(axis=1).mean()
    assert hit > 0.6  # ADC is approximate but must find most NNs in top-10


def test_pq_adc_distance_correlates_with_exact(small_dataset_mod):
    """ADC distance must approximate true residual distance: rank correlation
    with exact L2 should be strong on candidates from probed lists."""
    d = small_dataset_mod
    m = IVFPQ(IndexParams(d=32, nlist=16, pq_m=8, pq_nbits=8,
                          kmeans_iters=10, pq_kmeans_iters=10))
    m.train_add(d["train"], d["base"])
    q = d["query"][:1]
    _, probe = rank_centroids(jnp.asarray(q), m.index.centroids, 8)
    res = m.coarse_scan(q, probe)
    mask = np.asarray(res.mask)[0]
    ids = np.asarray(res.ids)[0][mask]
    adc = np.asarray(res.distances)[0][mask]
    exact = ((d["base"][ids] - q[0]) ** 2).sum(-1)
    rho = np.corrcoef(adc, exact)[0, 1]
    assert rho > 0.95


def test_pq_dense_recon_matches_lut_adc(small_dataset_mod):
    """The bf16 reconstructed-vector scan (MXU fast path) must agree with
    the exact LUT ADC distances within bf16 rounding."""
    d = small_dataset_mod
    m = IVFPQ(IndexParams(d=32, nlist=16, pq_m=8, pq_nbits=8,
                          kmeans_iters=10, pq_kmeans_iters=10))
    m.train_add(d["train"], d["base"])
    q = d["query"][:4]
    _, probe = rank_centroids(jnp.asarray(q, jnp.float32), m.index.centroids, 6)
    from prefhetch_tpu.ops.scan import coarse_scan_flat, coarse_scan_pq

    idx = m.index
    dense = coarse_scan_flat(idx.list_recon, idx.list_ids, idx.list_sizes,
                             jnp.asarray(q, jnp.float32), probe)
    lut = coarse_scan_pq(idx.centroids, idx.list_codes, idx.list_ids,
                         idx.list_sizes, idx.codebooks,
                         jnp.asarray(q, jnp.float32), probe, by_residual=True)
    mask = np.asarray(lut.mask)
    a = np.asarray(dense.distances)[mask]
    b = np.asarray(lut.distances)[mask]
    # bf16 has 8 mantissa bits → ~0.4% relative on SIFT-scale distances
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=60.0)
    # ordering must be essentially preserved (rank correlation)
    rho = np.corrcoef(a, b)[0, 1]
    assert rho > 0.9999


def test_rerank_exact_matches_numpy(small_dataset_mod, rng):
    d = small_dataset_mod
    q = d["query"][:3]
    cand = rng.integers(0, 2000, size=(3, 20)).astype(np.int32)
    out = rerank_exact(d["base"], q, cand)
    for i in range(3):
        ref = ((d["base"][cand[i]] - q[i]) ** 2).sum(-1)
        np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=0.5)


def test_save_load_roundtrip(tmp_path, built_flat):
    idx, d = built_flat
    p = save_index(idx, str(tmp_path))
    idx2 = load_index(p)
    np.testing.assert_array_equal(np.asarray(idx.centroids), np.asarray(idx2.centroids))
    np.testing.assert_array_equal(np.asarray(idx.list_ids), np.asarray(idx2.list_ids))
    assert idx2.params == idx.params


def test_save_load_pq_uint8_on_disk(tmp_path, small_dataset_mod):
    d = small_dataset_mod
    m = IVFPQ(IndexParams(d=32, nlist=8, pq_m=8, pq_nbits=8,
                          kmeans_iters=5, pq_kmeans_iters=5))
    m.train_add(d["train"][:1000], d["base"][:500])
    p = m.save(str(tmp_path))
    with np.load(p) as z:
        assert z["list_codes"].dtype == np.uint8  # index-memory parity
    m2 = IVFPQ.load(p)
    np.testing.assert_array_equal(
        np.asarray(m.index.list_codes), np.asarray(m2.index.list_codes)
    )


def test_flatl2_oracle(small_dataset_mod):
    d = small_dataset_mod
    f = FlatL2(32)
    f.add(d["base"])
    _, ids = f.search(d["query"], k=10)
    np.testing.assert_array_equal(ids[:, 0], d["groundtruth"][:, 0])
