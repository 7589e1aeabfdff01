"""Pallas fused scan kernel vs the XLA scan (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from prefhetch_tpu.data.synthetic import make_clustered_dataset
from prefhetch_tpu.index.build import build_ivf_index
from prefhetch_tpu.ops.distances import rank_centroids
from prefhetch_tpu.ops.pallas_scan import pallas_slab_distances
from prefhetch_tpu.ops.scan import coarse_scan_flat
from prefhetch_tpu.utils.config import IndexParams


@pytest.fixture(scope="module")
def built():
    data = make_clustered_dataset(
        nbase=2048, ntrain=4000, nquery=8, d=128, n_clusters=30, gt_k=10, seed=1
    )
    idx = build_ivf_index(
        data["train"], data["base"],
        IndexParams(d=128, nlist=16, pq_m=0, kmeans_iters=5),
    )
    return idx, data


def test_pallas_matches_xla_scan(built):
    idx, data = built
    q = jnp.asarray(data["query"], jnp.float32)
    _, probe = rank_centroids(q, idx.centroids, 4)
    ref = coarse_scan_flat(
        idx.list_vectors, idx.list_ids, idx.list_sizes, q, probe,
        idx.list_norms,
    )
    got = pallas_slab_distances(
        idx.list_vectors, idx.list_norms, idx.list_sizes, q, probe,
        interpret=True,
    )
    m = np.asarray(ref.mask)
    np.testing.assert_allclose(
        np.asarray(got)[m], np.asarray(ref.distances)[m], rtol=1e-5
    )
    assert np.all(np.asarray(got)[~m] > 1e37)   # PAD at invalid lanes


def test_pallas_positional_id_resolution(built):
    """pos → (probe slot, lane) → global id must match take_along on the
    full ids tensor (the trick bench.py's tail uses)."""
    idx, data = built
    q = jnp.asarray(data["query"], jnp.float32)
    _, probe = rank_centroids(q, idx.centroids, 4)
    lmax = idx.lmax
    dist = pallas_slab_distances(
        idx.list_vectors, idx.list_norms, idx.list_sizes, q, probe,
        interpret=True,
    )
    from prefhetch_tpu.ops.topk import topk_select

    _, pos = topk_select(dist, 30)
    probe_sel = jnp.take_along_axis(probe, pos // lmax, axis=1)
    cand = np.asarray(idx.list_ids)[np.asarray(probe_sel), np.asarray(pos) % lmax]

    ref = coarse_scan_flat(
        idx.list_vectors, idx.list_ids, idx.list_sizes, q, probe,
        idx.list_norms,
    )
    ref_cand = np.take_along_axis(np.asarray(ref.ids), np.asarray(pos), axis=1)
    np.testing.assert_array_equal(cand, ref_cand)


def test_pq_onehot_nq_not_multiple_of_block():
    """pallas_pq_onehot_distances must pad (not assert) when nq is not a
    multiple of the query block nqb (advisor r02)."""
    import numpy as np

    from prefhetch_tpu.ops.pallas_scan import pallas_pq_onehot_distances

    rng = np.random.default_rng(0)
    ntiles, T, M, ksub, nlist = 4, 8, 4, 16, 3
    codes = rng.integers(0, ksub, (ntiles + 1, T, M), dtype=np.uint8)
    nq = 3                                   # not a multiple of nqb=2
    lutq = rng.normal(size=(nq, M * ksub)).astype(np.float32)
    lutp = rng.normal(size=(nlist, M * ksub)).astype(np.float32)
    tile_list = rng.integers(0, nlist, ntiles + 1).astype(np.int32)
    union = np.arange(3, dtype=np.int32)
    out = np.asarray(pallas_pq_onehot_distances(
        jnp.asarray(codes), jnp.asarray(lutq), jnp.asarray(lutp),
        jnp.asarray(tile_list), jnp.asarray(union), nqb=2, interpret=True,
    )).reshape(nq, 3, T)
    for qi in range(nq):
        for ui, u in enumerate(union):
            lut = (lutq[qi] + lutp[tile_list[u]]).astype(np.float32)
            exp = np.array([
                sum(lut[m * ksub + codes[u, t, m]] for m in range(M))
                for t in range(T)
            ])
            np.testing.assert_allclose(out[qi, ui], exp, rtol=2e-2, atol=2e-2)
