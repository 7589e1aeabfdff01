"""Tiled-view parity: the tiled scan must reproduce the padded scan's
candidate set and distances exactly (modulo candidate ordering within a
query, which stays probe-major / storage-order by construction)."""

import numpy as np
import jax.numpy as jnp
import pytest

from prefhetch_tpu.data.synthetic import make_clustered_dataset
from prefhetch_tpu.index.build import build_ivf_index
from prefhetch_tpu.index.tiling import build_tiled_view
from prefhetch_tpu.ops.distances import rank_centroids
from prefhetch_tpu.ops.pallas_scan import pallas_slab_distances
from prefhetch_tpu.ops.scan import coarse_scan_flat
from prefhetch_tpu.utils.config import IndexParams


@pytest.fixture(scope="module")
def built():
    data = make_clustered_dataset(
        nbase=3000, ntrain=5000, nquery=6, d=128, n_clusters=24, gt_k=10, seed=4
    )
    idx = build_ivf_index(
        data["train"], data["base"],
        IndexParams(d=128, nlist=16, pq_m=0, kmeans_iters=6),
    )
    return idx, data


def test_tiled_layout_invariants(built):
    idx, _ = built
    view = build_tiled_view(idx, tile=128)
    sizes = np.asarray(idx.list_sizes)
    # every vector appears exactly once across tiles (excluding the empty tile)
    ids = view.tile_ids_np[:-1]
    valid = ids[ids >= 0]
    assert sorted(valid.tolist()) == list(range(3000))
    # per-list tile counts cover the list sizes
    assert np.array_equal(
        view.tile_count_np, -(-sizes // view.tile)
    )
    # reserved empty tile has zero size
    assert int(np.asarray(view.sizes)[-1]) == 0


def test_tiled_scan_matches_padded(built):
    idx, data = built
    view = build_tiled_view(idx, tile=128)
    q = jnp.asarray(data["query"], jnp.float32)
    _, probe = rank_centroids(q, idx.centroids, 5)
    probe_np = np.asarray(probe)

    ref = coarse_scan_flat(
        idx.list_vectors, idx.list_ids, idx.list_sizes, q, probe,
        idx.list_norms,
    )
    tile_idx, totals = view.expand_probes(probe_np)
    dist = pallas_slab_distances(
        view.payload, view.norms, view.sizes, q, jnp.asarray(tile_idx),
        interpret=True,
    )
    # valid-candidate streams must match exactly, in order
    T = view.tile
    for qi in range(q.shape[0]):
        ref_m = np.asarray(ref.mask)[qi]
        ref_d = np.asarray(ref.distances)[qi][ref_m]
        ref_i = np.asarray(ref.ids)[qi][ref_m]
        got_mask = (
            np.arange(T)[None, :]
            < np.asarray(view.sizes)[tile_idx[qi]][:, None]
        ).reshape(-1)
        got_d = np.asarray(dist)[qi][got_mask]
        got_i = view.tile_ids_np[tile_idx[qi]].reshape(-1)[got_mask]
        assert got_d.shape == ref_d.shape
        np.testing.assert_array_equal(got_i, ref_i)
        np.testing.assert_allclose(got_d, ref_d, rtol=1e-5, atol=0.5)
        assert got_d.shape[0] == totals[qi]


def test_expand_probes_bucketing(built):
    idx, _ = built
    view = build_tiled_view(idx, tile=128)
    probes = np.array([[0, 1], [2, 3]])
    tile_idx, totals = view.expand_probes(probes, bucket=8)
    assert tile_idx.shape[1] % 8 == 0
    # pads are the empty tile
    n_real = view.tile_count_np[probes].sum(axis=1)
    for qi in range(2):
        assert np.all(tile_idx[qi, n_real[qi]:] == view.empty_tile)