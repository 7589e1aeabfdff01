"""In-process engine tests: the 4 services, ragged wire layout, warm/cold
index lifecycle."""

import numpy as np
import pytest

from prefhetch_tpu.data.synthetic import write_sift_style_dataset
from prefhetch_tpu.data.io import read_fvecs, read_ivecs
from prefhetch_tpu.engine.server import QueryEngine
from prefhetch_tpu.utils.config import IndexParams, PipelineConfig, ProtocolParams


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    write_sift_style_dataset(
        str(d), prefix="syn", nbase=2000, ntrain=4000, nquery=10, d=32,
        n_clusters=40, gt_k=100, seed=7,
    )
    return str(d)


def make_config(dataset_dir, **overrides):
    import os

    defaults = dict(
        index=IndexParams(d=32, nlist=16, pq_m=8, pq_nbits=8,
                          kmeans_iters=8, pq_kmeans_iters=8),
        protocol=ProtocolParams(nprobe=6, coarse_probe=60, k=20, nquery=4),
        nbase=2000,
        train_path=os.path.join(dataset_dir, "syn_learn.fvecs"),
        base_path=os.path.join(dataset_dir, "syn_base.fvecs"),
        query_path=os.path.join(dataset_dir, "syn_query.fvecs"),
        groundtruth_path=os.path.join(dataset_dir, "syn_groundtruth.ivecs"),
    )
    defaults.update(overrides)
    return PipelineConfig(**defaults)


@pytest.fixture(scope="module")
def engine(dataset_dir, tmp_path_factory):
    cfg = make_config(dataset_dir)
    eng = QueryEngine(cfg, index_dir=str(tmp_path_factory.mktemp("idx")))
    eng.init_index()
    return eng


def test_cold_build_then_warm_load(dataset_dir, tmp_path):
    cfg = make_config(dataset_dir)
    e1 = QueryEngine(cfg, index_dir=str(tmp_path))
    e1.init_index()  # cold: trains and caches
    import os

    artifact = os.path.join(str(tmp_path), cfg.index.artifact_name())
    assert os.path.exists(artifact)
    e2 = QueryEngine(cfg, index_dir=str(tmp_path))
    e2.init_index()  # warm: loads
    np.testing.assert_array_equal(
        np.asarray(e1.index.centroids), np.asarray(e2.index.centroids)
    )


def test_retrieve_centroids(engine):
    c = engine.retrieve_centroids()
    assert c.shape == (16, 32)
    assert np.isfinite(c).all()


def test_coarse_search_ragged_layout(engine, dataset_dir):
    q = read_fvecs(engine.config.query_path)[:4]
    # client-side centroid ranking
    cent = engine.retrieve_centroids()
    d2 = ((q[:, None, :] - cent[None]) ** 2).sum(-1)
    probes = np.argsort(d2, axis=1)[:, :6]
    scores, indexes, sizes = engine.coarse_search(q, probes)
    assert scores.shape == indexes.shape
    assert sizes.shape == (4,)
    assert scores.shape[0] == sizes.sum()
    # candidate ids are valid and unique per query
    off = 0
    for s in sizes:
        ids_q = indexes[off : off + s]
        assert len(np.unique(ids_q)) == s
        assert ids_q.min() >= 0 and ids_q.max() < 2000
        off += s


def test_coarse_candidates_come_from_probed_lists(engine):
    q = read_fvecs(engine.config.query_path)[:2]
    cent = engine.retrieve_centroids()
    d2 = ((q[:, None, :] - cent[None]) ** 2).sum(-1)
    probes = np.argsort(d2, axis=1)[:, :6]
    _, indexes, sizes = engine.coarse_search(q, probes)
    lids = np.asarray(engine.index.list_ids)
    off = 0
    for qi, s in enumerate(sizes):
        ids_q = set(indexes[off : off + s].tolist())
        members = set()
        for p in probes[qi]:
            members.update(lids[p][lids[p] >= 0].tolist())
        assert ids_q == members
        off += s


def test_precise_search_exact(engine):
    q = read_fvecs(engine.config.query_path)[:3]
    base = np.asarray(engine.base)
    cand = np.arange(60).reshape(1, 60).repeat(3, axis=0)
    scores = engine.precise_search(q, cand)
    ref = ((base[cand[0]][None] - q[:, None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(scores, ref, rtol=1e-4, atol=0.5)


def test_precise_vector_pir_gathers_raw(engine):
    base = np.asarray(engine.base)
    ids = np.array([[0, 5, 7], [1999, 3, 3]])
    out = engine.precise_vector_pir(ids)
    np.testing.assert_array_equal(out, base[ids])


def test_tiled_pallas_serving_branch_equivalent(engine):
    """CI coverage of the production TPU serving composition
    (engine.coarse_search tiled+Pallas branch): force_tiled runs the tile
    expansion + Pallas fused scan (interpret mode on CPU) + host ragged
    resolve, and the ragged wire output must match the padded-scan branch
    candidate-for-candidate."""
    q = read_fvecs(engine.config.query_path)[:4]
    cent = engine.retrieve_centroids()
    d2 = ((q[:, None, :] - cent[None]) ** 2).sum(-1)
    probes = np.argsort(d2, axis=1)[:, :6]

    ref_scores, ref_idx, ref_sizes = engine.coarse_search(q, probes)
    try:
        engine.force_tiled = True
        got_scores, got_idx, got_sizes = engine.coarse_search(q, probes)
    finally:
        engine.force_tiled = False

    assert engine._tiled_view is not None  # the branch actually ran
    np.testing.assert_array_equal(got_sizes, ref_sizes)
    np.testing.assert_array_equal(got_idx, ref_idx)
    np.testing.assert_allclose(got_scores, ref_scores, rtol=1e-3, atol=0.5)
