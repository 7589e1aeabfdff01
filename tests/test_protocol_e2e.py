"""End-to-end protocol test: real HTTP server + client pipeline over
localhost — the reference's only validation mode (README run flow), now
automated. Also golden-shape checks for all four routes (SURVEY.md §2.2)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from prefhetch_tpu.client.pipeline import ClientPipeline
from prefhetch_tpu.data.synthetic import write_sift_style_dataset
from prefhetch_tpu.engine.server import QueryEngine
from prefhetch_tpu.serve.http_server import make_server
from prefhetch_tpu.utils.config import IndexParams, PipelineConfig, ProtocolParams


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    ds = tmp_path_factory.mktemp("ds")
    write_sift_style_dataset(
        str(ds), prefix="syn", nbase=2000, ntrain=4000, nquery=10, d=32,
        n_clusters=40, gt_k=100, seed=7,
    )
    import os

    cfg = PipelineConfig(
        index=IndexParams(d=32, nlist=16, pq_m=8, pq_nbits=8,
                          kmeans_iters=8, pq_kmeans_iters=8),
        protocol=ProtocolParams(nprobe=8, coarse_probe=60, k=20, nquery=4),
        nbase=2000,
        train_path=os.path.join(str(ds), "syn_learn.fvecs"),
        base_path=os.path.join(str(ds), "syn_base.fvecs"),
        query_path=os.path.join(str(ds), "syn_query.fvecs"),
        groundtruth_path=os.path.join(str(ds), "syn_groundtruth.ivecs"),
        port=0,
    )
    engine = QueryEngine(cfg, index_dir=str(tmp_path_factory.mktemp("idx")))
    engine.init_index()
    srv = make_server(engine, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield cfg, engine, f"http://127.0.0.1:{port}/"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_get_query_route_shape(served):
    cfg, engine, addr = served
    with urllib.request.urlopen(addr + "query", timeout=60) as r:
        body = json.loads(r.read())
    # bare [nlist][d] array (reference: Query.cc:17-23)
    assert isinstance(body, list) and len(body) == 16
    assert len(body[0]) == 32


def test_coarsesearch_route_fields(served):
    cfg, engine, addr = served
    q = np.zeros((2, 32), np.float32)
    probes = [[0, 1, 2], [3, 4, 5]]
    status, resp = _post(addr + "coarsesearch",
                         {"preciseQuery": q.tolist(),
                          "nearestCentroidIndexes": probes})
    assert status == 200
    assert set(resp) == {"coarseDistanceScores", "coarseVectorIndexes",
                         "listSizesPerQuery"}
    assert len(resp["listSizesPerQuery"]) == 2
    assert len(resp["coarseDistanceScores"]) == sum(resp["listSizesPerQuery"])
    assert len(resp["coarseVectorIndexes"]) == sum(resp["listSizesPerQuery"])


def test_precisesearch_route_fields(served):
    cfg, engine, addr = served
    q = np.zeros((2, 32), np.float32)
    cand = np.arange(10).reshape(1, 10).repeat(2, axis=0)
    status, resp = _post(addr + "precisesearch",
                         {"preciseQuery": q.tolist(),
                          "nearestCoarseVectorIndexes": cand.tolist()})
    assert status == 200
    assert set(resp) == {"preciseDistanceScores"}
    assert np.asarray(resp["preciseDistanceScores"]).shape == (2, 10)


def test_pir_route_fields(served):
    cfg, engine, addr = served
    ids = [[0, 1], [2, 3]]
    status, resp = _post(addr + "precise-vector-pir",
                         {"nearestPreciseVectorIndexes": ids})
    assert status == 200
    assert set(resp) == {"queryResults"}
    out = np.asarray(resp["queryResults"])
    assert out.shape == (2, 2, 32)
    np.testing.assert_allclose(out, np.asarray(engine.base)[np.asarray(ids)])


def test_malformed_requests_rejected(served):
    cfg, engine, addr = served
    # bad json
    req = urllib.request.Request(addr + "coarsesearch", data=b"{not json",
                                 headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400
    # out-of-range centroid
    status = None
    try:
        _post(addr + "coarsesearch",
              {"preciseQuery": [[0.0] * 32], "nearestCentroidIndexes": [[999]]})
    except urllib.error.HTTPError as err:
        status = err.code
    assert status == 400
    # unknown route
    try:
        _post(addr + "nope", {})
    except urllib.error.HTTPError as err:
        assert err.code == 404


def test_full_client_pipeline_e2e(served):
    """Stages 1-9 over real HTTP: the complete triage protocol."""
    cfg, engine, addr = served
    client = ClientPipeline(cfg, server_addr=addr)
    vectors, top_ids = client.run()
    k = cfg.protocol.k
    assert top_ids.shape == (4, k)
    assert vectors.shape == (4, k, 32)

    # retrieved vectors must be the actual base rows
    base = np.asarray(engine.base)
    np.testing.assert_allclose(vectors, base[top_ids], atol=1e-4)

    # recall scoring (stage 9): IVFPQ triage with nprobe=8/16 should find
    # the true NN for most queries
    rep = client.benchmark_results(top_ids)
    assert rep.recall_1 >= 0.5
    # and top-k ids must be sorted by true distance
    q = client.get_query()
    d_top = ((base[top_ids] - q[:, None, :]) ** 2).sum(-1)
    assert np.all(np.diff(d_top, axis=1) >= -1e-3)


def test_client_guard_coarse_probe(served):
    """Client must error when a query's candidate pool < COARSE_PROBE
    (reference: client_lib.cpp:132-137)."""
    cfg, engine, addr = served
    import dataclasses

    big_cfg = dataclasses.replace(
        cfg, protocol=ProtocolParams(nprobe=1, coarse_probe=1000, k=20, nquery=4)
    )
    client = ClientPipeline(big_cfg, server_addr=addr)
    q = client.get_query()
    cent = client.get_centroids()
    _, sorted_cent = client.sort_nearest_centroids(q, cent)
    cs, ci, sizes = client.get_coarse_scores(sorted_cent, q)
    with pytest.raises(RuntimeError, match="lesser than COARSE_PROBE"):
        client.compute_nearest_coarse_vectors(cs, ci, sizes)
