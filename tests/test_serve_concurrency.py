"""Concurrency + observability tests for the HTTP server.

The reference shares a mutable Server singleton across Drogon's handler
threads with no locking (SURVEY.md §5.2); here concurrent correctness is an
explicit, tested property, and /stats exposes server-side latency the
reference never measured."""

import json
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from prefhetch_tpu.data.synthetic import write_sift_style_dataset
from prefhetch_tpu.engine.server import QueryEngine
from prefhetch_tpu.serve.http_server import make_server
from prefhetch_tpu.utils.config import IndexParams, PipelineConfig, ProtocolParams


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    ds = tmp_path_factory.mktemp("ds")
    write_sift_style_dataset(
        str(ds), prefix="syn", nbase=1000, ntrain=2000, nquery=10, d=16,
        n_clusters=16, gt_k=50, seed=3,
    )
    import os

    cfg = PipelineConfig(
        index=IndexParams(d=16, nlist=8, pq_m=0, kmeans_iters=5),
        protocol=ProtocolParams(nprobe=4, coarse_probe=30, k=10, nquery=4),
        nbase=1000,
        train_path=os.path.join(str(ds), "syn_learn.fvecs"),
        base_path=os.path.join(str(ds), "syn_base.fvecs"),
        query_path=os.path.join(str(ds), "syn_query.fvecs"),
        groundtruth_path=os.path.join(str(ds), "syn_groundtruth.ivecs"),
    )
    engine = QueryEngine(cfg, index_dir=str(tmp_path_factory.mktemp("idx")))
    engine.init_index()
    srv = make_server(engine, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield engine, f"http://127.0.0.1:{port}/"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_concurrent_mixed_requests_consistent(served):
    """32 parallel requests across all routes must return identical results
    to sequential execution (no cross-request state bleed)."""
    engine, addr = served
    q = np.asarray(engine.base)[:2].tolist()
    probes = [[0, 1, 2, 3], [4, 5, 6, 7]]

    def do_coarse(_):
        return _post(addr + "coarsesearch",
                     {"preciseQuery": q, "nearestCentroidIndexes": probes})

    def do_precise(_):
        return _post(addr + "precisesearch",
                     {"preciseQuery": q,
                      "nearestCoarseVectorIndexes": [[0, 1, 2], [3, 4, 5]]})

    seq_c = do_coarse(0)
    seq_p = do_precise(0)
    with ThreadPoolExecutor(max_workers=8) as ex:
        results_c = list(ex.map(do_coarse, range(16)))
        results_p = list(ex.map(do_precise, range(16)))
    for r in results_c:
        assert r == seq_c
    for r in results_p:
        assert r == seq_p


def test_stats_endpoint(served):
    engine, addr = served
    with urllib.request.urlopen(addr + "healthz", timeout=30) as r:
        json.loads(r.read())
    with urllib.request.urlopen(addr + "stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert any(route.startswith("POST /coarsesearch") for route in stats)
    entry = stats["POST /coarsesearch"]
    assert entry["count"] >= 1
    assert entry["mean_ms"] > 0
