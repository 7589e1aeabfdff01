"""Sharded engine driven through the real HTTP wire (round-2 verdict #8).

enable_sharding (engine/server.py) was previously only exercised in-process;
here the list-sharded engine serves the reference JSON protocol over both
frontends and every response body must be BYTE-identical to the unsharded
engine's (same dispatcher, same wire encoding — sharding must be invisible
at the protocol boundary)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from prefhetch_tpu.data.synthetic import make_clustered_dataset
from prefhetch_tpu.engine.server import QueryEngine
from prefhetch_tpu.index.build import build_ivf_index
from prefhetch_tpu.serve.http_server import make_server
from prefhetch_tpu.utils.config import (
    IndexParams, PipelineConfig, ProtocolParams,
)


@pytest.fixture(scope="module")
def setup():
    data = make_clustered_dataset(
        nbase=2048, ntrain=4000, nquery=8, d=32, n_clusters=40, gt_k=50,
        seed=9,
    )
    cfg = PipelineConfig(
        index=IndexParams(d=32, nlist=16, pq_m=8, pq_nbits=8,
                          kmeans_iters=8, pq_kmeans_iters=8),
        protocol=ProtocolParams(nprobe=6, coarse_probe=40, k=10, nquery=4),
        nbase=2048,
    )
    idx = build_ivf_index(data["train"], data["base"], cfg.index)

    plain = QueryEngine(cfg)
    plain.set_index(idx, data["base"])
    sharded = QueryEngine(cfg)
    sharded.set_index(idx, data["base"])
    sharded.enable_sharding(8)
    return data, plain, sharded


def _serve(engine):
    srv = make_server(engine, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, port


def _post_raw(port, route, payload) -> bytes:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{route}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.read()


def _get_raw(port, route) -> bytes:
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{route}", timeout=120
    ) as r:
        return r.read()


def test_sharded_http_responses_byte_identical(setup):
    data, plain, sharded = setup
    q = data["query"][:4].astype(np.float32)
    cents = np.asarray(plain.retrieve_centroids())
    d2 = ((q[:, None, :] - cents[None]) ** 2).sum(-1)
    probes = np.argsort(d2, axis=1)[:, :6]

    s_plain, p_plain = _serve(plain)
    s_shard, p_shard = _serve(sharded)
    try:
        assert _get_raw(p_plain, "/query") == _get_raw(p_shard, "/query")

        coarse_req = {
            "preciseQuery": q.tolist(),
            "nearestCentroidIndexes": probes.tolist(),
        }
        body_p = json.loads(_post_raw(p_plain, "/coarsesearch", coarse_req))
        body_s = json.loads(_post_raw(p_shard, "/coarsesearch", coarse_req))
        # candidate identity/order/counts must be EXACT; distances agree to
        # f32 formulation tolerance (shard-local shapes legally select a
        # different matmul layout in coarse_scan_flat, changing the f32
        # summation order — see ops/scan.py branch comment)
        assert body_p["coarseVectorIndexes"] == body_s["coarseVectorIndexes"]
        assert body_p["listSizesPerQuery"] == body_s["listSizesPerQuery"]
        np.testing.assert_allclose(
            np.asarray(body_s["coarseDistanceScores"]),
            np.asarray(body_p["coarseDistanceScores"]),
            rtol=1e-5,
        )

        cand = np.asarray(
            body_p["coarseVectorIndexes"][:40], np.int64
        )[None].repeat(4, 0)
        precise_req = {
            "preciseQuery": q.tolist(),
            "nearestCoarseVectorIndexes": cand.tolist(),
        }
        ps_p = json.loads(_post_raw(p_plain, "/precisesearch", precise_req))
        ps_s = json.loads(_post_raw(p_shard, "/precisesearch", precise_req))
        np.testing.assert_allclose(
            np.asarray(ps_s["preciseDistanceScores"]),
            np.asarray(ps_p["preciseDistanceScores"]),
            rtol=1e-5,
        )

        fetch_req = {
            "nearestPreciseVectorIndexes": cand[:, :10].tolist()
        }
        assert (
            _post_raw(p_plain, "/precise-vector-pir", fetch_req)
            == _post_raw(p_shard, "/precise-vector-pir", fetch_req)
        ), "sharded fetch response differs"
    finally:
        s_plain.shutdown()
        s_shard.shutdown()
