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


def test_sharded_tiled_routes_byte_identical(setup):
    """r04 (VERDICT r03 #4): the PRODUCTION tiled formulations — binary
    tiled coarse wire, server-select top-k, and the fused one-round
    /search — run sharded (tile-sharded union scan + row-sharded re-rank,
    parallel/sharded.py) and must return BYTE-identical arrays to the
    unsharded engine: every (query, slot) distance has exactly one tile
    owner, so masked-psum combination reproduces the single-device scan
    bit-for-bit."""
    data, plain, sharded = setup
    q = data["query"][:4].astype(np.float32)
    cents = np.asarray(plain.retrieve_centroids())
    d2 = ((q[:, None, :] - cents[None]) ** 2).sum(-1)
    probes = np.argsort(d2, axis=1)[:, :6]

    tp = plain.coarse_search_tiled(q, probes)
    ts = sharded.coarse_search_tiled(q, probes)
    for name, a, b in zip(
        ("tile_idx", "qdist", "dmin", "dstep", "counts"), tp, ts
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"tiled wire: {name}"
        )

    kp = plain.coarse_search_topk(q, probes, 40)
    ks = sharded.coarse_search_topk(q, probes, 40)
    for name, a, b in zip(("ids", "dists", "counts"), kp, ks):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"topk wire: {name}"
        )

    fi_p, fd_p = plain.search_fused(q, probes, 10)
    fi_s, fd_s = sharded.search_fused(q, probes, 10)
    np.testing.assert_array_equal(np.asarray(fi_p), np.asarray(fi_s))
    np.testing.assert_array_equal(np.asarray(fd_p), np.asarray(fd_s))


def test_sharded_fused_pruned_byte_identical(setup, monkeypatch):
    """The segment-PRUNED fused composition (engine _serve_prune_j > 0 —
    the serving-throughput lever) must also be byte-identical between the
    sharded and unsharded engines: sharded_union_scan_pruned's two psum
    combines (tile-min lower bounds, kept-tile extraction) reproduce the
    single-device union_scan_pruned bit-for-bit."""
    data, plain, sharded = setup
    monkeypatch.setenv("PFH_SERVE_PRUNE_J", "4")
    cfg = plain.config
    p2 = QueryEngine(cfg)
    p2.serve_tile = 64                  # many small tiles → mt > j
    p2.set_index(plain.index, data["base"])
    s2 = QueryEngine(cfg)
    s2.serve_tile = 64
    s2.set_index(plain.index, data["base"])
    s2.enable_sharding(8)

    q = data["query"][:4].astype(np.float32)
    cents = np.asarray(p2.retrieve_centroids())
    d2 = ((q[:, None, :] - cents[None]) ** 2).sum(-1)
    probes = np.argsort(d2, axis=1)[:, :6]
    # the fixture geometry must actually enable pruning
    tiles_np, _ = p2._tiled_view.expand_probes(probes.astype(np.int64))
    assert p2._serve_prune_j(tiles_np.shape[1]) == 4

    fi_p, fd_p = p2.search_fused(q, probes, 10)
    fi_s, fd_s = s2.search_fused(q, probes, 10)
    np.testing.assert_array_equal(np.asarray(fi_p), np.asarray(fi_s))
    np.testing.assert_array_equal(np.asarray(fd_p), np.asarray(fd_s))
