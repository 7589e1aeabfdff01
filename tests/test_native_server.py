"""The C++ epoll frontend (native/pfh_http.cpp + serve/native_server.py).

Drives the REAL server over real sockets on CPU: binary hot routes batched
per wave, the fused one-round /search, JSON reference-parity fallback
routes, malformed input, and concurrency — asserting byte/shape parity
with the engine called directly."""

import http.client
import json
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from prefhetch_tpu import native
from prefhetch_tpu.data.synthetic import write_sift_style_dataset
from prefhetch_tpu.engine.server import QueryEngine
from prefhetch_tpu.utils import wire_bin
from prefhetch_tpu.utils.config import (
    IndexParams, PipelineConfig, ProtocolParams,
)

pytestmark = pytest.mark.skipif(
    native.get_http_lib() is None,
    reason="native http frontend unavailable (no g++)",
)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    import os

    ds = tmp_path_factory.mktemp("ds")
    write_sift_style_dataset(
        str(ds), prefix="syn", nbase=2000, ntrain=3000, nquery=16, d=16,
        n_clusters=16, gt_k=50, seed=5,
    )
    cfg = PipelineConfig(
        index=IndexParams(d=16, nlist=8, pq_m=4, pq_nbits=8,
                          kmeans_iters=5, pq_kmeans_iters=5),
        protocol=ProtocolParams(nprobe=4, coarse_probe=30, k=10, nquery=4),
        nbase=2000,
        train_path=os.path.join(str(ds), "syn_learn.fvecs"),
        base_path=os.path.join(str(ds), "syn_base.fvecs"),
        query_path=os.path.join(str(ds), "syn_query.fvecs"),
        groundtruth_path=os.path.join(str(ds), "syn_groundtruth.ivecs"),
    )
    engine = QueryEngine(cfg, index_dir=str(tmp_path_factory.mktemp("idx")))
    engine.init_index()
    from prefhetch_tpu.serve.native_server import NativeHTTPServer

    srv = NativeHTTPServer(engine, port=0, grace_ms=1.0)
    yield engine, srv.port
    srv.shutdown()


def _bin_req(port, method, path, body=b"", accept_bin=True, timeout=60):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    hdrs = {}
    if accept_bin:
        hdrs["Accept"] = wire_bin.CONTENT_TYPE
    if body:
        hdrs["Content-Type"] = wire_bin.CONTENT_TYPE
    c.request(method, path, body=body or None, headers=hdrs)
    r = c.getresponse()
    data = r.read()
    c.close()
    return r.status, data


def _probes(engine, q):
    cent = np.asarray(engine.index.centroids)
    d2 = ((q[:, None, :] - cent[None]) ** 2).sum(-1)
    return np.argsort(d2, axis=1)[:, :4].astype(np.int64)


def test_healthz_and_json_fallback(served):
    engine, port = served
    status, data = _bin_req(port, "GET", "/healthz", accept_bin=False)
    assert status == 200
    assert json.loads(data)["ntotal"] == 2000
    status, data = _bin_req(port, "GET", "/nope", accept_bin=False)
    assert status == 404


def test_binary_coarse_topk_parity(served):
    engine, port = served
    q = np.random.default_rng(0).normal(size=(3, 16)).astype(np.float32)
    probes = _probes(engine, q)
    body = wire_bin.encode(wire_bin.KIND_COARSE_TOPK_REQ, [
        q, probes, np.asarray([10], np.uint32),
    ])
    status, data = _bin_req(port, "POST", "/coarsesearch", body)
    assert status == 200
    kind, (ids, dists, counts) = wire_bin.decode(data)
    assert kind == wire_bin.KIND_COARSE_TOPK
    ref_ids, ref_d, ref_c = engine.coarse_search_topk(q, probes, 10)
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-5)
    np.testing.assert_array_equal(counts, ref_c)


def test_fused_search_route(served):
    """One-round /search returns the same ids as coarse-topk + precise +
    client-side final select."""
    engine, port = served
    q = np.random.default_rng(1).normal(size=(2, 16)).astype(np.float32)
    probes = _probes(engine, q)
    body = wire_bin.encode(wire_bin.KIND_SEARCH_REQ, [
        q, probes, np.asarray([10], np.uint32),
    ])
    status, data = _bin_req(port, "POST", "/search", body)
    assert status == 200
    kind, (ids, dists) = wire_bin.decode(data)
    assert kind == wire_bin.KIND_SEARCH and ids.shape == (2, 10)
    ref_ids, ref_d = engine.search_fused(q, probes, 10)
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-5)
    assert (np.diff(dists, axis=1) >= -1e-4).all()   # ascending


def test_precise_binary_parity(served):
    engine, port = served
    q = np.random.default_rng(2).normal(size=(2, 16)).astype(np.float32)
    cand = np.arange(2 * 30, dtype=np.int64).reshape(2, 30)
    body = wire_bin.encode(wire_bin.KIND_PRECISE_REQ, [q, cand])
    status, data = _bin_req(port, "POST", "/precisesearch", body)
    assert status == 200
    kind, (scores,) = wire_bin.decode(data)
    ref = engine.precise_search(q, cand)
    np.testing.assert_allclose(scores, ref, rtol=1e-5)


def test_malformed_binary_is_400_not_fatal(served):
    engine, port = served
    status, data = _bin_req(port, "POST", "/coarsesearch", b"garbage1")
    assert status == 400
    # server still alive
    status, _ = _bin_req(port, "GET", "/healthz", accept_bin=False)
    assert status == 200


def test_mixed_k_wave_not_poisoned(served):
    """Requests with incompatible k in one wave: each still answered
    correctly (grouped separately, or retried singly)."""
    engine, port = served
    q = np.random.default_rng(3).normal(size=(1, 16)).astype(np.float32)
    probes = _probes(engine, q)

    def call(k):
        body = wire_bin.encode(wire_bin.KIND_COARSE_TOPK_REQ, [
            q, probes, np.asarray([k], np.uint32),
        ])
        return _bin_req(port, "POST", "/coarsesearch", body)

    with ThreadPoolExecutor(8) as ex:
        rs = list(ex.map(call, [5, 10, 5, 10, 7, 5, 10, 7]))
    for (status, data), k in zip(rs, [5, 10, 5, 10, 7, 5, 10, 7]):
        assert status == 200
        _, (ids, d, c) = wire_bin.decode(data)
        assert ids.shape == (1, k)


def test_concurrent_waves_batched_and_consistent(served):
    """16 concurrent clients hitting the same route must be coalesced
    (server batches > 0) and each get exactly its own rows back."""
    engine, port = served
    rng = np.random.default_rng(4)
    qs = rng.normal(size=(16, 1, 16)).astype(np.float32)
    probes = [_probes(engine, q) for q in qs]
    refs = [engine.coarse_search_topk(qs[i], probes[i], 8)
            for i in range(16)]

    def call(i):
        body = wire_bin.encode(wire_bin.KIND_COARSE_TOPK_REQ, [
            qs[i], probes[i], np.asarray([8], np.uint32),
        ])
        return wire_bin.decode(
            _bin_req(port, "POST", "/coarsesearch", body)[1]
        )

    with ThreadPoolExecutor(16) as ex:
        outs = list(ex.map(call, range(16)))
    for i, (kind, (ids, d, c)) in enumerate(outs):
        np.testing.assert_array_equal(ids, refs[i][0])


def test_keepalive_sequential_requests(served):
    """One connection, many sequential requests (keep-alive reuse)."""
    engine, port = served
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    q = np.random.default_rng(5).normal(size=(1, 16)).astype(np.float32)
    probes = _probes(engine, q)
    body = wire_bin.encode(wire_bin.KIND_COARSE_TOPK_REQ, [
        q, probes, np.asarray([5], np.uint32),
    ])
    for _ in range(5):
        c.request("POST", "/coarsesearch", body=body,
                  headers={"Content-Type": wire_bin.CONTENT_TYPE})
        r = c.getresponse()
        data = r.read()
        assert r.status == 200
        kind, (ids, d, cn) = wire_bin.decode(data)
        assert ids.shape == (1, 5)
    c.close()
