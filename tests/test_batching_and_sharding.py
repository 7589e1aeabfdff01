"""Cross-request batching scheduler + sharded engine mode tests."""

import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from prefhetch_tpu.data.synthetic import make_clustered_dataset
from prefhetch_tpu.engine.server import QueryEngine
from prefhetch_tpu.index.build import build_ivf_index
from prefhetch_tpu.serve.batcher import BatchScheduler
from prefhetch_tpu.utils.config import IndexParams, PipelineConfig, ProtocolParams


@pytest.fixture(scope="module")
def data():
    return make_clustered_dataset(
        nbase=2048, ntrain=4000, nquery=32, d=32, n_clusters=40, gt_k=50, seed=5
    )


@pytest.fixture(scope="module")
def engine(data):
    cfg = PipelineConfig(
        index=IndexParams(d=32, nlist=16, pq_m=8, pq_nbits=8,
                          kmeans_iters=8, pq_kmeans_iters=8),
        protocol=ProtocolParams(nprobe=6, coarse_probe=40, k=10, nquery=4),
        nbase=2048,
    )
    eng = QueryEngine(cfg)
    idx = build_ivf_index(data["train"], data["base"], cfg.index)
    eng.set_index(idx, data["base"])
    return eng


def _probes(engine, q, nprobe=6):
    cent = engine.retrieve_centroids()
    d2 = ((q[:, None, :] - cent[None]) ** 2).sum(-1)
    return np.argsort(d2, axis=1)[:, :nprobe]


def test_batcher_results_match_direct(engine, data):
    sched = BatchScheduler(engine, max_batch=16, max_wait_ms=20)
    q = data["query"]
    probes = _probes(engine, q)

    # 8 concurrent 2-query requests through the scheduler
    def call(i):
        sl = slice(2 * i, 2 * i + 2)
        return sched.coarse_search(q[sl], probes[sl])

    with ThreadPoolExecutor(max_workers=8) as ex:
        outs = list(ex.map(call, range(8)))

    for i, (scores, indexes, sizes) in enumerate(outs):
        ref_s, ref_i, ref_z = engine.coarse_search(
            q[2 * i : 2 * i + 2], probes[2 * i : 2 * i + 2]
        )
        np.testing.assert_array_equal(sizes, ref_z)
        np.testing.assert_array_equal(indexes, ref_i)
        np.testing.assert_allclose(scores, ref_s, rtol=1e-6)

    st = sched.stats()
    assert st["coarse"]["rows"] == 16
    # coalescing must actually have happened (fewer batches than requests)
    assert st["coarse"]["batches"] < 8


def test_batcher_precise_and_fetch(engine, data, rng):
    sched = BatchScheduler(engine, max_batch=32, max_wait_ms=10)
    q = data["query"][:6]
    cand = rng.integers(0, 2048, size=(6, 20)).astype(np.int64)

    def precise(i):
        return sched.precise_search(q[i : i + 1], cand[i : i + 1])

    with ThreadPoolExecutor(max_workers=6) as ex:
        outs = list(ex.map(precise, range(6)))
    ref = engine.precise_search(q, cand)
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o[0], ref[i], rtol=1e-6)

    vec = sched.precise_vector_pir(cand[:2, :5])
    np.testing.assert_array_equal(
        vec, engine.precise_vector_pir(cand[:2, :5])
    )


def test_batcher_shape_mismatch_not_coalesced(engine, data):
    """Requests with different nprobe must not be merged (deferred batch)."""
    sched = BatchScheduler(engine, max_batch=16, max_wait_ms=30)
    q = data["query"][:2]
    p6 = _probes(engine, q, 6)
    p4 = _probes(engine, q, 4)

    r1 = {}
    r2 = {}

    def a():
        r1["v"] = sched.coarse_search(q, p6)

    def b():
        r2["v"] = sched.coarse_search(q, p4)

    t1 = threading.Thread(target=a)
    t2 = threading.Thread(target=b)
    t1.start(); t2.start(); t1.join(); t2.join()
    ref6 = engine.coarse_search(q, p6)
    ref4 = engine.coarse_search(q, p4)
    np.testing.assert_array_equal(r1["v"][2], ref6[2])
    np.testing.assert_array_equal(r2["v"][2], ref4[2])


def test_sharded_engine_matches_unsharded(engine, data):
    import copy

    q = data["query"][:4]
    probes = _probes(engine, q)
    ref = engine.coarse_search(q, probes)
    ref_p = engine.precise_search(q, np.arange(40)[None].repeat(4, 0))
    ref_v = engine.precise_vector_pir(np.arange(6)[None].repeat(4, 0))

    sh = QueryEngine(engine.config)
    sh.set_index(engine.index, data["base"])
    sh.enable_sharding(8)
    got = sh.coarse_search(q, probes)
    np.testing.assert_array_equal(got[1], ref[1])
    np.testing.assert_array_equal(got[2], ref[2])
    np.testing.assert_allclose(got[0], ref[0], rtol=1e-5)

    got_p = sh.precise_search(q, np.arange(40)[None].repeat(4, 0))
    np.testing.assert_allclose(got_p, ref_p, rtol=1e-5)
    got_v = sh.precise_vector_pir(np.arange(6)[None].repeat(4, 0))
    np.testing.assert_array_equal(got_v, ref_v)
