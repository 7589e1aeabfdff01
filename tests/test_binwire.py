"""Binary tiled wire: codec, engine service, and both HTTP frontends.

The binary wire must be a pure re-encoding of the JSON protocol: the valid
candidates it carries (ids, order, counts) must EXACTLY match the reference
ragged layout (candidates probe-major, storage order within a list —
src/server/server_lib.cpp:111-138), and its u16 distances must dequantize
to the JSON scores within one quantization step.
"""

import threading

import numpy as np
import pytest

from prefhetch_tpu.client.binwire import BinWireClient
from prefhetch_tpu.data.synthetic import write_sift_style_dataset
from prefhetch_tpu.engine.server import QueryEngine
from prefhetch_tpu.serve.http_server import make_server
from prefhetch_tpu.utils import wire_bin
from prefhetch_tpu.utils.config import (
    IndexParams, PipelineConfig, ProtocolParams,
)


# ---------------------------------------------------------------------------
def test_container_roundtrip():
    arrs = [
        np.arange(12, dtype=np.int32).reshape(3, 4),
        np.linspace(0, 1, 7, dtype=np.float32),
        np.array([[1, 2], [3, 4]], dtype=np.int64),
        np.arange(10, dtype=np.uint16),
        (np.arange(24, dtype=np.uint8)).reshape(2, 3, 4),
    ]
    buf = wire_bin.encode(wire_bin.KIND_COARSE_TILED, arrs)
    kind, out = wire_bin.decode(buf)
    assert kind == wire_bin.KIND_COARSE_TILED
    assert len(out) == len(arrs)
    for a, b in zip(arrs, out):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(a, b)


def test_container_rejects_garbage():
    with pytest.raises(ValueError):
        wire_bin.decode(b"\x00" * 4)
    with pytest.raises(ValueError):
        wire_bin.decode(b"not a binary wire payload")
    # truncated section data
    buf = wire_bin.encode(1, [np.arange(100, dtype=np.int64)])
    with pytest.raises(ValueError):
        wire_bin.decode(buf[: len(buf) - 50])


# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    ds = tmp_path_factory.mktemp("ds")
    write_sift_style_dataset(
        str(ds), prefix="syn", nbase=1500, ntrain=2500, nquery=16, d=24,
        n_clusters=24, gt_k=50, seed=11,
    )
    import os

    cfg = PipelineConfig(
        index=IndexParams(d=24, nlist=12, pq_m=0, kmeans_iters=5),
        protocol=ProtocolParams(nprobe=4, coarse_probe=40, k=10, nquery=4),
        nbase=1500,
        train_path=os.path.join(str(ds), "syn_learn.fvecs"),
        base_path=os.path.join(str(ds), "syn_base.fvecs"),
        query_path=os.path.join(str(ds), "syn_query.fvecs"),
        groundtruth_path=os.path.join(str(ds), "syn_groundtruth.ivecs"),
    )
    eng = QueryEngine(cfg, index_dir=str(tmp_path_factory.mktemp("idx")))
    eng.init_index()
    eng._queries = np.asarray(
        __import__("prefhetch_tpu.data.io", fromlist=["read_fvecs"])
        .read_fvecs(cfg.query_path), np.float32
    )
    return eng


def _probes_for(engine, q, nprobe):
    cents = np.asarray(engine.retrieve_centroids())
    d2 = ((q[:, None, :] - cents[None]) ** 2).sum(-1)
    return np.argsort(d2, axis=1)[:, :nprobe].astype(np.int64)


def test_tiled_service_matches_ragged(engine):
    """Valid lanes of the tiled response == the ragged protocol layout,
    and u16 distances dequantize to the ragged scores within one step."""
    q = engine._queries[:5]
    probes = _probes_for(engine, q, 4)
    scores, indexes, sizes = engine.coarse_search(q, probes)
    tile_idx, qdist, dmin, dstep, counts = engine.coarse_search_tiled(
        q, probes
    )
    np.testing.assert_array_equal(counts, sizes)

    tsizes, tids, T = engine.tile_table()
    lane = np.arange(T)
    off = 0
    for i in range(len(q)):
        valid = (lane[None, :] < tsizes[tile_idx[i]][:, None]).reshape(-1)
        ids_i = tids[tile_idx[i]].reshape(-1)[valid]
        np.testing.assert_array_equal(
            ids_i, np.asarray(indexes[off : off + sizes[i]], np.int32)
        )
        d_i = wire_bin.dequantize_q16(
            qdist[i].reshape(-1)[valid], dmin[i], dstep[i]
        )
        np.testing.assert_allclose(
            d_i, scores[off : off + sizes[i]], atol=float(dstep[i]) * 1.01
        )
        off += sizes[i]


# ---------------------------------------------------------------------------
def _start_threaded(engine):
    srv = make_server(engine, "127.0.0.1", 0, batching=True, max_wait_ms=2.0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, port


def _start_aio(engine):
    import socket

    from prefhetch_tpu.serve.aio_server import serve_forever_aio

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = serve_forever_aio(
        engine, "127.0.0.1", port, background=True, batching=True,
        max_wait_ms=2.0,
    )
    return srv, port


@pytest.mark.parametrize("frontend", ["threaded", "aio"])
def test_binary_wire_end_to_end(engine, frontend):
    """Full binary-wire triage round against both frontends must select the
    same top-CP candidate set as host-side exact coarse selection."""
    srv, port = (
        _start_threaded(engine) if frontend == "threaded"
        else _start_aio(engine)
    )
    try:
        cli = BinWireClient(f"http://127.0.0.1:{port}/")
        q = engine._queries[:4]
        cents = cli.fetch_centroids()
        np.testing.assert_allclose(
            cents, np.asarray(engine.retrieve_centroids()), rtol=1e-6
        )
        probes = _probes_for(engine, q, 4)
        cp = 40
        top = cli.coarse_topk(q, probes, cp)
        # oracle: selection on the engine's exact ragged scores
        scores, indexes, sizes = engine.coarse_search(q, probes)
        off = 0
        for i in range(len(q)):
            s_i = scores[off : off + sizes[i]]
            i_i = indexes[off : off + sizes[i]]
            off += sizes[i]
            want = i_i[np.argsort(s_i, kind="stable")[:cp]]
            # quantization can permute near-ties; compare as sets with a
            # distance-bound check for any difference
            got, want_set = set(top[i].tolist()), set(want.tolist())
            diff = got ^ want_set
            if diff:
                dmap = dict(zip(i_i.tolist(), s_i.tolist()))
                kth = np.sort(s_i)[cp - 1]
                spread = s_i.max() - s_i.min()
                for vid in diff:
                    assert abs(dmap[vid] - kth) <= spread / 65534 * 2 + 1e-6
        # server-select wire: top-k ids must match host-side exact
        # selection on the ragged scores (ties aside)
        sids, sdists = cli.coarse_topk_server(q, probes, cp)
        assert sids.shape == (len(q), cp) and sdists.shape == (len(q), cp)
        off = 0
        for i in range(len(q)):
            s_i = scores[off : off + sizes[i]]
            i_i = indexes[off : off + sizes[i]]
            off += sizes[i]
            want = set(i_i[np.argsort(s_i, kind="stable")[:cp]].tolist())
            got = set(sids[i].tolist())
            diff = got ^ want
            if diff:
                dmap = dict(zip(i_i.tolist(), s_i.tolist()))
                kth = np.sort(s_i)[cp - 1]
                for vid in diff:
                    assert abs(dmap[vid] - kth) <= 1e-3
            assert np.all(np.diff(sdists[i]) >= 0)     # ascending
        # binary precise round == engine precise_search
        ps = cli.precise(q, top)
        np.testing.assert_allclose(
            ps, engine.precise_search(q, top), rtol=1e-5, atol=1e-3
        )
        # binary fetch == engine gather
        ids = top[:, :10].astype(np.int64)
        vecs = cli.fetch_vectors(ids)
        np.testing.assert_allclose(
            vecs, np.asarray(engine.precise_vector_pir(ids)), rtol=1e-6
        )
        cli.close()
    finally:
        srv.shutdown()


def test_aio_json_parity(engine):
    """The asyncio frontend serves the reference JSON protocol with the
    exact field names (SURVEY §2.2) — same dispatcher, new transport."""
    import json
    import urllib.request

    srv, port = _start_aio(engine)
    try:
        q = engine._queries[:2]
        probes = _probes_for(engine, q, 4)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/coarsesearch",
            data=json.dumps({
                "preciseQuery": q.tolist(),
                "nearestCentroidIndexes": probes.tolist(),
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            body = json.loads(r.read())
        assert set(body) == {
            "coarseDistanceScores", "coarseVectorIndexes",
            "listSizesPerQuery",
        }
        scores, indexes, sizes = engine.coarse_search(q, probes)
        np.testing.assert_array_equal(
            np.asarray(body["listSizesPerQuery"]), sizes
        )
        np.testing.assert_array_equal(
            np.asarray(body["coarseVectorIndexes"]), indexes
        )
        # malformed → 400 (reference crashes; we must not)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/coarsesearch",
            data=b"{not json", headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
def test_encode_rows_uniform_matches_per_member_encode():
    """Batch body building (one [B, L] matrix) must be byte-identical to
    per-member encode() for a uniform-row group (the native frontend's
    bulk respond path)."""
    ids = np.arange(12, dtype=np.int64).reshape(4, 3)
    dists = np.linspace(0.0, 1.0, 8, dtype=np.float32).reshape(4, 2)
    counts = np.arange(4, dtype=np.int64)
    buf, offs = wire_bin.encode_rows(
        wire_bin.KIND_COARSE_TOPK, [ids, dists, counts], [1, 1, 1, 1]
    )
    assert offs.dtype == np.uint64 and len(offs) == 5
    for j in range(4):
        body = buf[int(offs[j]) : int(offs[j + 1])].tobytes()
        ref = wire_bin.encode(
            wire_bin.KIND_COARSE_TOPK,
            [ids[j : j + 1], dists[j : j + 1], counts[j : j + 1]],
        )
        assert body == ref
        kind, secs = wire_bin.decode(body)
        assert kind == wire_bin.KIND_COARSE_TOPK
        np.testing.assert_array_equal(secs[0], ids[j : j + 1])
        np.testing.assert_allclose(secs[1], dists[j : j + 1])
        np.testing.assert_array_equal(secs[2], counts[j : j + 1])


def test_encode_rows_ragged_fallback():
    ids = np.arange(12, dtype=np.int64).reshape(4, 3)
    dists = np.linspace(0.0, 1.0, 8, dtype=np.float32).reshape(4, 2)
    counts = np.arange(4, dtype=np.int64)
    buf, offs = wire_bin.encode_rows(
        wire_bin.KIND_COARSE_TOPK, [ids, dists, counts], [1, 3]
    )
    kind, secs = wire_bin.decode(buf[int(offs[0]) : int(offs[1])].tobytes())
    np.testing.assert_array_equal(secs[0], ids[:1])
    kind, secs = wire_bin.decode(buf[int(offs[1]) : int(offs[2])].tobytes())
    np.testing.assert_array_equal(secs[0], ids[1:4])
    np.testing.assert_array_equal(secs[2], counts[1:4])
