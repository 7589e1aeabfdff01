"""Real-PIR over HTTP: the retrieval round carries only ciphertexts and
returns the exact rows."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from prefhetch_tpu.client.pipeline import ClientPipeline
from prefhetch_tpu.data.synthetic import write_sift_style_dataset
from prefhetch_tpu.engine.server import QueryEngine
from prefhetch_tpu.serve.http_server import make_server
from prefhetch_tpu.utils.config import (
    HEParams,
    IndexParams,
    PipelineConfig,
    ProtocolParams,
)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    ds = tmp_path_factory.mktemp("ds")
    write_sift_style_dataset(
        str(ds), prefix="syn", nbase=256, ntrain=1200, nquery=10, d=32,
        n_clusters=12, gt_k=50, seed=8,
    )
    import os

    cfg = PipelineConfig(
        index=IndexParams(d=32, nlist=8, pq_m=0, kmeans_iters=5),
        protocol=ProtocolParams(nprobe=4, coarse_probe=30, k=5, nquery=3,
                                pir_mode="he"),
        he=HEParams(scheme="bfv", n=256, t_bits=24, n_limbs=2,
                    pir_plain_modulus=257),
        nbase=256,
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
    yield cfg, engine, f"http://127.0.0.1:{port}/"
    srv.shutdown()


def test_full_pipeline_with_real_pir(served):
    cfg, engine, addr = served
    client = ClientPipeline(cfg, server_addr=addr)
    vectors, top_ids = client.run()
    base = np.asarray(engine.base)
    # retrieved rows are exact despite the server never seeing the ids
    np.testing.assert_allclose(vectors, base[top_ids], atol=1e-4)


def test_pir_request_contains_no_indices(served):
    """Privacy contract: the /pir-fetch body has no row indices anywhere —
    one packed ciphertext per row + (first call) public Galois keys."""
    cfg, engine, addr = served
    client = ClientPipeline(cfg, server_addr=addr)

    captured = {}
    orig = client._post

    def spy(route, payload):
        captured[route] = payload
        return orig(route, payload)

    client._post = spy
    client.run()
    assert "pir-fetch" in captured
    body = captured["pir-fetch"]
    assert "pirHypercubeMulti" in body and "keyId" in body
    # multi-row packed: ⌈rows / rows_per_ct⌉ uploaded cts, each declaring
    # the SAME padded nRows (the true per-chunk count stays client-side)
    from prefhetch_tpu.client.pir import get_pir_client

    pirc = get_pir_client(cfg)
    k_ct = pirc.rows_per_ct(cfg.nbase, cfg.index.d)
    n_rows_total = cfg.protocol.nquery * cfg.protocol.k
    entries = body["pirHypercubeMulti"]
    assert len(entries) == -(-n_rows_total // k_ct)
    assert all(e["nRows"] == k_ct for e in entries)
    s = json.dumps(body)
    assert "nearestPreciseVectorIndexes" not in s

    # second run must not resend the galois keys
    client.run()
    assert "galoisKeys" not in captured["pir-fetch"]
