"""Encrypted re-rank end-to-end: client encrypts the query, server computes
Enc(⟨q,x⟩) MACs over HTTP, client decrypts exact distances. The plaintext
query never appears in the /encryptedsearch request."""

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
        str(ds), prefix="syn", nbase=2000, ntrain=4000, nquery=10, d=32,
        n_clusters=40, gt_k=100, seed=7,
    )
    import os

    cfg = PipelineConfig(
        index=IndexParams(d=32, nlist=16, pq_m=8, pq_nbits=8,
                          kmeans_iters=8, pq_kmeans_iters=8),
        protocol=ProtocolParams(nprobe=8, coarse_probe=60, k=20, nquery=4,
                                encrypted_rerank=True),
        # N=256 keeps test decryption fast; 8 candidates per block at d=32.
        # 3 limbs so the same server params serve the CKKS variant test.
        he=HEParams(scheme="bfv", n=256, t_bits=24, n_limbs=3),
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
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield cfg, engine, f"http://127.0.0.1:{port}/"
    srv.shutdown()


def test_encrypted_scores_match_plaintext(served):
    """Distances recovered from the encrypted path must equal the plaintext
    /precisesearch distances exactly (BFV is exact on integer data)."""
    cfg, engine, addr = served
    client = ClientPipeline(cfg, server_addr=addr)
    q = client.get_query()
    cent = client.get_centroids()
    _, sorted_cent = client.sort_nearest_centroids(q, cent)
    cs, ci, sizes = client.get_coarse_scores(sorted_cent, q)
    sorted_coarse = client.compute_nearest_coarse_vectors(cs, ci, sizes)

    enc_scores, cand = client.get_encrypted_precise_scores(sorted_coarse, q)
    plain_scores, cand2 = client.get_precise_scores(sorted_coarse, q)
    np.testing.assert_array_equal(cand, cand2)
    np.testing.assert_allclose(enc_scores, plain_scores, rtol=1e-6, atol=0.5)


def test_encrypted_request_has_no_plaintext_query(served):
    """Privacy contract: the /encryptedsearch body must not contain the
    plaintext query values."""
    cfg, engine, addr = served
    client = ClientPipeline(cfg, server_addr=addr)
    q = client.get_query()

    captured = {}
    orig_post = client._post

    def spy(route, payload):
        captured[route] = payload
        return orig_post(route, payload)

    client._post = spy
    cent = client.get_centroids()
    _, sorted_cent = client.sort_nearest_centroids(q, cent)
    cs, ci, sizes = client.get_coarse_scores(sorted_cent, q)
    sorted_coarse = client.compute_nearest_coarse_vectors(cs, ci, sizes)
    client.get_encrypted_precise_scores(sorted_coarse, q)

    body = json.dumps(captured["encryptedsearch"])
    assert "preciseQuery" not in body
    # ciphertext limbs present instead
    assert "encryptedPreciseQuery" in body and "c0" in body


def test_full_encrypted_pipeline_recall(served):
    """Full run() with encrypted_rerank=True reaches the same recall as the
    plaintext pipeline (stage 6 distances identical)."""
    cfg, engine, addr = served
    client = ClientPipeline(cfg, server_addr=addr)
    _, top_ids = client.run()
    rep = client.benchmark_results(top_ids)
    assert rep.recall_1 >= 0.5


def test_ckks_encrypted_scores_close_to_plaintext(served):
    """CKKS slot-packed scoring over HTTP: approximate distances must agree
    with /precisesearch within CKKS precision, including the one-time
    Galois-key registration round."""
    import dataclasses

    cfg, engine, addr = served
    ckks_cfg = dataclasses.replace(
        cfg, he=dataclasses.replace(cfg.he, scheme="ckks")
    )
    client = ClientPipeline(ckks_cfg, server_addr=addr)
    q = client.get_query()
    cent = client.get_centroids()
    _, sorted_cent = client.sort_nearest_centroids(q, cent)
    cs, ci, sizes = client.get_coarse_scores(sorted_cent, q)
    sorted_coarse = client.compute_nearest_coarse_vectors(cs, ci, sizes)

    enc_scores, cand = client.get_encrypted_precise_scores(sorted_coarse, q)
    plain_scores, cand2 = client.get_precise_scores(sorted_coarse, q)
    np.testing.assert_array_equal(cand, cand2)
    # CKKS is approximate: require <0.1% relative error on SIFT-scale dists
    np.testing.assert_allclose(enc_scores, plain_scores, rtol=2e-3, atol=20.0)

    # second query batch must NOT resend galois keys
    captured = {}
    orig = client._post

    def spy(route, payload):
        captured[route] = payload
        return orig(route, payload)

    client._post = spy
    client.get_encrypted_precise_scores(sorted_coarse, q)
    assert "galoisKeys" not in captured["encryptedsearch"]


def test_ckks_combined_response_over_http(served):
    """resp_mod="combined": ONE level-1 ct per query crosses the wire and
    decodes to the same distances as the per-block CKKS response."""
    import dataclasses

    cfg, engine, addr = served
    ckks_cfg = dataclasses.replace(
        cfg,
        he=dataclasses.replace(cfg.he, scheme="ckks", resp_mod="combined"),
    )
    client = ClientPipeline(ckks_cfg, server_addr=addr)
    q = client.get_query()
    cent = client.get_centroids()
    _, sorted_cent = client.sort_nearest_centroids(q, cent)
    cs, ci, sizes = client.get_coarse_scores(sorted_cent, q)
    sorted_coarse = client.compute_nearest_coarse_vectors(cs, ci, sizes)

    captured = {}
    orig = client._post

    def spy(route, payload):
        resp = orig(route, payload)
        captured[route] = (payload, resp)
        return resp

    client._post = spy
    enc_scores, cand = client.get_encrypted_precise_scores(sorted_coarse, q)
    plain_scores, cand2 = client.get_precise_scores(sorted_coarse, q)
    np.testing.assert_array_equal(cand, cand2)
    # combined trades precision for wire: the rotation/tree key-switch
    # noise decodes at the final 2^5 scale → a few % of the row's distance
    # SPREAD at these tiny test params (scoring-grade; production N=8192
    # margin is the bench's ckks_max_rel_err). Tolerance is row-max
    # relative — per-element rtol would gate small entries on noise that
    # is absolute per row. What stage 6 needs is RANKING fidelity.
    row_max = np.abs(plain_scores).max(axis=1, keepdims=True)
    assert (np.abs(enc_scores - plain_scores) <= 0.08 * row_max).all()
    k = 10
    for i in range(enc_scores.shape[0]):
        top_enc = set(np.argsort(enc_scores[i])[:k].tolist())
        top_ref = set(np.argsort(plain_scores[i])[:k].tolist())
        assert len(top_enc & top_ref) >= k - 2

    payload, resp = captured["encryptedsearch"]
    assert payload["respMod"] == "combined"
    # one single-limb ct per query (vs coarse_probe/per_ct level-1 2-limb
    # blocks on the plain path): the wire shrink is the point
    nq = len(payload["encryptedPreciseQuery"])
    assert len(resp["encryptedScoresCombined"]) == nq
    from prefhetch_tpu.crypto.ckks import CKKSCiphertext

    ct = CKKSCiphertext.from_wire(resp["encryptedScoresCombined"][0])
    assert ct.level == 1


def test_bfv_packed_response_over_http(served):
    """resp_mod="packed": ONE 2-limb ct per d/nb queries crosses the wire
    and decodes to EXACTLY the plaintext /precisesearch distances (BFV is
    exact; the ×d extraction factor is inverted mod the client's odd t)."""
    import dataclasses

    cfg, engine, addr = served
    packed_cfg = dataclasses.replace(
        cfg, he=dataclasses.replace(cfg.he, resp_mod="packed"),
    )
    client = ClientPipeline(packed_cfg, server_addr=addr)
    q = client.get_query()
    cent = client.get_centroids()
    _, sorted_cent = client.sort_nearest_centroids(q, cent)
    cs, ci, sizes = client.get_coarse_scores(sorted_cent, q)
    sorted_coarse = client.compute_nearest_coarse_vectors(cs, ci, sizes)

    captured = {}
    orig = client._post

    def spy(route, payload):
        resp = orig(route, payload)
        captured[route] = (payload, resp)
        return resp

    client._post = spy
    enc_scores, cand = client.get_encrypted_precise_scores(sorted_coarse, q)
    plain_scores, cand2 = client.get_precise_scores(sorted_coarse, q)
    np.testing.assert_array_equal(cand, cand2)
    np.testing.assert_allclose(enc_scores, plain_scores, rtol=1e-6, atol=0.5)

    payload, resp = captured["encryptedsearch"]
    assert payload["respMod"] == "packed"
    nq = len(payload["encryptedPreciseQuery"])
    grp = int(resp["packGroup"])
    assert len(resp["packedScores"]) == -(-nq // grp) and grp > 1

    # second batch must NOT resend the extraction Galois keys
    client.get_encrypted_precise_scores(sorted_coarse, q)
    payload2, _ = captured["encryptedsearch"]
    assert "galoisKeys" not in payload2


def test_encrypted_mode_precise_query_never_travels(served):
    """VERDICT-closing privacy contract: in encrypted mode, NO request on
    ANY route carries the full-precision query — /coarsesearch gets only
    PQ codes of the query (the reserved compute_encrypted_coarse_query,
    reference: include/client/client_lib.h:28-36)."""
    cfg, engine, addr = served
    client = ClientPipeline(cfg, server_addr=addr)

    posted = []
    orig = client._post_raw          # the single transport primitive —
                                     # every POST (raw or parsed) goes here

    def spy(route, payload):
        posted.append((route, payload))
        return orig(route, payload)

    client._post_raw = spy
    query = client.get_query()
    client.run()

    routes = [r for r, _ in posted]
    assert "coarsesearch" in routes
    for route, payload in posted:
        body = json.dumps(payload)
        assert "preciseQuery" not in body, route
        # the raw query vector must not appear in any request body
        for qrow in query:
            frag = json.dumps(qrow.tolist())[1:40]
            assert frag not in body, route
    coarse = dict(posted)["coarsesearch"]
    codes = np.asarray(coarse["coarseQueryCodes"])
    assert codes.shape == (cfg.protocol.nquery, cfg.index.pq_m)


def test_quantized_coarse_query_recall_close_to_plaintext(served):
    """Triage with the PQ-quantized query + exact encrypted re-rank must
    recover (nearly) the plaintext pipeline's candidates."""
    cfg, engine, addr = served
    enc = ClientPipeline(cfg, server_addr=addr)
    import dataclasses

    plain_cfg = dataclasses.replace(
        cfg, protocol=dataclasses.replace(
            cfg.protocol, encrypted_rerank=False
        )
    )
    plain = ClientPipeline(plain_cfg, server_addr=addr)
    _, ids_enc = enc.run()
    _, ids_plain = plain.run()
    k = cfg.protocol.k
    overlap = np.mean([
        len(np.intersect1d(ids_enc[i][:k], ids_plain[i][:k])) / k
        for i in range(ids_enc.shape[0])
    ])
    assert overlap >= 0.9, f"quantized-coarse overlap too low: {overlap}"


def test_quantized_coarse_honors_non_residual_pq(tmp_path):
    """Regression: with by_residual=False the public codebooks quantize RAW
    vectors — the client must encode q directly (no anchor subtraction) and
    the server must reconstruct without adding the anchor back, or coarse
    recall silently collapses."""
    import dataclasses
    import os

    from prefhetch_tpu.data.synthetic import write_sift_style_dataset

    ds = tmp_path / "ds"
    ds.mkdir()
    write_sift_style_dataset(
        str(ds), prefix="nr", nbase=2000, ntrain=4000, nquery=10, d=32,
        n_clusters=40, gt_k=100, seed=9,
    )
    cfg = PipelineConfig(
        index=IndexParams(d=32, nlist=16, pq_m=8, pq_nbits=8,
                          by_residual=False,
                          kmeans_iters=8, pq_kmeans_iters=8),
        protocol=ProtocolParams(nprobe=8, coarse_probe=60, k=20, nquery=4,
                                encrypted_rerank=True),
        he=HEParams(scheme="bfv", n=256, t_bits=24, n_limbs=2),
        nbase=2000,
        train_path=os.path.join(str(ds), "nr_learn.fvecs"),
        base_path=os.path.join(str(ds), "nr_base.fvecs"),
        query_path=os.path.join(str(ds), "nr_query.fvecs"),
        groundtruth_path=os.path.join(str(ds), "nr_groundtruth.ivecs"),
        port=0,
    )
    engine = QueryEngine(cfg, index_dir=str(tmp_path / "idx"))
    engine.init_index()
    srv = make_server(engine, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        client = ClientPipeline(cfg, server_addr=f"http://127.0.0.1:{port}/")
        # the /codebooks metadata must report the real flag
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/codebooks"
        ) as r:
            meta = json.loads(r.read())
        assert meta["byResidual"] is False
        _, top_ids = client.run()
        rep = client.benchmark_results(top_ids)
        # residual-mode mishandling drives recall to near-random (~0.01)
        assert rep.recall_10 >= 0.5, rep
    finally:
        srv.shutdown()
