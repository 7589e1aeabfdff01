"""Modulus-switched encrypted-response wire (VERDICT r02 item 4).

The /encryptedsearch response can opt into respMod="q1": the result
ciphertexts are RNS mod-switched down to the first limb on the server
(engine/hecompute._trunc_mac_q1_fn), halving the dominant download, at the
price of a sparse ternary client secret (HEParams.sparse_h ≤ ~62 — the
mod-down rounding error (1+h)/2 must stay under q1/(2t)).
"""

import os
import threading

import numpy as np
import pytest

from prefhetch_tpu.client.he import HEClient
from prefhetch_tpu.client.pipeline import ClientPipeline
from prefhetch_tpu.data.synthetic import write_sift_style_dataset
from prefhetch_tpu.engine.hecompute import HEComputeService
from prefhetch_tpu.engine.server import QueryEngine
from prefhetch_tpu.serve.http_server import make_server
from prefhetch_tpu.utils.config import (
    HEParams,
    IndexParams,
    PipelineConfig,
    ProtocolParams,
)


@pytest.mark.parametrize("backend", ["numpy", "tpu"])
def test_q1_wire_exact_and_half_size(backend):
    """Both backends produce the identical single-limb wire; decryption is
    EXACT with the sparse key; the wire is half the 2-limb truncated one."""
    rng = np.random.default_rng(3)
    nbase, d, nq, P = 400, 32, 3, 32
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    queries = rng.integers(0, 256, (nq, d)).astype(np.float32)
    idx = np.stack([rng.permutation(nbase)[:P] for _ in range(nq)])
    ref = ((base[idx].astype(np.float64) - queries[:, None, :]) ** 2).sum(-1)

    hc = HEClient(HEParams(n=256, sparse_h=48, resp_mod="q1"), seed=5)
    svc = HEComputeService(hc.params, backend=backend)
    svc.set_base(base)
    cts = [svc.ctx.ct_from_wire(w) for w in hc.encrypt_query_batch(queries)]
    c1, c0, norms = svc.encrypted_scores_trunc_q1(cts, idx)
    out = hc.decrypt_scores_trunc_q1(c1, c0, norms, queries)
    np.testing.assert_allclose(out, ref, atol=1e-4)

    c1f, c0f, _ = svc.encrypted_scores_trunc(cts, idx)
    assert c1.nbytes + c0.nbytes == (c1f.nbytes + c0f.nbytes) // 2


def test_q1_wire_requires_sparse_key():
    """Dense ternary keys exceed the mod-down margin — decryption must
    diverge (documents why resp_mod='q1' mandates sparse_h).

    Run at the REAL operating point (N=4096, d=128): a dense secret's
    ‖s‖₁ ≈ 2N/3 makes the per-coefficient mod-down error σ ≈ 15, whose
    tail over nq·P = 1024 samples deterministically (pinned seed) crosses
    the Δ'/2 = 32 rounding threshold; at toy N the tail stays under it."""
    rng = np.random.default_rng(3)
    nbase, d, nq, P = 600, 128, 4, 256
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    queries = rng.integers(0, 256, (nq, d)).astype(np.float32)
    idx = np.stack([rng.permutation(nbase)[:P] for _ in range(nq)])
    ref = ((base[idx].astype(np.float64) - queries[:, None, :]) ** 2).sum(-1)

    hc = HEClient(HEParams(), seed=6)                # dense ternary, N=4096
    svc = HEComputeService(hc.params, backend="numpy")
    svc.set_base(base)
    cts = [svc.ctx.ct_from_wire(w) for w in hc.encrypt_query_batch(queries)]
    out = hc.decrypt_scores_trunc_q1(
        *svc.encrypted_scores_trunc_q1(cts, idx), queries
    )
    assert np.abs(out - ref).max() > 0.5


@pytest.fixture(scope="module")
def served_q1(tmp_path_factory):
    ds = tmp_path_factory.mktemp("ds")
    write_sift_style_dataset(
        str(ds), prefix="syn", nbase=1500, ntrain=3000, nquery=8, d=32,
        n_clusters=24, gt_k=100, seed=19,
    )
    cfg = PipelineConfig(
        index=IndexParams(d=32, nlist=12, pq_m=8, pq_nbits=8,
                          kmeans_iters=6, pq_kmeans_iters=6),
        protocol=ProtocolParams(nprobe=6, coarse_probe=40, k=10, nquery=3,
                                encrypted_rerank=True),
        he=HEParams(scheme="bfv", n=256, t_bits=24, n_limbs=2,
                    sparse_h=48, resp_mod="q1"),
        nbase=1500,
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


def test_q1_wire_through_http_matches_plaintext(served_q1):
    """Stage-6 distances over the q1 wire equal plaintext /precisesearch."""
    cfg, engine, addr = served_q1
    client = ClientPipeline(cfg, server_addr=addr)

    captured = {}
    orig = client._post

    def spy(route, payload):
        r = orig(route, payload)
        captured[route] = r
        return r

    client._post = spy
    q = client.get_query()
    cent = client.get_centroids()
    _, sorted_cent = client.sort_nearest_centroids(q, cent)
    cs, ci, sizes = client.get_coarse_scores(sorted_cent, q)
    sorted_coarse = client.compute_nearest_coarse_vectors(cs, ci, sizes)
    enc_scores, cand = client.get_encrypted_precise_scores(sorted_coarse, q)
    plain_scores, cand2 = client.get_precise_scores(sorted_coarse, q)
    np.testing.assert_array_equal(cand, cand2)
    np.testing.assert_allclose(enc_scores, plain_scores, rtol=1e-6, atol=0.5)
    # the response actually rode the switched wire
    assert "c1Q1" in captured["encryptedsearch"]
    assert "c1Ntt" not in captured["encryptedsearch"]
