"""Coarse-stage privacy: the leakage analysis (VERDICT r02 item 5).

Quantifies what `coarseQueryCodes` disclose to an honest-but-curious
server, and pins the analysis math to the REAL wire path (client encode /
server reconstruct) so the committed numbers can't drift from the code.
"""

import types

import numpy as np
import pytest

from prefhetch_tpu.analysis import measure_coarse_leakage
from prefhetch_tpu.data.synthetic import make_clustered_dataset
from prefhetch_tpu.index.build import build_ivf_index
from prefhetch_tpu.utils.config import IndexParams


@pytest.fixture(scope="module")
def setup():
    data = make_clustered_dataset(
        nbase=8000, ntrain=8000, nquery=64, d=64, n_clusters=40,
        gt_k=10, seed=11,
    )
    params = IndexParams(d=64, nlist=32, pq_m=16, pq_nbits=8,
                         kmeans_iters=8, pq_kmeans_iters=8)
    index = build_ivf_index(data["train"], data["base"], params)
    return data, index


def test_codes_adversary_dominates_probe_adversary(setup):
    """The headline fact the README table documents: the PQ codes give the
    server a high-fidelity q̂ — top-1 NN recovery near-certain, far above
    what the probe list alone yields. The quantized coarse query is NOT
    private; it only avoids shipping the exact float query."""
    data, index = setup
    rep = measure_coarse_leakage(index, data["base"], data["query"])
    codes, probes = rep.adversaries["codes"], rep.adversaries["probes"]
    # reconstruction fidelity: codes sharpen the probe-only estimate
    assert codes.snr_db > probes.snr_db + 3.0
    # rank-1 recovery of the user's exact NN: the real privacy failure
    # (measured 0.52/0.66 at this M=16,d=64 scale; 0.51/0.64 at the
    # reference M=32,d=128/100K point — see README table)
    assert codes.top1_recovery >= 0.4
    assert codes.topk_overlap >= 0.5
    # the probe list alone is a much weaker adversary on this workload
    assert probes.topk_overlap < codes.topk_overlap - 0.2
    # the incremental disclosure is exactly the PQ cell id
    assert rep.code_bits == 16 * 8
    assert "top-1 NN recovery" in rep.summary()


def test_analysis_matches_served_reconstruction(setup):
    """The analysis must reconstruct q̂ EXACTLY as the serving path does
    (serve/handlers.py _reconstruct_coarse_query), else its numbers
    describe some other protocol."""
    data, index = setup
    from prefhetch_tpu.serve.handlers import Dispatcher

    q = data["query"].astype(np.float32)
    cent = np.asarray(index.centroids, np.float32)
    cb = np.asarray(index.codebooks, np.float32)
    M, ksub, dsub = cb.shape
    d2c = ((q[:, None, :] - cent[None]) ** 2).sum(-1)
    probes = np.argsort(d2c, axis=1)[:, :4].astype(np.int64)
    r = q - cent[probes[:, 0]] if index.params.by_residual else q
    rs = r.reshape(len(q), M, dsub)
    codes = np.argmin(
        ((rs[:, :, None, :] - cb[None]) ** 2).sum(-1), axis=-1
    ).astype(np.int64)

    disp = Dispatcher(types.SimpleNamespace(index=index))
    served_qhat = disp._reconstruct_coarse_query(codes, probes)

    # re-derive the analysis' q̂ with its own code path
    qhat = cb[np.arange(M)[None, :], codes].reshape(len(q), -1)
    if index.params.by_residual:
        qhat = qhat + cent[probes[:, 0]]
    np.testing.assert_allclose(served_qhat, qhat, rtol=1e-6, atol=1e-5)
