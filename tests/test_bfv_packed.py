"""Packed single-ct BFV response (resp_mod="packed").

The reference reserved an encrypted re-rank (include/client/client_lib.h:28-30)
with no wire budget; the q1 wire still ships a full c1 polynomial per
(query, block). The packed mode coefficient-extracts the inner products
(SealPIR automorphisms in the killing direction) and shift-packs d/nb
queries' worth of blocks into ONE 2-limb ciphertext. These tests pin:

1. end-to-end exactness at the production operating point (N=4096,
   t=2^24+1 odd, d=128, P=256): decrypted distances == plaintext distances
   (BFV is exact — equality, not closeness);
2. the jitted device program (PFH_HE_BACKEND-style backend="tpu" on the
   CPU suite) is bit-identical to the numpy host oracle;
3. guard rails: even t refuses, missing Galois keys refuse.
"""

import numpy as np
import pytest

from prefhetch_tpu.client.he import HEClient
from prefhetch_tpu.crypto.params import bfv_params_for
from prefhetch_tpu.engine.hecompute import HEComputeService
from prefhetch_tpu.utils.config import HEParams

D = 128
P = 256


def _setup(nq, seed=3, backend="numpy"):
    he = HEParams(scheme="bfv", resp_mod="packed")
    hc = HEClient(he, seed=seed)
    svc = HEComputeService(hc.params, backend=backend)
    rng = np.random.default_rng(seed + 1)
    base = rng.integers(0, 256, size=(1500, D)).astype(np.float32)
    svc.set_base(base)
    gks = hc.bfv_extraction_keys_wire(D)
    svc.register_galois_keys(hc.key_id, gks)
    queries = rng.integers(0, 256, size=(nq, D)).astype(np.float64)
    cand = np.stack(
        [rng.permutation(1500)[:P] for _ in range(nq)]
    ).astype(np.int64)
    return hc, svc, base, queries, cand


@pytest.mark.parametrize("nq", [1, 3])
def test_packed_exact_distances(nq):
    hc, svc, base, queries, cand = _setup(nq)
    wires = hc.encrypt_query_batch(queries)
    cts = [svc.ctx.ct_from_wire(w) for w in wires]
    packed, norms, grp = svc.encrypted_scores_packed(cts, cand, hc.key_id)
    # wire size: ceil(nq/G) cts of 2·L·N residues — per query this is
    # ~2 KB at the production point (vs 132 KB on the q1 wire)
    assert len(packed) == -(-nq // grp)
    dist = hc.decrypt_scores_packed(
        [c.to_wire() for c in packed], norms, queries, grp
    )
    ref = ((base[cand].astype(np.float64) - queries[:, None]) ** 2).sum(-1)
    np.testing.assert_array_equal(dist.astype(np.float64), ref)


def test_packed_device_matches_host():
    """The jitted four-step-NTT program == numpy oracle, bit for bit."""
    nq = 2
    hc, svc, base, queries, cand = _setup(nq, seed=7)
    svc_dev = HEComputeService(hc.params, backend="tpu")
    svc_dev.set_base(base)
    gks = {
        str(g): rk.to_wire() for g, rk in hc._galois_bfv.items()
    }
    svc_dev.register_galois_keys(hc.key_id, gks)
    wires = hc.encrypt_query_batch(queries)
    cts_h = [svc.ctx.ct_from_wire(w) for w in wires]
    cts_d = [svc_dev.ctx.ct_from_wire(w) for w in wires]
    ph, nh, gh = svc.encrypted_scores_packed(cts_h, cand, hc.key_id)
    pd, nd, gd = svc_dev.encrypted_scores_packed(cts_d, cand, hc.key_id)
    assert gh == gd and len(ph) == len(pd)
    np.testing.assert_array_equal(nh, nd)
    for a, b in zip(ph, pd):
        np.testing.assert_array_equal(a.c0, b.c0)
        np.testing.assert_array_equal(a.c1, b.c1)


def test_packed_seeded_wire_device_matches_host():
    """seedTf wires: the device program regenerates c1 from the 8-byte
    threefry key INSIDE the jit — outputs must be bit-identical to the
    host path that expands the same wires with ct_from_wire, and decode
    to exact distances."""
    nq = 2
    hc, svc, base, queries, cand = _setup(nq, seed=13)
    svc_dev = HEComputeService(hc.params, backend="tpu")
    svc_dev.set_base(base)
    gks = {str(g): rk.to_wire() for g, rk in hc._galois_bfv.items()}
    svc_dev.register_galois_keys(hc.key_id, gks)
    wires = hc.encrypt_query_batch(queries)      # resp_mod=packed → seedTf
    assert all("seedTf" in w for w in wires)
    # host oracle expands the SAME threefry seeds via ct_from_wire
    cts_h = [svc.ctx.ct_from_wire(w) for w in wires]
    ph, nh, gh = svc.encrypted_scores_packed(cts_h, cand, hc.key_id)
    pd, nd, gd = svc_dev.encrypted_scores_packed_wire(wires, cand, hc.key_id)
    assert gh == gd and len(ph) == len(pd)
    np.testing.assert_array_equal(nh, nd)
    for a, b in zip(ph, pd):
        np.testing.assert_array_equal(a.c0, b.c0)
        np.testing.assert_array_equal(a.c1, b.c1)
    dist = hc.decrypt_scores_packed(
        [c.to_wire() for c in pd], nd, queries, gd
    )
    ref = ((base[cand].astype(np.float64) - queries[:, None]) ** 2).sum(-1)
    np.testing.assert_array_equal(dist.astype(np.float64), ref)


def test_packed_client_gets_odd_t():
    """resp_mod="packed" must flip the client to an ODD plaintext modulus
    (the ×d extraction factor inverts mod t client-side)."""
    hc = HEClient(HEParams(scheme="bfv", resp_mod="packed"), seed=1)
    assert hc.params.t % 2 == 1
    assert bfv_params_for(4096, 24, 2).t % 2 == 0   # default stays 2^24


def test_packed_missing_keys_raise():
    hc, svc, base, queries, cand = _setup(1)
    wires = hc.encrypt_query_batch(queries)
    cts = [svc.ctx.ct_from_wire(w) for w in wires]
    with pytest.raises(ValueError, match="keyId"):
        svc.encrypted_scores_packed(cts, cand, "nope")
