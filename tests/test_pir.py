"""Real-PIR tests: correctness, privacy shape, noise at production primes."""

import numpy as np
import pytest

from prefhetch_tpu.crypto.params import BFVParams, find_ntt_primes
from prefhetch_tpu.crypto.pir import PIRClient, PIRServer, pack_database


@pytest.fixture(scope="module")
def setup():
    # N=256, d=32 → 8 rows/block; nbase=100 → 13 blocks. t=2^9 for bytes.
    params = BFVParams(n=256, t=1 << 9, qs=tuple(find_ntt_primes(256, 30, 2)))
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, size=(100, 32)).astype(np.float32)
    server = PIRServer(base, params)
    client = PIRClient(params, seed=1)
    return params, base, server, client


def test_pir_retrieves_exact_rows(setup):
    params, base, server, client = setup
    for row in [0, 7, 8, 55, 99]:     # block starts, middles, last row
        q = client.build_query(row, base.shape[0], base.shape[1])
        resp = server.answer(q)
        got = client.decode_response(resp, base.shape[1])
        np.testing.assert_array_equal(got, base[row])


def test_pir_query_hides_index(setup):
    """Selector ciphertexts for two different rows must be computationally
    indistinguishable in shape/structure — same count, same sizes, and no
    plaintext index anywhere in the wire payload."""
    import json

    params, base, server, client = setup
    q1 = client.build_query(3, 100, 32)
    q2 = client.build_query (77, 100, 32)
    assert len(q1) == len(q2)
    assert {w["shape"][1] for w in q1} == {w["shape"][1] for w in q2}
    body = json.dumps(q1)
    assert '"row"' not in body and "nearestPreciseVector" not in body


def test_pir_wrong_query_size_rejected(setup):
    params, base, server, client = setup
    q = client.build_query(0, 100, 32)
    with pytest.raises(ValueError, match="must carry"):
        server.answer(q[:-1])


def test_pir_noise_margin_at_scale():
    """Noise after summing G ct×pt products must leave budget at a
    production-ish G (64 blocks)."""
    params = BFVParams(n=256, t=1 << 9, qs=tuple(find_ntt_primes(256, 30, 2)))
    rng = np.random.default_rng(9)
    nbase, d = 512, 32                  # G = 64 blocks
    base = rng.integers(0, 256, size=(nbase, d)).astype(np.float32)
    server = PIRServer(base, params)
    client = PIRClient(params, seed=2)
    row = 313
    q = client.build_query(row, nbase, d)
    resp = server.answer(q)
    got = client.decode_response(resp, d)
    np.testing.assert_array_equal(got, base[row])


def test_oblivious_expansion_correctness():
    """expand_query: one ct Enc(Σ a_b X^b) → m cts Enc(2^logm · a_b), in
    natural coefficient order."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import expand_query, expansion_galois_elements
    from prefhetch_tpu.crypto.bfv import BFVContext

    params = pir_params_for(256, 257, 2)
    ctx = BFVContext(params)
    rng = np.random.default_rng(21)
    sk, pk = ctx.keygen(rng)
    m = 13
    a = rng.integers(0, 2, m).astype(np.int64)
    poly = np.zeros(params.n, np.int64)
    poly[:m] = a
    ct = ctx.encrypt(pk, poly, rng)
    gks = ctx.galois_keygen(
        sk, expansion_galois_elements(params.n, m), rng
    )
    outs = expand_query(ctx, ct, m, gks)
    logm = max(1, (m - 1).bit_length())
    inv = pow(1 << logm, -1, params.t)
    for b in range(m):
        dec = ctx.decrypt(sk, outs[b])
        val = dec[0] * inv % params.t
        assert val == a[b], f"selector {b}: got {val}, want {a[b]}"
        # all other coefficients must decode to zero
        assert np.all((dec[1:] * inv) % params.t == 0)
