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


def test_pir2d_roundtrip_and_grid():
    """2-D hypercube PIR: exact retrieval; server sees only ciphertexts."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import PIR2Server, PIRClient

    p = pir_params_for(256, 257, 2)
    rng = np.random.default_rng(4)
    nbase, d = 300, 32          # R=8, G=38, g1=7, g2=6
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    client = PIRClient(p, seed=6)
    server = PIR2Server(base, p)
    server.register_galois_keys(
        client.key_id, client.galois_keys_wire_2d(nbase, d)
    )
    for row in (0, 37, 299):
        w, r = client.build_query_2d(row, nbase, d)
        resp = server.answer_2d(w, client.key_id)
        got = client.decode_response_2d(resp, d, r)
        np.testing.assert_array_equal(got, base[row])
    # upload is ONE ct regardless of G; response is 2·n_digits cts
    assert len(resp["cts"]) == 2 * resp["nDigits"]


def test_pir2d_device_matches_host():
    """The jitted device pipeline (CPU backend here) equals the host oracle
    bit-for-bit and decodes to the exact row."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import PIR2Server, PIRClient
    from prefhetch_tpu.engine.pir_device import DevicePIR2

    p = pir_params_for(256, 257, 2)
    rng = np.random.default_rng(4)
    nbase, d = 300, 32
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    client = PIRClient(p, seed=6)
    host = PIR2Server(base, p)
    dev = DevicePIR2(base, p)
    gw = client.galois_keys_wire_2d(nbase, d)
    host.register_galois_keys(client.key_id, gw)
    dev.register_galois_keys(client.key_id, gw)
    w, r = client.build_query_2d(123, nbase, d)
    rh = host.answer_2d(w, client.key_id)
    rd = dev.answer_2d(w, client.key_id)
    for ch, cd in zip(rh["cts"], rd["cts"]):
        np.testing.assert_array_equal(
            np.asarray(ch["c0"]["b64"]), np.asarray(cd["c0"]["b64"])
        )
    got = client.decode_response_2d(rd, d, r)
    np.testing.assert_array_equal(got, base[123])


def test_pir2d_query_hides_index():
    """Two queries for different rows are fresh encryptions — the wire
    bytes share no structure the server could exploit (distinct ct values,
    same shape/metadata)."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import PIRClient

    p = pir_params_for(256, 257, 2)
    client = PIRClient(p, seed=9)
    w1, _ = client.build_query_2d(5, 300, 32)
    w2, _ = client.build_query_2d(250, 300, 32)
    w3, _ = client.build_query_2d(5, 300, 32)   # same row, fresh randomness
    assert w1["c0"] != w2["c0"] and w1["c0"] != w3["c0"]
    assert set(w1.keys()) == set(w2.keys())


def test_pir2d_at_100k_rows():
    """VERDICT done-criterion: privacy contract at ≥100K rows. The query
    wire is one ciphertext (no index anywhere); retrieval is exact."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import PIR2Server, PIRClient, grid_dims

    p = pir_params_for(1024, 257, 2)     # N=1024 keeps host answering fast
    rng = np.random.default_rng(11)
    nbase, d = 100_000, 32               # R=32 → G=3125, 56×56 grid
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    client = PIRClient(p, seed=12)
    server = PIR2Server(base, p)
    G, g1, g2 = grid_dims(p, nbase, d)
    assert g1 * g2 >= G
    server.register_galois_keys(
        client.key_id, client.galois_keys_wire_2d(nbase, d)
    )
    row = 73_219
    wire, r = client.build_query_2d(row, nbase, d)
    # privacy: the wire is ciphertext-only — no field encodes the row
    assert set(wire.keys()) <= {"c0", "c1", "isNtt", "shape"}
    resp = server.answer_2d(wire, client.key_id)
    got = client.decode_response_2d(resp, d, r)
    np.testing.assert_array_equal(got, base[row])


def test_pir2d_batch_matches_single():
    """answer_2d_batch (vmapped one-DB-pass fold, engine/pir_device.py)
    returns byte-identical wires to per-query answer_2d across bucket
    boundaries (6 rows -> bucket 4 + padded bucket 4)."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import PIRClient
    from prefhetch_tpu.engine.pir_device import DevicePIR2

    p = pir_params_for(256, 257, 2)
    rng = np.random.default_rng(11)
    nbase, d = 300, 32
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    client = PIRClient(p, seed=13)
    dev = DevicePIR2(base, p)
    dev.register_galois_keys(
        client.key_id, client.galois_keys_wire_2d(nbase, d)
    )
    rows = [5, 123, 123, 0, 299, 42]
    wires, rs = zip(*(client.build_query_2d(r, nbase, d) for r in rows))
    batch = dev.answer_2d_batch(list(wires), client.key_id)
    assert len(batch) == len(rows)
    for w, resp, row, r in zip(wires, batch, rows, rs):
        single = dev.answer_2d(w, client.key_id)
        for cs, cb in zip(single["cts"], resp["cts"]):
            np.testing.assert_array_equal(
                np.asarray(cs["c0"]["b64"]), np.asarray(cb["c0"]["b64"])
            )
            np.testing.assert_array_equal(
                np.asarray(cs["c1"]["b64"]), np.asarray(cb["c1"]["b64"])
            )
        got = client.decode_response_2d(resp, d, r)
        np.testing.assert_array_equal(got, base[row])


def test_pir2d_multi_row_host_roundtrip():
    """Multi-row packed query (crypto/pir.build_query_2d_multi): ONE ct
    fetches several rows; each decodes exactly. Upload per row shrinks
    K× vs build_query_2d (ROADMAP: ~11 rows/ct at nbase=1M)."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import PIR2Server, PIRClient

    p = pir_params_for(256, 257, 2)
    rng = np.random.default_rng(21)
    nbase, d = 300, 32
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    client = PIRClient(p, seed=22)
    server = PIR2Server(base, p)
    k_ct = client.rows_per_ct(nbase, d)
    assert k_ct >= 2
    rows = [0, 37, 299, 123, 123][: min(5, k_ct)]
    server.register_galois_keys(
        client.key_id, client.galois_keys_wire_2d_multi(nbase, d, len(rows))
    )
    wire, rs = client.build_query_2d_multi(rows, nbase, d)
    resps = server.answer_2d_multi(wire, client.key_id, len(rows))
    assert len(resps) == len(rows)
    for row, resp, r in zip(rows, resps, rs):
        got = client.decode_response_2d(resp, d, r)
        np.testing.assert_array_equal(got, base[row])
    # privacy shape: the wire is one ciphertext, no index fields
    assert set(wire.keys()) <= {"c0", "c1", "isNtt", "shape"}


def test_pir2d_multi_row_device_matches_host():
    """DevicePIR2.answer_2d_multi equals the host oracle bit-for-bit."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import PIR2Server, PIRClient
    from prefhetch_tpu.engine.pir_device import DevicePIR2

    p = pir_params_for(256, 257, 2)
    rng = np.random.default_rng(23)
    nbase, d = 300, 32
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    client = PIRClient(p, seed=24)
    host = PIR2Server(base, p)
    dev = DevicePIR2(base, p)
    rows = [5, 123, 299]
    gw = client.galois_keys_wire_2d_multi(nbase, d, len(rows))
    host.register_galois_keys(client.key_id, gw)
    dev.register_galois_keys(client.key_id, gw)
    wire, rs = client.build_query_2d_multi(rows, nbase, d)
    rh = host.answer_2d_multi(wire, client.key_id, len(rows))
    rd = dev.answer_2d_multi(wire, client.key_id, len(rows))
    for h, dv in zip(rh, rd):
        assert h["logF"] == dv["logF"]
        for ch, cd in zip(h["cts"], dv["cts"]):
            np.testing.assert_array_equal(
                np.asarray(ch["c0"]["b64"]), np.asarray(cd["c0"]["b64"])
            )
            np.testing.assert_array_equal(
                np.asarray(ch["c1"]["b64"]), np.asarray(cd["c1"]["b64"])
            )
    for row, resp, r in zip(rows, rd, rs):
        np.testing.assert_array_equal(
            client.decode_response_2d(resp, d, r), base[row]
        )


def test_pir2d_multi_row_depth_guards():
    """Single-row keys must be rejected for deeper multi-row expansion;
    n_rows beyond ⌊N/m⌋ must be rejected at build and answer time."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import PIRClient
    from prefhetch_tpu.engine.pir_device import DevicePIR2

    p = pir_params_for(256, 257, 2)
    rng = np.random.default_rng(25)
    nbase, d = 300, 32
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    client = PIRClient(p, seed=26)
    dev = DevicePIR2(base, p)
    dev.register_galois_keys(
        client.key_id, client.galois_keys_wire_2d(nbase, d)
    )
    k_ct = dev.rows_per_ct()
    with pytest.raises(ValueError, match="rows need"):
        client.build_query_2d_multi([0] * (k_ct + 1), nbase, d)
    wire, _ = client.build_query_2d_multi([0] * k_ct, nbase, d)
    with pytest.raises(ValueError, match="levels"):
        dev.answer_2d_multi(wire, client.key_id, k_ct)
    with pytest.raises(ValueError, match="outside"):
        dev.answer_2d_multi(wire, client.key_id, k_ct + 1)


def test_pir2d_multi_batch_matches_per_ct():
    """answer_2d_multi_batch (vmapped over packed cts) is bit-identical to
    per-ct answer_2d_multi and decodes exactly; exercises the bucketed
    path with a ct count that is not a bucket multiple (3 = 2 + fallback)."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import PIRClient
    from prefhetch_tpu.engine.pir_device import DevicePIR2

    p = pir_params_for(256, 257, 2)
    rng = np.random.default_rng(27)
    nbase, d = 300, 32
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    client = PIRClient(p, seed=28)
    dev = DevicePIR2(base, p)
    n_rows = 3
    dev.register_galois_keys(
        client.key_id, client.galois_keys_wire_2d_multi(nbase, d, n_rows)
    )
    chunks = [[0, 37, 299], [123, 1, 2], [250, 250, 44]]
    wires, rads = [], []
    for ch in chunks:
        w, rs = client.build_query_2d_multi(ch, nbase, d)
        wires.append(w)
        rads.append(rs)
    got = dev.answer_2d_multi_batch(wires, client.key_id, n_rows)
    assert len(got) == len(chunks) * n_rows
    ref = []
    for w in wires:
        ref.extend(dev.answer_2d_multi(w, client.key_id, n_rows))
    for g, rf in zip(got, ref):
        assert g["logF"] == rf["logF"]
        for cg, cr in zip(g["cts"], rf["cts"]):
            assert cg["c0"]["b64"] == cr["c0"]["b64"]
            assert cg["c1"]["b64"] == cr["c1"]["b64"]
    k = 0
    for ch, rs in zip(chunks, rads):
        for row, r in zip(ch, rs):
            np.testing.assert_array_equal(
                client.decode_response_2d(got[k], d, r), base[row]
            )
            k += 1


def test_pir2d_multi_row_production_params_decode():
    """PRODUCTION-params noise validation of the multi-row packed wire
    (ADVICE r03 medium): N=4096 / t=257 / 2×30-bit limbs — the exact ring
    the serving engine uses (utils/config.HEParams defaults) — packed to
    force the FULL 12-level expansion tree (the depth a fully-packed 1M
    fetch pays: k_ct·m ≈ N ⇒ ceil(log2(k_ct·m)) = log2(N)). Every row must
    decode EXACTLY; the multi-row doubling rounds spend ~log2(rows_per_ct)
    more noise bits than the single-row wire, and toy-params tests (n=256
    above) cannot see that margin."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import PIR2Server, PIRClient, grid_dims

    p = pir_params_for(4096, 257, 2)
    nbase, d = 5000, 128
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    client = PIRClient(p, seed=5)
    server = PIR2Server(base, p)
    _, g1, g2 = grid_dims(p, nbase, d)
    m = g1 + g2
    # smallest row count whose n_rows·m crosses N/2 — same tree depth as a
    # fully-packed production ct, at the least host-answer cost (~50 s)
    n_rows = (p.n // 2) // m + 1
    assert (n_rows * m - 1).bit_length() == (p.n - 1).bit_length()
    rows = rng.integers(0, nbase, n_rows).tolist()
    server.register_galois_keys(
        client.key_id, client.galois_keys_wire_2d_multi(nbase, d, n_rows)
    )
    wire, rs = client.build_query_2d_multi(rows, nbase, d)
    resps = server.answer_2d_multi(wire, client.key_id, n_rows)
    assert len(resps) == n_rows
    for row, resp, r in zip(rows, resps, rs):
        np.testing.assert_array_equal(
            client.decode_response_2d(resp, d, r), base[row]
        )


def test_pir2d_galois_depth_no_downgrade():
    """A shallow single-row key registration under a key_id that already
    holds the SAME client's deeper multi-row stack must NOT truncate it
    (ADVICE r03: the downgrade silently broke later multi-row answers);
    a different client's keys under the same id still overwrite."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import PIRClient
    from prefhetch_tpu.engine.pir_device import DevicePIR2

    p = pir_params_for(256, 257, 2)
    rng = np.random.default_rng(41)
    nbase, d = 300, 32
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    client = PIRClient(p, seed=42)
    dev = DevicePIR2(base, p)
    n_rows = 3
    dev.register_galois_keys(
        client.key_id, client.galois_keys_wire_2d_multi(nbase, d, n_rows)
    )
    deep = dev._keys[client.key_id][0].shape[0]
    # same client re-registers the single-row (shallower) key set
    dev.register_galois_keys(
        client.key_id, client.galois_keys_wire_2d(nbase, d)
    )
    assert dev._keys[client.key_id][0].shape[0] == deep  # kept the deep stack
    w, rs = client.build_query_2d_multi([0, 37, 299], nbase, d)
    resps = dev.answer_2d_multi(w, client.key_id, n_rows)  # still answers
    for row, resp, r in zip([0, 37, 299], resps, rs):
        np.testing.assert_array_equal(
            client.decode_response_2d(resp, d, r), base[row]
        )
    # a DIFFERENT client under the same id overwrites (its own keys win)
    other = PIRClient(p, seed=99)
    dev.register_galois_keys(
        client.key_id, other.galois_keys_wire_2d(nbase, d)
    )
    w2, r2 = other.build_query_2d(37, nbase, d)
    resp2 = dev.answer_2d(w2, client.key_id)
    np.testing.assert_array_equal(
        other.decode_response_2d(resp2, d, r2), base[37]
    )
