"""BFV + NTT + packing correctness tests (python-int / schoolbook oracles)."""

import numpy as np
import pytest

import jax.numpy as jnp

from prefhetch_tpu.crypto import BFVContext, default_bfv_params
from prefhetch_tpu.crypto.ntt import (
    build_tables,
    intt,
    naive_negacyclic_polymul,
    negacyclic_polymul,
    ntt,
)
from prefhetch_tpu.crypto.packing import (
    distances_from_inner_products,
    encode_query_poly,
    extract_inner_products,
    pack_candidates,
)
from prefhetch_tpu.crypto.params import BFVParams, find_ntt_primes


@pytest.fixture(scope="module")
def small_params():
    """N=256 keeps keygen/decrypt fast in tests; same prime sizes."""
    qs = tuple(find_ntt_primes(256, 30, 2))
    return BFVParams(n=256, t=1 << 24, qs=qs)


@pytest.fixture(scope="module")
def ctx(small_params):
    return BFVContext(small_params)


@pytest.fixture(scope="module")
def keys(ctx):
    return ctx.keygen(np.random.default_rng(42))


def test_ntt_primes_are_ntt_friendly():
    for n in (256, 4096):
        for q in find_ntt_primes(n, 30, 2):
            assert q % (2 * n) == 1
            assert q.bit_length() == 30


def test_ntt_roundtrip(small_params, rng):
    tb = build_tables(small_params.qs[0], small_params.n)
    x = rng.integers(0, tb.q, (4, small_params.n)).astype(np.int64)
    rt = np.asarray(intt(ntt(jnp.asarray(x), tb), tb))
    np.testing.assert_array_equal(rt, x)


def test_polymul_vs_schoolbook(small_params, rng):
    tb = build_tables(small_params.qs[0], small_params.n)
    a = rng.integers(0, tb.q, small_params.n).astype(np.int64)
    b = rng.integers(0, tb.q, small_params.n).astype(np.int64)
    got = np.asarray(negacyclic_polymul(jnp.asarray(a), jnp.asarray(b), tb))
    ref = naive_negacyclic_polymul(a, b, tb.q)
    np.testing.assert_array_equal(got, ref)


def test_encrypt_decrypt_roundtrip(ctx, keys, rng):
    sk, pk = keys
    m = rng.integers(0, ctx.params.t, ctx.params.n).astype(np.int64)
    ct = ctx.encrypt(pk, m, rng)
    out = ctx.decrypt(sk, ct)
    np.testing.assert_array_equal(out, m)


def test_fresh_noise_budget_positive(ctx, keys, rng):
    sk, pk = keys
    m = rng.integers(0, ctx.params.t, ctx.params.n).astype(np.int64)
    ct = ctx.encrypt(pk, m, rng)
    assert ctx.noise_budget_bits(sk, ct, m) > 15


def test_homomorphic_add(ctx, keys, rng):
    sk, pk = keys
    t = ctx.params.t
    m1 = rng.integers(0, t, ctx.params.n).astype(np.int64)
    m2 = rng.integers(0, t, ctx.params.n).astype(np.int64)
    ct = ctx.add(ctx.encrypt(pk, m1, rng), ctx.encrypt(pk, m2, rng))
    np.testing.assert_array_equal(ctx.decrypt(sk, ct), (m1 + m2) % t)


def test_mul_plain_ntt(ctx, keys, rng):
    """ct×pt in NTT domain decrypts to m·p mod (X^N+1, t)."""
    sk, pk = keys
    n, t = ctx.params.n, ctx.params.t
    m = rng.integers(0, 256, n).astype(np.int64)      # small values
    p = np.zeros(n, np.int64)
    p[: 16] = rng.integers(0, 256, 16)                # sparse small plaintext
    ct = ctx.to_ntt(ctx.encrypt(pk, m, rng))
    out_ct = ctx.mul_plain_ntt(ct, ctx.plain_to_ntt(p))
    got = ctx.decrypt(sk, out_ct)
    ref = naive_negacyclic_polymul(m, p, t)           # mod t (q≫ values)
    np.testing.assert_array_equal(got, ref % t)


def test_decrypt_batch_matches_single(ctx, keys, rng):
    sk, pk = keys
    t = ctx.params.t
    ms = [rng.integers(0, t, ctx.params.n).astype(np.int64) for _ in range(4)]
    cts = [ctx.encrypt(pk, m, rng) for m in ms]
    cts[1] = ctx.to_ntt(cts[1])  # mixed domains not allowed in one batch —
    cts[1] = ctx.from_ntt(cts[1])  # roundtrip to keep domain uniform
    batch = ctx.decrypt_batch(sk, cts)
    for i, m in enumerate(ms):
        np.testing.assert_array_equal(batch[i], m)
        np.testing.assert_array_equal(batch[i], ctx.decrypt(sk, cts[i]))


def test_ciphertext_wire_roundtrip(ctx, keys, rng):
    sk, pk = keys
    from prefhetch_tpu.crypto.bfv import Ciphertext

    m = rng.integers(0, ctx.params.t, ctx.params.n).astype(np.int64)
    ct = ctx.encrypt(pk, m, rng)
    ct2 = Ciphertext.from_wire(ct.to_wire())
    np.testing.assert_array_equal(ctx.decrypt(sk, ct2), m)


def test_ct_ct_mul_relinearize(rng):
    """Enc(m1)·Enc(m2) → Enc(m1·m2 mod (X^N+1, t)) — the full BFV
    multiplication with exact tensor rounding + relinearization.

    Uses t=2^12: FV multiplication noise scales with t·E_fresh, so a 60-bit
    q supports ct×ct only for small t (t=2^16 is marginal; the protocol's
    t=2^24 operating point is ct×pt-only by design — inner products need no
    ct×ct)."""
    rng = np.random.default_rng(2024)  # own stream: noise margin is seedful
    qs = tuple(find_ntt_primes(256, 30, 2))
    params = BFVParams(n=256, t=1 << 12, qs=qs)
    ctx = BFVContext(params)
    sk, pk = ctx.keygen(rng)
    n, t = params.n, params.t
    m1 = rng.integers(0, t, n).astype(np.int64)
    m2 = rng.integers(0, t, n).astype(np.int64)
    rk = ctx.relin_keygen(sk, rng)
    ct = ctx.mul(
        ctx.encrypt(pk, m1, rng), ctx.encrypt(pk, m2, rng), rk
    )
    got = ctx.decrypt(sk, ct)
    ref = naive_negacyclic_polymul(m1, m2, t) % t
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# End-to-end encrypted inner products at the real operating point shape
def test_encrypted_inner_products_end_to_end(small_params, rng):
    """Client encrypts query; 'server' multiplies packed candidate blocks;
    client decrypts exact SIFT-scale inner products."""
    d = 32  # N=256 → 8 candidates per block
    ctx = BFVContext(small_params)
    sk, pk = ctx.keygen(rng)

    q = rng.integers(0, 256, d).astype(np.float32)
    X = rng.integers(0, 256, size=(20, d)).astype(np.float32)

    # client: encrypt query poly
    ct = ctx.to_ntt(ctx.encrypt(pk, encode_query_poly(q, small_params), rng))

    # server: pack candidates, one ct×pt per block
    polys, B = pack_candidates(X, small_params)
    out_cts = [ctx.mul_plain_ntt(ct, ctx.plain_to_ntt(p)) for p in polys]

    # client: decrypt + extract
    prods = np.stack([ctx.decrypt(sk, c) for c in out_cts])
    ips = extract_inner_products(prods, d, 20)
    ref = (np.round(q).astype(np.int64) * np.round(X).astype(np.int64)).sum(-1)
    np.testing.assert_array_equal(ips, ref)

    # distances assembly matches plain L2
    norms = (np.round(X).astype(np.int64) ** 2).sum(-1)
    dist = distances_from_inner_products(q, ips, norms)
    refd = ((np.round(q) - np.round(X)) ** 2).sum(-1)
    np.testing.assert_allclose(dist, refd)


def test_signed_inner_products_roundtrip(small_params, rng):
    """Signed integer data: mod-t encode + centered-lift decode is exact."""
    d = 32
    ctx = BFVContext(small_params)
    sk, pk = ctx.keygen(rng)

    q = rng.integers(-128, 128, d).astype(np.float32)
    X = rng.integers(-128, 128, size=(20, d)).astype(np.float32)

    ct = ctx.to_ntt(ctx.encrypt(pk, encode_query_poly(q, small_params), rng))
    polys, _ = pack_candidates(X, small_params)
    out_cts = [ctx.mul_plain_ntt(ct, ctx.plain_to_ntt(p)) for p in polys]
    prods = np.stack([ctx.decrypt(sk, c) for c in out_cts])
    ips = extract_inner_products(prods, d, 20, small_params.t)
    ref = (np.round(q).astype(np.int64) * np.round(X).astype(np.int64)).sum(-1)
    np.testing.assert_array_equal(ips, ref)
    assert (ref < 0).any(), "test vectors should exercise negative products"

    norms = (np.round(X).astype(np.int64) ** 2).sum(-1)
    dist = distances_from_inner_products(q, ips, norms)
    refd = ((np.round(q) - np.round(X)) ** 2).sum(-1)
    np.testing.assert_allclose(dist, refd)


def test_fractional_data_rejected(small_params):
    """Unit-normalized (cosine-style) floats must raise, not round silently."""
    q = np.full(32, 0.177, np.float32)
    with pytest.raises(ValueError, match="integer-valued"):
        encode_query_poly(q, small_params)
    with pytest.raises(ValueError, match="integer-valued"):
        pack_candidates(np.full((4, 32), 0.3, np.float32), small_params)


def test_secure_rng_default_and_determinism():
    from prefhetch_tpu.crypto.rng import SecureRNG, secure_rng

    r = secure_rng()          # production mode: OS entropy
    assert isinstance(r, SecureRNG)
    tern = r.integers(-1, 2, size=4096)
    assert tern.min() >= -1 and tern.max() <= 1
    assert len(np.unique(tern)) == 3
    bits = r.integers(0, 2, size=(64, 2, 8))
    assert bits.shape == (64, 2, 8) and bits.min() >= 0 and bits.max() <= 1
    big = r.integers(0, 1 << 62, size=256)
    assert big.min() >= 0 and int(big.max()) < (1 << 62)
    # two OS-entropy instances must disagree (keys are not derivable)
    r2 = secure_rng()
    assert not np.array_equal(
        r.integers(0, 1 << 62, size=64), r2.integers(0, 1 << 62, size=64)
    )
    # integer seed (tests only) stays deterministic numpy
    assert isinstance(secure_rng(7), np.random.Generator)


def test_heclient_keys_differ_without_seed():
    from prefhetch_tpu.client.he import HEClient
    from prefhetch_tpu.utils.config import HEParams

    he = HEParams(scheme="bfv", n=256, t_bits=24, n_limbs=2)
    a, b = HEClient(he), HEClient(he)
    assert not np.array_equal(a.sk.s_rns, b.sk.s_rns)


def test_seeded_symmetric_encryption_roundtrip():
    """Seeded symmetric ciphertexts: (c0, 32-byte seed) wire → server-side
    expansion → decrypt must return the message; the wire must be ~half the
    public-key ciphertext size."""
    import json

    from prefhetch_tpu.crypto.params import bfv_params_for

    params = bfv_params_for(1024, 16, 2)
    ctx = BFVContext(params)
    rng = np.random.default_rng(5)
    sk, pk = ctx.keygen(rng)
    ms = rng.integers(0, params.t, size=(3, params.n))

    wires = ctx.encrypt_symmetric_batch_ntt(sk, ms, rng)
    for b, w in enumerate(wires):
        assert "c1" not in w and "seed" in w
        ct = ctx.ct_from_wire(w)
        got = ctx.decrypt(sk, ct)
        np.testing.assert_array_equal(got, ms[b] % params.t)

    pk_size = len(json.dumps(
        ctx.to_ntt(ctx.encrypt(pk, ms[0], rng)).to_wire()
    ))
    sym_size = len(json.dumps(wires[0]))
    assert sym_size < 0.6 * pk_size


def test_seeded_expansion_is_deterministic():
    from prefhetch_tpu.crypto.params import bfv_params_for

    params = bfv_params_for(1024, 16, 2)
    ctx = BFVContext(params)
    a1 = ctx.expand_a(b"\x01" * 32)
    a2 = ctx.expand_a(b"\x01" * 32)
    np.testing.assert_array_equal(a1, a2)
    a3 = ctx.expand_a(b"\x02" * 32)
    assert not np.array_equal(a1, a3)
    qs = np.array(params.qs)[:, None]
    assert (a1 >= 0).all() and (a1 < qs).all()


def test_seeded_symmetric_feeds_trunc_mac():
    """The production path: seeded query cts through the truncated-response
    MAC must produce exact distances (server expands c1 from the seed)."""
    from prefhetch_tpu.client.he import HEClient
    from prefhetch_tpu.engine.hecompute import HEComputeService
    from prefhetch_tpu.utils.config import HEParams

    hc = HEClient(HEParams(n=1024, t_bits=24, n_limbs=2), seed=9)
    svc = HEComputeService(hc.params, backend="numpy")
    rng = np.random.default_rng(10)
    base = rng.integers(0, 100, size=(50, 8)).astype(np.float32)
    svc.set_base(base)
    queries = rng.integers(0, 100, size=(2, 8)).astype(np.float32)
    idx = np.stack([np.arange(16), np.arange(10, 26)])

    wires = hc.encrypt_query_batch(queries)
    assert all("seed" in w for w in wires)
    cts = [svc.ctx.ct_from_wire(w) for w in wires]
    c1_ntt, c0_ip, norms = svc.encrypted_scores_trunc(cts, idx)
    out = hc.decrypt_scores_trunc(c1_ntt, c0_ip, norms, queries)
    ref = ((base[idx].astype(np.float64) - queries[:, None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(out, ref, atol=0.5)


def test_mul_exact_large_params():
    """ct×ct through the mixed-radix RNS scale must be exact at N=2048
    (bigger aux basis — exercises base extension, the F=[v>Q/2] centering
    compare, and the w' digit reduction on multi-prime paths)."""
    from prefhetch_tpu.crypto.params import bfv_params_for

    params = bfv_params_for(2048, 16, 2)
    ctx = BFVContext(params)
    rng = np.random.default_rng(6)
    sk, pk = ctx.keygen(rng)
    rk = ctx.relin_keygen(sk, rng)
    m1 = rng.integers(0, 30, 2048)
    m2 = rng.integers(0, 30, 2048)
    prod = ctx.mul(ctx.encrypt(pk, m1, rng), ctx.encrypt(pk, m2, rng), rk)
    got = ctx.decrypt(sk, prod)
    full = np.polymul(m1[::-1].astype(object), m2[::-1].astype(object))[::-1]
    ref = np.zeros(2048, object)
    for i, c in enumerate(full):
        if i < 2048:
            ref[i] += c
        else:
            ref[i - 2048] -= c
    ref = np.array([int(v) % params.t for v in ref], np.int64)
    np.testing.assert_array_equal(got, ref)
