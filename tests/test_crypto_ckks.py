"""CKKS tests: embedding roundtrip, enc/dec, ct×pt+rescale, rotations,
slot-packed inner products (numpy float oracle)."""

import numpy as np
import pytest

from prefhetch_tpu.crypto.ckks import CKKSContext
from prefhetch_tpu.crypto.params import CKKSParams, find_ntt_primes


@pytest.fixture(scope="module")
def ctx():
    n = 512  # small ring keeps tests fast; slots = 256
    return CKKSContext(CKKSParams(n=n, scale_bits=26,
                                  qs=tuple(find_ntt_primes(n, 30, 3))))


@pytest.fixture(scope="module")
def keys(ctx):
    return ctx.keygen(np.random.default_rng(1))


def test_encode_decode_roundtrip(ctx, rng):
    v = rng.normal(size=ctx.params.n // 2) * 10
    coeffs = ctx.encode(v)
    out = ctx.decode(coeffs.astype(np.float64), ctx.scale)
    np.testing.assert_allclose(np.real(out), v, atol=1e-4)
    np.testing.assert_allclose(np.imag(out), 0, atol=1e-4)


def test_encrypt_decrypt(ctx, keys, rng):
    sk, pk = keys
    v = rng.normal(size=ctx.params.n // 2) * 100
    ct = ctx.encrypt(pk, ctx.encode(v), rng)
    out = np.real(ctx.decrypt(sk, ct))
    np.testing.assert_allclose(out, v, atol=1e-2)


def test_homomorphic_add(ctx, keys, rng):
    sk, pk = keys
    a = rng.normal(size=ctx.params.n // 2)
    b = rng.normal(size=ctx.params.n // 2)
    ct = ctx.add(
        ctx.encrypt(pk, ctx.encode(a), rng),
        ctx.encrypt(pk, ctx.encode(b), rng),
    )
    np.testing.assert_allclose(np.real(ctx.decrypt(sk, ct)), a + b, atol=1e-2)


def test_mul_plain_rescale(ctx, keys, rng):
    sk, pk = keys
    a = rng.normal(size=ctx.params.n // 2) * 5
    b = rng.normal(size=ctx.params.n // 2) * 5
    ct = ctx.encrypt(pk, ctx.encode(a), rng)
    ct2 = ctx.mul_plain(ct, ctx.encode(b), ctx.scale)
    assert ct2.level == ct.level - 1
    out = np.real(ctx.decrypt(sk, ct2))
    np.testing.assert_allclose(out, a * b, atol=0.05)


def test_rotation(ctx, keys, rng):
    sk, pk = keys
    nh = ctx.params.n // 2
    v = rng.normal(size=nh) * 10
    gks = ctx.galois_keygen(sk, [1, 4], rng)
    ct = ctx.encrypt(pk, ctx.encode(v), rng)
    for step in (1, 4):
        rot = ctx.rotate(ct, step, gks[step])
        out = np.real(ctx.decrypt(sk, rot))
        np.testing.assert_allclose(out, np.roll(v, -step), atol=0.05)


def test_ct_ct_mul_relinearize(ctx, keys, rng):
    """Enc(a)·Enc(b) with relinearization ≈ a·b slot-wise."""
    sk, pk = keys
    nh = ctx.params.n // 2
    a = rng.normal(size=nh) * 3
    b = rng.normal(size=nh) * 3
    rk = ctx.relin_keygen(sk, rng)
    ct = ctx.mul(
        ctx.encrypt(pk, ctx.encode(a), rng),
        ctx.encrypt(pk, ctx.encode(b), rng),
        rk,
    )
    assert ct.level == len(ctx.qs) - 1
    out = np.real(ctx.decrypt(sk, ct))
    np.testing.assert_allclose(out, a * b, atol=0.05)


def test_mul_then_add_composes(ctx, keys, rng):
    sk, pk = keys
    nh = ctx.params.n // 2
    a = rng.normal(size=nh)
    b = rng.normal(size=nh)
    c = rng.normal(size=nh)
    rk = ctx.relin_keygen(sk, rng)
    ab = ctx.mul(ctx.encrypt(pk, ctx.encode(a), rng),
                 ctx.encrypt(pk, ctx.encode(b), rng), rk)
    # to add Enc(c) at the lower level/scale, encode at the matched scale
    cc = ctx.encrypt(pk, ctx.encode(c, scale=ab.scale), rng, scale=ab.scale)
    cc = CKKSLevelDrop(ctx, cc, ab.level)
    out = np.real(ctx.decrypt(sk, ctx.add(ab, cc)))
    np.testing.assert_allclose(out, a * b + c, atol=0.1)


def CKKSLevelDrop(ctx, ct, level):
    """Drop unused limbs (modulus switching by truncation is NOT generally
    valid — here the scale already matches, we just discard top limbs which
    is exact in RNS when the value is identical mod the kept primes)."""
    from prefhetch_tpu.crypto.ckks import CKKSCiphertext

    return CKKSCiphertext(
        c0=ct.c0[:level], c1=ct.c1[:level], level=level, scale=ct.scale
    )


def test_slot_packed_inner_products(ctx, keys, rng):
    """The config-3 scoring primitive: query replicated across blocks,
    candidates packed slot-wise, rotate-and-sum yields ⟨q, x_j⟩ per block."""
    sk, pk = keys
    d = 16
    nh = ctx.params.n // 2
    n_blocks = nh // d
    q = rng.integers(0, 16, d).astype(np.float64)
    X = rng.integers(0, 16, size=(n_blocks, d)).astype(np.float64)

    ct = ctx.encrypt(pk, ctx.encode(np.tile(q, n_blocks)), rng)
    prod = ctx.mul_plain(ct, ctx.encode(X.reshape(-1)), ctx.scale)

    steps = []
    r = d // 2
    while r >= 1:
        steps.append(r)
        r //= 2
    gks = ctx.galois_keygen(sk, steps, rng)
    acc = prod
    for s in steps:
        acc = ctx.add(acc, ctx.rotate(acc, s, gks[s]))

    out = np.real(ctx.decrypt(sk, acc))
    got = out[np.arange(n_blocks) * d]
    ref = X @ q
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=0.5)
