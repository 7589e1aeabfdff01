"""MXU (matmul) NTT vs the butterfly NTT oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from prefhetch_tpu.crypto.ntt import build_tables, intt, ntt
from prefhetch_tpu.crypto.params import find_ntt_primes
from prefhetch_tpu.ops.ntt_mxu import (
    build_mxu_tables,
    intt_mxu,
    ntt_mxu,
)


@pytest.fixture(scope="module", params=[256, 1024])
def setup(request):
    n = request.param
    q = find_ntt_primes(n, 30, 1)[0]
    return q, n, build_tables(q, n), build_mxu_tables(q, n)


def test_digit_reconstruction(setup):
    q, n, _, mt = setup
    # digits must reconstruct F exactly
    from prefhetch_tpu.crypto.params import root_of_unity

    psi = root_of_unity(q, 2 * n)
    kk, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    psi_pows = np.array([pow(psi, int(e), q) for e in range(2 * n)], np.int64)
    F = psi_pows[(kk * (2 * jj + 1)) % (2 * n)]
    recon = sum(
        mt.f_digits[d].astype(np.int64) << (8 * d) for d in range(4)
    )
    np.testing.assert_array_equal(recon, F)


def test_forward_matches_butterfly(setup, rng):
    q, n, tb, mt = setup
    x = rng.integers(0, q, (5, n)).astype(np.int64)
    ref = np.asarray(ntt(jnp.asarray(x), tb))
    got = np.asarray(ntt_mxu(jnp.asarray(x), mt))
    np.testing.assert_array_equal(got, ref)


def test_inverse_matches_butterfly(setup, rng):
    q, n, tb, mt = setup
    x = rng.integers(0, q, (3, n)).astype(np.int64)
    ref = np.asarray(intt(jnp.asarray(x), tb))
    got = np.asarray(intt_mxu(jnp.asarray(x), mt))
    np.testing.assert_array_equal(got, ref)


def test_roundtrip(setup, rng):
    q, n, _, mt = setup
    x = rng.integers(0, q, (2, n)).astype(np.int64)
    rt = np.asarray(intt_mxu(ntt_mxu(jnp.asarray(x), mt), mt))
    np.testing.assert_array_equal(rt, x)


# ---------------------------------------------------------------------------
# four-step NTT (N = N1·N2)

def test_ntt4_roundtrip(setup, rng):
    from prefhetch_tpu.ops.ntt_mxu import build_ntt4_tables, intt4, ntt4

    q, n, _, _ = setup
    t4 = build_ntt4_tables(q, n)
    x = rng.integers(0, q, (3, n)).astype(np.int64)
    rt = np.asarray(intt4(ntt4(jnp.asarray(x), t4), t4))
    np.testing.assert_array_equal(rt, x)


def test_ntt4_is_permutation_of_dense(setup, rng):
    """Four-step output is the dense transform in j1-major order:
    ntt4(x)[j1·N2+j2] == ntt_mxu(x)[j2·N1+j1]."""
    from prefhetch_tpu.ops.ntt_mxu import build_ntt4_tables, ntt4

    q, n, _, mt = setup
    t4 = build_ntt4_tables(q, n)
    x = rng.integers(0, q, (2, n)).astype(np.int64)
    dense = np.asarray(ntt_mxu(jnp.asarray(x), mt))
    four = np.asarray(ntt4(jnp.asarray(x), t4))
    j1, j2 = np.meshgrid(
        np.arange(t4.n1), np.arange(t4.n2), indexing="ij"
    )
    perm = (j2 * t4.n1 + j1).reshape(-1)     # four-step slot → true index
    np.testing.assert_array_equal(four, dense[:, perm])


def test_ntt4_pointwise_is_negacyclic_convolution(setup, rng):
    """intt4(ntt4(a) ⊙ ntt4(b)) must equal a·b mod (X^N + 1, q)."""
    from prefhetch_tpu.ops.ntt_mxu import (
        build_ntt4_tables, intt4, modmul, ntt4,
    )

    q, n, _, _ = setup
    t4 = build_ntt4_tables(q, n)
    a = rng.integers(0, q, (1, n)).astype(np.int64)
    b = rng.integers(0, q, (1, n)).astype(np.int64)
    prod = modmul(
        ntt4(jnp.asarray(a), t4), ntt4(jnp.asarray(b), t4), q, t4.delta
    )
    got = np.asarray(intt4(prod, t4))[0]

    # reference negacyclic convolution via integer polynomial multiply
    # (object dtype: coefficient sums exceed int64)
    full = np.polymul(
        a[0][::-1].astype(object), b[0][::-1].astype(object)
    )[::-1]
    ref = np.zeros(n, object)
    for i, c in enumerate(full):
        if i < n:
            ref[i] += c
        else:
            ref[i - n] -= c
    ref = np.array([int(v) % q for v in ref], np.int64)
    np.testing.assert_array_equal(got, ref)
