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
