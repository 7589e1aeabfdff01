"""Bit-exactness of the fused Pallas four-step NTT (ops/ntt_pallas).

The kernel is a drop-in for ops/ntt_mxu.ntt4/intt4 — same four-step
output order, canonical [0, q) values — so these tests assert EXACT
integer equality against the XLA path (which is itself KAT-tested against
the host Shoup NTT in test_ntt_mxu). CPU interpret mode exercises the
same kernel program the TPU runs."""

import numpy as np
import pytest

from prefhetch_tpu.crypto.params import find_ntt_primes
from prefhetch_tpu.ops import ntt_mxu
from prefhetch_tpu.ops.ntt_pallas import (
    build_pallas_ntt4, intt4_pallas, ntt4_pallas,
)


def _xla_ntt4(x, tb):
    """The reference XLA path, bypassing the TPU dispatch."""
    import jax.numpy as jnp

    q, delta = tb.q, tb.delta
    b = x.shape[0]
    a = x.reshape(b, tb.n1, tb.n2)
    y = ntt_mxu._small_matmul_mod(a, jnp.asarray(tb.f_w1), q, delta, axis=1)
    c = ntt_mxu.modmul(y, jnp.asarray(tb.f_tw)[None], q, delta)
    d = ntt_mxu._small_matmul_mod(c, jnp.asarray(tb.f_w2), q, delta, axis=2)
    return d.reshape(b, tb.n)


def _xla_intt4(x, tb):
    import jax.numpy as jnp

    q, delta = tb.q, tb.delta
    b = x.shape[0]
    a = x.reshape(b, tb.n1, tb.n2)
    y = ntt_mxu._small_matmul_mod(a, jnp.asarray(tb.g_w2), q, delta, axis=2)
    c = ntt_mxu.modmul(y, jnp.asarray(tb.g_tw)[None], q, delta)
    d = ntt_mxu._small_matmul_mod(c, jnp.asarray(tb.g_w1), q, delta, axis=1)
    return d.reshape(b, tb.n)


@pytest.mark.parametrize("n", [4096, 8192])
def test_pallas_ntt4_matches_xla_exactly(n):
    import jax.numpy as jnp

    q = find_ntt_primes(n, 30, 1)[0]
    tb = ntt_mxu.build_ntt4_tables(q, n)
    ptb = build_pallas_ntt4(q, n)
    rng = np.random.default_rng(7 + n)
    x = rng.integers(0, q, (5, n), dtype=np.int64)
    want = np.asarray(_xla_ntt4(jnp.asarray(x), tb))
    got = np.asarray(ntt4_pallas(jnp.asarray(x), ptb, interpret=True))
    np.testing.assert_array_equal(got, want % q)
    assert got.max() < q and got.min() >= 0


@pytest.mark.parametrize("n", [4096, 8192])
def test_pallas_intt4_matches_xla_and_roundtrips(n):
    import jax.numpy as jnp

    q = find_ntt_primes(n, 30, 1)[0]
    tb = ntt_mxu.build_ntt4_tables(q, n)
    ptb = build_pallas_ntt4(q, n)
    rng = np.random.default_rng(11 + n)
    x = rng.integers(0, q, (3, n), dtype=np.int64)
    want = np.asarray(_xla_intt4(jnp.asarray(x), tb))
    got = np.asarray(intt4_pallas(jnp.asarray(x), ptb, interpret=True))
    np.testing.assert_array_equal(got, want % q)
    # forward → inverse returns the input (mod q): the two kernels are
    # exact mutual inverses in the shared four-step domain
    fwd = ntt4_pallas(jnp.asarray(x), ptb, interpret=True)
    back = np.asarray(intt4_pallas(fwd, ptb, interpret=True))
    np.testing.assert_array_equal(back, x % q)


def test_pallas_ntt4_accepts_lazy_range_inputs():
    """Mid-pipeline values up to 2q (the Shoup output range) must digit-
    decompose and transform exactly — callers feed [0, 2q) between stages."""
    import jax.numpy as jnp

    n = 4096
    q = find_ntt_primes(n, 30, 1)[0]
    ptb = build_pallas_ntt4(q, n)
    tb = ntt_mxu.build_ntt4_tables(q, n)
    rng = np.random.default_rng(13)
    x = rng.integers(0, 2 * q - 1, (2, n), dtype=np.int64)
    want = np.asarray(_xla_ntt4(jnp.asarray(x % q), tb)) % q
    got = np.asarray(ntt4_pallas(jnp.asarray(x), ptb, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_odd_batch_padding():
    """B not a multiple of the 32-row grid block pads internally."""
    import jax.numpy as jnp

    n = 4096
    q = find_ntt_primes(n, 30, 1)[0]
    ptb = build_pallas_ntt4(q, n)
    tb = ntt_mxu.build_ntt4_tables(q, n)
    rng = np.random.default_rng(17)
    x = rng.integers(0, q, (33, n), dtype=np.int64)
    want = np.asarray(_xla_ntt4(jnp.asarray(x), tb)) % q
    got = np.asarray(ntt4_pallas(jnp.asarray(x), ptb, interpret=True))
    np.testing.assert_array_equal(got, want)
