"""MAC backend parity: numpy vs device (MXU-NTT) implementations."""

import numpy as np
import pytest

from prefhetch_tpu.crypto.bfv import BFVContext, Ciphertext
from prefhetch_tpu.crypto.packing import encode_query_poly
from prefhetch_tpu.crypto.params import BFVParams, find_ntt_primes
from prefhetch_tpu.engine.hecompute import HEComputeService


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    p = BFVParams(n=256, t=1 << 24, qs=tuple(find_ntt_primes(256, 30, 2)))
    ctx = BFVContext(p)
    sk, pk = ctx.keygen(rng)
    q = rng.integers(0, 256, 32).astype(np.float32)
    X = rng.integers(0, 256, (3, 20, 32)).astype(np.float32)
    cts = [
        ctx.to_ntt(ctx.encrypt(pk, encode_query_poly(q, p), rng))
        for _ in range(3)
    ]
    return p, ctx, sk, q, X, cts


def test_batch_backends_agree(setup):
    """The device (MXU-NTT) batch MAC must produce bit-identical ciphertexts
    to the numpy backend."""
    p, ctx, sk, q, X, cts = setup
    svc_np = HEComputeService(p, backend="numpy")
    svc_dev = HEComputeService(p, backend="tpu")  # runs on whatever backend
    r_np, n_np = svc_np.encrypted_scores_batch(cts, X)
    r_dev, n_dev = svc_dev.encrypted_scores_batch(cts, X)
    np.testing.assert_array_equal(n_np, n_dev)
    for a_blocks, b_blocks in zip(r_np, r_dev):
        for a, b in zip(a_blocks, b_blocks):
            np.testing.assert_array_equal(a.c0, b.c0)
            np.testing.assert_array_equal(a.c1, b.c1)


def test_single_backends_agree(setup):
    p, ctx, sk, q, X, cts = setup
    svc_np = HEComputeService(p, backend="numpy")
    svc_dev = HEComputeService(p, backend="tpu")
    a_blocks, _ = svc_np.encrypted_scores(cts[0], X[0])
    b_blocks, _ = svc_dev.encrypted_scores(cts[0], X[0])
    for a, b in zip(a_blocks, b_blocks):
        np.testing.assert_array_equal(a.c0, b.c0)
        np.testing.assert_array_equal(a.c1, b.c1)
