"""Edge cases: tiny/empty lists, nprobe=1, duplicate probes, noise budget."""

import numpy as np
import jax.numpy as jnp
import pytest

from prefhetch_tpu.data.synthetic import make_clustered_dataset
from prefhetch_tpu.index.build import build_ivf_index
from prefhetch_tpu.models import IVFFlat
from prefhetch_tpu.ops.distances import rank_centroids
from prefhetch_tpu.ops.scan import coarse_scan_flat
from prefhetch_tpu.utils.config import IndexParams


@pytest.fixture(scope="module")
def tiny():
    data = make_clustered_dataset(
        nbase=300, ntrain=600, nquery=5, d=16, n_clusters=6, gt_k=10, seed=2
    )
    # nlist close to nbase/10 → some lists nearly empty
    idx = build_ivf_index(
        data["train"], data["base"],
        IndexParams(d=16, nlist=32, pq_m=0, kmeans_iters=6),
    )
    return idx, data


def test_scan_nprobe_1(tiny):
    idx, data = tiny
    q = jnp.asarray(data["query"], jnp.float32)
    _, probe = rank_centroids(q, idx.centroids, 1)
    res = coarse_scan_flat(
        idx.list_vectors, idx.list_ids, idx.list_sizes, q, probe,
        idx.list_norms,
    )
    counts = np.asarray(res.counts)
    sizes = np.asarray(idx.list_sizes)
    np.testing.assert_array_equal(counts, sizes[np.asarray(probe)[:, 0]])


def test_scan_duplicate_probes(tiny):
    """Probing the same list twice must return its candidates twice (the
    server honors the client's list exactly — reference semantics)."""
    idx, data = tiny
    q = jnp.asarray(data["query"][:2], jnp.float32)
    probe = jnp.asarray([[0, 0, 1], [2, 2, 2]], jnp.int32)
    res = coarse_scan_flat(
        idx.list_vectors, idx.list_ids, idx.list_sizes, q, probe,
        idx.list_norms,
    )
    sizes = np.asarray(idx.list_sizes)
    np.testing.assert_array_equal(
        np.asarray(res.counts),
        [2 * sizes[0] + sizes[1], 3 * sizes[2]],
    )


def test_scan_possibly_empty_lists(tiny):
    """Lists with zero members must contribute zero candidates, not pads."""
    idx, data = tiny
    sizes = np.asarray(idx.list_sizes)
    smallest = int(np.argmin(sizes))
    q = jnp.asarray(data["query"][:1], jnp.float32)
    probe = jnp.asarray([[smallest]], jnp.int32)
    res = coarse_scan_flat(
        idx.list_vectors, idx.list_ids, idx.list_sizes, q, probe,
        idx.list_norms,
    )
    assert int(np.asarray(res.counts)[0]) == sizes[smallest]
    assert np.asarray(res.mask).sum() == sizes[smallest]


def test_search_k_larger_than_candidates(tiny):
    """k beyond the candidate pool returns PAD-distance entries rather than
    crashing (caller sees ascending distances; ids at pads are whatever the
    pad slots carried — mask/counts are the contract)."""
    idx, data = tiny
    m = IVFFlat(IndexParams(d=16, nlist=32, pq_m=0, kmeans_iters=6))
    m.index = idx
    m.nprobe = 1
    d, ids = m.search(data["query"][:2], k=50)
    assert d.shape == (2, 50)
    assert np.all(np.diff(d, axis=1) >= -1e-3)


def test_bfv_noise_budget_regression():
    """Noise budget after the protocol's ct×pt MAC must stay comfortably
    positive at the production operating point shape (N=4096 scaled down to
    N=512 with the same t and prime sizes)."""
    from prefhetch_tpu.crypto import BFVContext
    from prefhetch_tpu.crypto.packing import encode_query_poly, pack_candidates
    from prefhetch_tpu.crypto.params import BFVParams, find_ntt_primes

    rng = np.random.default_rng(7)
    p = BFVParams(n=512, t=1 << 24, qs=tuple(find_ntt_primes(512, 30, 2)))
    ctx = BFVContext(p)
    sk, pk = ctx.keygen(rng)
    q = rng.integers(0, 256, 128).astype(np.float32)
    X = rng.integers(0, 256, (4, 128)).astype(np.float32)
    ct = ctx.to_ntt(ctx.encrypt(pk, encode_query_poly(q, p), rng))
    polys, _ = pack_candidates(X, p)
    out = ctx.mul_plain_ntt(ct, ctx.plain_to_ntt(polys[0]))
    # expected plaintext of the product
    from prefhetch_tpu.crypto.ntt import naive_negacyclic_polymul

    ref = naive_negacyclic_polymul(
        encode_query_poly(q, p), polys[0], p.t
    ) % p.t
    budget = ctx.noise_budget_bits(sk, out, ref)
    assert budget > 8, f"post-MAC noise budget too low: {budget} bits"
