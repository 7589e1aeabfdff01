"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Exactness contract: sharded services must reproduce single-device results
bit-for-bit (each candidate slot is owned by exactly one shard)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prefhetch_tpu.index.build import build_ivf_index
from prefhetch_tpu.ops.distances import rank_centroids
from prefhetch_tpu.ops.rerank import exact_rerank, fetch_vectors
from prefhetch_tpu.ops.scan import coarse_scan_flat, coarse_scan_pq
from prefhetch_tpu.parallel.mesh import make_mesh
from prefhetch_tpu.parallel.sharded import (
    shard_index,
    sharded_coarse_scan,
    sharded_fetch,
    sharded_kmeans_step,
    sharded_rerank,
)
from prefhetch_tpu.utils.config import IndexParams


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def data():
    from prefhetch_tpu.data.synthetic import make_clustered_dataset

    return make_clustered_dataset(
        nbase=2048, ntrain=4000, nquery=8, d=32, n_clusters=40, gt_k=50, seed=9
    )


@pytest.fixture(scope="module", params=["flat", "pq"])
def built(request, data):
    pq_m = 0 if request.param == "flat" else 8
    params = IndexParams(d=32, nlist=16, pq_m=pq_m, pq_nbits=8,
                         kmeans_iters=8, pq_kmeans_iters=8)
    return build_ivf_index(data["train"], data["base"], params)


def test_sharded_scan_matches_single_device(mesh, built, data):
    q = jnp.asarray(data["query"], jnp.float32)
    _, probe = rank_centroids(q, built.centroids, 6)
    if built.uses_pq:
        # sharded path prefers the dense recon payload — mirror that here
        ref = coarse_scan_flat(built.list_recon, built.list_ids,
                               built.list_sizes, q, probe, built.list_norms)
    else:
        ref = coarse_scan_flat(built.list_vectors, built.list_ids,
                               built.list_sizes, q, probe, built.list_norms)
    sharded = shard_index(built, mesh)
    got = sharded_coarse_scan(mesh, sharded, q, probe)

    np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(ref.mask))
    np.testing.assert_array_equal(np.asarray(got.counts), np.asarray(ref.counts))
    m = np.asarray(ref.mask)
    np.testing.assert_array_equal(
        np.asarray(got.ids)[m], np.asarray(ref.ids)[m]
    )
    np.testing.assert_allclose(
        np.asarray(got.distances)[m], np.asarray(ref.distances)[m], rtol=1e-5
    )


def test_sharded_rerank_matches(mesh, data, rng):
    base = jnp.asarray(data["base"], jnp.float32)
    q = jnp.asarray(data["query"], jnp.float32)
    cand = jnp.asarray(
        rng.integers(0, 2048, size=(8, 40)).astype(np.int32)
    )
    ref = exact_rerank(base, q, cand)
    mesh_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("lists")
    )
    base_sh = jax.device_put(base, mesh_sharding)
    got = sharded_rerank(mesh, base_sh, q, cand)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_sharded_fetch_matches(mesh, data, rng):
    base = jnp.asarray(data["base"], jnp.float32)
    ids = jnp.asarray(rng.integers(0, 2048, size=(4, 10)).astype(np.int32))
    ref = fetch_vectors(base, ids)
    base_sh = jax.device_put(
        base, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("lists"))
    )
    got = sharded_fetch(mesh, base_sh, ids)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_sharded_kmeans_step_matches_host(mesh, data):
    x = jnp.asarray(data["train"][:2048], jnp.float32)
    c0 = jnp.asarray(data["train"][:16], jnp.float32)
    x_sh = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("lists"))
    )
    new_c, counts = sharded_kmeans_step(mesh, x_sh, c0)
    # host oracle
    d2 = ((np.asarray(x)[:, None, :] - np.asarray(c0)[None]) ** 2).sum(-1)
    a = d2.argmin(1)
    ref_counts = np.bincount(a, minlength=16)
    np.testing.assert_array_equal(np.asarray(counts), ref_counts)
    for j in np.unique(a):
        np.testing.assert_allclose(
            np.asarray(new_c)[j], np.asarray(x)[a == j].mean(0), rtol=1e-4
        )


def test_shard_index_requires_divisibility(mesh, data):
    params = IndexParams(d=32, nlist=12, pq_m=0, kmeans_iters=3)
    idx = build_ivf_index(data["train"][:2000], data["base"][:500], params)
    with pytest.raises(ValueError, match="not divisible"):
        shard_index(idx, mesh)
