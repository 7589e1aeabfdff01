"""Distance / top-k / k-means kernel tests vs numpy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from prefhetch_tpu.ops.distances import pairwise_sq_l2, rank_centroids
from prefhetch_tpu.ops.kmeans import train_kmeans, train_kmeans_batched
from prefhetch_tpu.ops.topk import masked_topk_smallest


def np_sq_l2(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


def test_pairwise_sq_l2_matches_numpy(rng):
    q = rng.normal(size=(7, 32)).astype(np.float32) * 10
    x = rng.normal(size=(50, 32)).astype(np.float32) * 10
    out = np.asarray(pairwise_sq_l2(jnp.asarray(q), jnp.asarray(x)))
    # expansion form carries fp32 cancellation error on float data;
    # SIFT-scale integer data stays < 2^24 and is exact
    np.testing.assert_allclose(out, np_sq_l2(q, x), rtol=5e-3, atol=1.0)


def test_pairwise_sq_l2_exact_on_integer_data(rng):
    q = rng.integers(0, 256, size=(5, 128)).astype(np.float32)
    x = rng.integers(0, 256, size=(64, 128)).astype(np.float32)
    out = np.asarray(pairwise_sq_l2(jnp.asarray(q), jnp.asarray(x)))
    np.testing.assert_array_equal(out, np_sq_l2(q, x).astype(np.float32))


def test_rank_centroids(rng):
    q = rng.normal(size=(4, 16)).astype(np.float32)
    c = rng.normal(size=(30, 16)).astype(np.float32)
    d, idx = rank_centroids(jnp.asarray(q), jnp.asarray(c), 5)
    ref = np.argsort(np_sq_l2(q, c), axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), ref)
    assert np.all(np.diff(np.asarray(d), axis=1) >= -1e-5)  # ascending


def test_masked_topk_smallest(rng):
    d = rng.normal(size=(3, 40)).astype(np.float32)
    mask = rng.random((3, 40)) > 0.3
    mask[:, :5] = True  # ensure enough valid
    vals, pos = masked_topk_smallest(jnp.asarray(d), jnp.asarray(mask), 5)
    vals, pos = np.asarray(vals), np.asarray(pos)
    for i in range(3):
        valid_sorted = np.sort(d[i][mask[i]])[:5]
        np.testing.assert_allclose(vals[i], valid_sorted, rtol=1e-6)
        assert mask[i][pos[i]].all()


def test_masked_topk_excludes_invalid():
    d = np.array([[0.0, 1.0, 2.0, 3.0]], np.float32)
    mask = np.array([[False, True, False, True]])
    vals, pos = masked_topk_smallest(jnp.asarray(d), jnp.asarray(mask), 2)
    np.testing.assert_array_equal(np.asarray(pos)[0], [1, 3])


def test_kmeans_converges_on_separated_clusters():
    rng = np.random.default_rng(0)
    centers = np.array([[0, 0], [100, 0], [0, 100], [100, 100]], np.float32)
    x = np.concatenate(
        [c + rng.normal(scale=1.0, size=(200, 2)) for c in centers]
    ).astype(np.float32)
    got = train_kmeans(x, k=4, iters=15, seed=1)
    # each true center should have a learned centroid within 1.0
    d = np_sq_l2(centers, got)
    assert np.sqrt(d.min(axis=1)).max() < 1.0


def test_kmeans_no_empty_clusters():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(500, 8)).astype(np.float32)
    c = train_kmeans(x, k=32, iters=10, seed=2)
    # every centroid must be someone's nearest
    a = np_sq_l2(x, c).argmin(axis=1)
    assert len(np.unique(a)) >= 30  # allow tiny slack, but not mass-collapse
    assert np.isfinite(c).all()


def test_kmeans_deterministic():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(300, 4)).astype(np.float32)
    a = train_kmeans(x, k=8, iters=5, seed=7)
    b = train_kmeans(x, k=8, iters=5, seed=7)
    np.testing.assert_array_equal(a, b)


def test_kmeans_batched_matches_single():
    rng = np.random.default_rng(4)
    xs = rng.normal(size=(3, 400, 4)).astype(np.float32)
    out = train_kmeans_batched(xs, k=16, iters=8, seed=5)
    assert out.shape == (3, 16, 4)
    assert np.isfinite(out).all()
    # quality: mean quantization error should beat a random-subset codebook
    for b in range(3):
        err_trained = np_sq_l2(xs[b], out[b]).min(axis=1).mean()
        err_random = np_sq_l2(xs[b], xs[b, :16]).min(axis=1).mean()
        assert err_trained < err_random


def test_kmeans_requires_enough_points():
    with pytest.raises(ValueError):
        train_kmeans(np.zeros((5, 4), np.float32), k=10)


def test_spherical_kmeans_unit_centroids():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(400, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    c = train_kmeans(x, k=8, iters=8, seed=3, spherical=True)
    np.testing.assert_allclose(np.linalg.norm(c, axis=1), 1.0, rtol=1e-5)


def test_topk_segmented_matches_flat(rng):
    from prefhetch_tpu.ops.topk import PAD_DISTANCE, topk_select, topk_select_segmented
    import jax.numpy as jnp

    d = rng.random((8, 16 * 96)).astype(np.float32)
    d[rng.random(d.shape) < 0.2] = float(PAD_DISTANCE)  # pads anywhere
    v1, p1 = topk_select(jnp.asarray(d), 40)
    v2, p2 = topk_select_segmented(jnp.asarray(d), 40, 16)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    for i in range(8):
        assert set(np.asarray(p1)[i].tolist()) == set(np.asarray(p2)[i].tolist())
