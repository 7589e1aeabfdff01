"""Lloyd's k-means on TPU.

Replaces the coarse-quantizer / PQ-codebook training the reference delegates
to its FAISS fork (``m_Index->train``, reference: src/server/server_lib.cpp:71).
Design is TPU-first:

- assignment = argmin of a ‖x‖²−2xCᵀ+‖c‖² distance matmul (MXU),
- centroid update = one-hotᵀ @ x matmul (MXU) instead of scatter-add,
- the training set is chunked with lax.scan so HBM stays bounded at
  SIFT1M scale,
- the whole iteration loop is one jitted lax.scan — no host round trips.

Training-quality parity knobs follow FAISS Clustering defaults (niter=25,
seed=1234, subsample to max_points_per_centroid=256, empty clusters re-seeded
by splitting the largest cluster).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# FAISS Clustering default: at most this many training points per centroid.
MAX_POINTS_PER_CENTROID = 256


def _pad_chunks(x: np.ndarray, chunk: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: pad n to a multiple of `chunk` and reshape to chunks."""
    n, d = x.shape
    nchunks = -(-n // chunk)
    pad = nchunks * chunk - n
    xp = np.concatenate([x, np.zeros((pad, d), x.dtype)], 0) if pad else x
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    return xp.reshape(nchunks, chunk, d), valid.reshape(nchunks, chunk)


@functools.partial(jax.jit, static_argnames=("k", "iters", "spherical"))
def _kmeans_loop(
    xc: jax.Array,        # [nchunks, chunk, d]
    validc: jax.Array,    # [nchunks, chunk] bool
    init_centroids: jax.Array,  # [k, d]
    k: int,
    iters: int,
    spherical: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run `iters` Lloyd iterations; returns (centroids [k,d], mean cost)."""

    def assign_accumulate(centroids):
        csq = jnp.sum(centroids * centroids, axis=-1)  # [k]

        def chunk_step(carry, inp):
            sums, counts, cost = carry
            x, valid = inp                                    # [c,d], [c]
            cross = jax.lax.dot_general(
                x, centroids,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                 # [c, k]
            d2 = csq[None, :] - 2.0 * cross                   # xsq omitted: argmin-invariant
            a = jnp.argmin(d2, axis=-1)                       # [c]
            onehot = jax.nn.one_hot(a, k, dtype=jnp.float32) * valid[:, None]
            sums = sums + jax.lax.dot_general(
                onehot, x,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                 # [k, d]
            counts = counts + jnp.sum(onehot, axis=0)
            xsq = jnp.sum(x * x, axis=-1)
            best = jnp.min(d2, axis=-1) + xsq
            cost = cost + jnp.sum(jnp.where(valid, best, 0.0))
            return (sums, counts, cost), None

        init = (
            jnp.zeros((k, xc.shape[-1]), jnp.float32),
            jnp.zeros((k,), jnp.float32),
            jnp.float32(0.0),
        )
        (sums, counts, cost), _ = jax.lax.scan(chunk_step, init, (xc, validc))
        return sums, counts, cost

    def iteration(centroids, _):
        sums, counts, cost = assign_accumulate(centroids)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty-cluster repair (FAISS splits the largest cluster): every
        # empty centroid becomes a slightly perturbed copy of the largest
        # cluster's centroid. Deterministic and shape-static under jit.
        empty = counts == 0
        donor = jnp.argmax(counts)
        donor_c = new_c[donor]
        rank = jnp.cumsum(empty.astype(jnp.float32)) * empty  # 1,2,... at empties
        eps = 1e-4 * rank[:, None]
        repaired = donor_c[None, :] * (1.0 + eps) + eps
        new_c = jnp.where(empty[:, None], repaired, new_c)
        if spherical:
            # spherical k-means (FAISS Clustering spherical option): for
            # cosine/angular data, re-project centroids to the unit sphere
            norm = jnp.linalg.norm(new_c, axis=-1, keepdims=True)
            new_c = new_c / jnp.maximum(norm, 1e-12)
        return new_c, cost

    centroids, costs = jax.lax.scan(
        iteration, init_centroids.astype(jnp.float32), None, length=iters
    )
    return centroids, costs[-1]


def train_kmeans(
    x: np.ndarray,
    k: int,
    iters: int = 25,
    seed: int = 1234,
    chunk: int = 4096,
    subsample: bool = True,
    spherical: bool = False,
) -> np.ndarray:
    """Train k centroids on x [n, d]; returns centroids [k, d] float32.

    Host wrapper: FAISS-style subsampling + random-subset init, then one
    jitted TPU loop.
    """
    x = np.asarray(x, np.float32)
    n = x.shape[0]
    if n < k:
        raise ValueError(f"need at least k={k} training points, got {n}")
    rng = np.random.default_rng(seed)
    if subsample and n > k * MAX_POINTS_PER_CENTROID:
        sel = rng.permutation(n)[: k * MAX_POINTS_PER_CENTROID]
        x = x[sel]
        n = x.shape[0]
    init = x[rng.permutation(n)[:k]].copy()
    chunk = min(chunk, n)
    xc, validc = _pad_chunks(x, chunk)
    centroids, _ = _kmeans_loop(
        jnp.asarray(xc), jnp.asarray(validc), jnp.asarray(init), k, iters,
        spherical,
    )
    return np.asarray(centroids)


def train_kmeans_batched(
    xs: np.ndarray,   # [B, n, d] — B independent k-means problems
    k: int,
    iters: int = 25,
    seed: int = 1234,
    chunk: int = 4096,
) -> np.ndarray:
    """vmapped k-means over B subproblems (used for PQ codebook training,
    one problem per sub-quantizer). Returns [B, k, d]."""
    xs = np.asarray(xs, np.float32)
    B, n, d = xs.shape
    rng = np.random.default_rng(seed)
    if n > k * MAX_POINTS_PER_CENTROID:
        sel = rng.permutation(n)[: k * MAX_POINTS_PER_CENTROID]
        xs = xs[:, sel]
        n = xs.shape[1]
    inits = np.stack([xs[b, rng.permutation(n)[:k]] for b in range(B)])
    chunk = min(chunk, n)
    xcs, valids = [], []
    for b in range(B):
        xc, vc = _pad_chunks(xs[b], chunk)
        xcs.append(xc)
        valids.append(vc)
    xcs = jnp.asarray(np.stack(xcs))
    valids = jnp.asarray(np.stack(valids))

    loop = jax.vmap(_kmeans_loop, in_axes=(0, 0, 0, None, None))
    centroids, _ = jax.jit(loop, static_argnums=(3, 4))(
        xcs, valids, jnp.asarray(inits), k, iters
    )
    return np.asarray(centroids)
