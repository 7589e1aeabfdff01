"""Distance kernels: squared-L2 as MXU matmuls.

The reference computes every distance with scalar loops over
``std::pow(a-b, 2)`` (client centroid ranking: src/client/client_lib.cpp:57-64;
server exact re-rank: src/server/server_lib.cpp:155-162). On TPU the same
quantity is the classic expansion ``‖x‖² − 2·q·xᵀ + ‖q‖²`` so the O(n·m·d)
work lands on the 128×128 systolic array as one batched matmul instead of a
scalar loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sq_l2(q: jax.Array, x: jax.Array) -> jax.Array:
    """Squared L2 distances between rows of q [nq, d] and x [n, d] → [nq, n].

    The cross term runs in fp32 on the MXU (inputs are SIFT-scale integers
    stored as float; fp32 keeps exact parity with the reference's float
    accumulation at d=128).
    """
    q = q.astype(jnp.float32)
    x = x.astype(jnp.float32)
    qsq = jnp.sum(q * q, axis=-1, keepdims=True)            # [nq, 1]
    xsq = jnp.sum(x * x, axis=-1)                           # [n]
    cross = jax.lax.dot_general(
        q, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [nq, n]
    d2 = qsq + xsq[None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


@functools.partial(jax.jit, static_argnames=("nprobe",))
def rank_centroids(
    queries: jax.Array,       # [nq, d]
    centroids: jax.Array,     # [nlist, d]
    nprobe: int,
) -> tuple[jax.Array, jax.Array]:
    """Client-side stage 3: nearest-nprobe centroid selection.

    Replaces the reference's per-query full sort of all NLIST centroid
    distances (src/client/client_lib.cpp:50-81) with a fused matmul + top-k.
    Returns (distances [nq, nprobe] ascending, centroid ids [nq, nprobe]).
    """
    d2 = pairwise_sq_l2(queries, centroids)
    neg, idx = jax.lax.top_k(-d2, nprobe)
    return -neg, idx
