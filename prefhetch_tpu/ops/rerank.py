"""Exact re-rank and vector retrieval.

Server stage 6 (``Server::preciseSearch``, reference:
src/server/server_lib.cpp:140-167): exact squared-L2 between each query and
the COARSE_PROBE candidates the client named — the reference does this with
a triple scalar loop over std::pow; here it is a fused gather + batched
matmul expansion.

Server stage 8 (``Server::preciseVectorPIR``, reference:
src/server/server_lib.cpp:169-196): raw gather of the named vectors — a PIR
placeholder (the client sends indices in cleartext at this snapshot).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def exact_rerank(
    base: jax.Array,       # [nbase, d]
    queries: jax.Array,    # [nq, d]
    cand_ids: jax.Array,   # [nq, P] i32 — client-chosen candidate ids
) -> jax.Array:
    """Exact squared-L2 distances [nq, P] of the named candidates."""
    queries = queries.astype(jnp.float32)
    vecs = base[cand_ids]                                     # [nq, P, d]
    qsq = jnp.sum(queries * queries, axis=-1)                 # [nq]
    vsq = jnp.sum(vecs * vecs, axis=-1)                       # [nq, P]
    cross = jnp.einsum(
        "qd,qpd->qp", queries, vecs, preferred_element_type=jnp.float32
    )
    return jnp.maximum(qsq[:, None] + vsq - 2.0 * cross, 0.0)


@jax.jit
def fetch_vectors(base: jax.Array, ids: jax.Array) -> jax.Array:
    """Gather raw vectors [nq, K, d] for the retrieval endpoint."""
    return base[ids]


def final_topk(
    scores: jax.Array,     # [nq, P] f32 — exact re-rank distances
    cand_ids: jax.Array,   # [nq, P] — the candidates the scores belong to
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """(ids [nq, k], dists [nq, k]) ascending — the fused /search route's
    final select, on device so the whole round stays one async chain.

    The gather IS fused with the top_k here, demoting it to the sort path
    — deliberately: at [nq, COARSE_PROBE≈256] the input is three orders
    below the hot-width rule (ops/topk.py applies to the ~55K-lane coarse
    matrix, not this tail)."""
    neg, order = jax.lax.top_k(-scores, k)
    return jnp.take_along_axis(cand_ids, order, axis=1), -neg


final_topk = jax.jit(final_topk, static_argnames=("k",))
