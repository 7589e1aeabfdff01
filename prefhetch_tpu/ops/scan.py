"""The coarse candidate scan — TPU equivalent of the FAISS fork's
``search_encrypted`` (contract in SURVEY.md §2.3; call site
reference: src/server/server_lib.cpp:126-130).

Semantics being reproduced:

- The *client* chooses which inverted lists to probe (the server never runs
  quantizer assignment — privacy decomposition).
- The server returns the coarse distance of EVERY vector in each probed list
  (no top-k, no pruning), plus the vectors' global ids and the per-query
  candidate counts (ragged ``listSizesPerQuery``).
- Candidate order: probed lists in the client-given order, each list in
  storage order — the layout the reference client walks with a running
  offset (src/client/client_lib.cpp:129-148).

TPU-native design: ragged inverted lists live in a dense padded layout
(index/types.py); the scan emits a fixed [nq, nprobe·lmax] padded tensor with
a validity mask, and raggedness only reappears at the serialization boundary.
The probe axis is processed with lax.scan so HBM peak stays
O(nq·lmax·d) regardless of nprobe.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ScanResult(NamedTuple):
    distances: jax.Array   # [nq, nprobe*lmax] f32 — coarse distances;
    #                        invalid (padding) lanes hold PAD_DISTANCE so a
    #                        downstream top-k needs NO masking. (XLA's fast
    #                        PartialReduce top-k only pattern-matches a bare
    #                        top_k program — fusing a select into it falls
    #                        back to a ~100× slower sort, so the padding is
    #                        folded into the scan output here.)
    ids: jax.Array         # [nq, nprobe*lmax] i32 — global vector ids, -1 pad
    mask: jax.Array        # [nq, nprobe*lmax] bool — True = real candidate
    counts: jax.Array      # [nq] i32 — Σ probed list sizes (listSizesPerQuery)


from prefhetch_tpu.ops.topk import PAD_DISTANCE


def _finalize(per_probe_d, per_probe_i, per_probe_m):
    """Stack per-probe results [nprobe][nq, lmax] → [nq, nprobe*lmax].
    Padding with PAD_DISTANCE happens inside the probe step (see callers) —
    applying a where() on the stacked output here measured ~1000× slower on
    TPU (pathological fusion with the scan/transpose)."""
    d = jnp.transpose(per_probe_d, (1, 0, 2))
    i = jnp.transpose(per_probe_i, (1, 0, 2))
    m = jnp.transpose(per_probe_m, (1, 0, 2))
    nq = d.shape[0]
    return d.reshape(nq, -1), i.reshape(nq, -1), m.reshape(nq, -1)


@jax.jit
def coarse_scan_flat(
    list_vectors: jax.Array,   # [nlist, lmax, d]
    list_ids: jax.Array,       # [nlist, lmax]
    list_sizes: jax.Array,     # [nlist]
    queries: jax.Array,        # [nq, d]
    probe_ids: jax.Array,      # [nq, nprobe] — client-chosen list ids
) -> ScanResult:
    """IVF-Flat scan: exact squared-L2 of every candidate in probed lists."""
    queries = queries.astype(jnp.float32)
    lmax = list_ids.shape[1]
    qsq = jnp.sum(queries * queries, axis=-1)                 # [nq]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lmax), 1)  # [1, lmax]

    def probe_step(_, p):
        lids = probe_ids[:, p]                                # [nq]
        # payload may be bf16 (PQ-reconstructed fast path): gather at half
        # HBM traffic, then widen — norms/cross must accumulate in f32
        vecs = list_vectors[lids].astype(jnp.float32)         # [nq, lmax, d]
        ids = list_ids[lids]                                  # [nq, lmax]
        sizes = list_sizes[lids]                              # [nq]
        vsq = jnp.sum(vecs * vecs, axis=-1)                   # [nq, lmax]
        cross = jnp.einsum(
            "qd,qld->ql", queries, vecs, preferred_element_type=jnp.float32
        )
        d2 = jnp.maximum(qsq[:, None] + vsq - 2.0 * cross, 0.0)
        valid = lane < sizes[:, None]
        d2 = jnp.where(valid, d2, PAD_DISTANCE)   # pad here, not post-stack
        return None, (d2, ids, valid)

    nprobe = probe_ids.shape[1]
    _, (ds, ids, ms) = jax.lax.scan(
        probe_step, None, jnp.arange(nprobe)
    )
    d, i, m = _finalize(ds, ids, ms)
    counts = jnp.sum(list_sizes[probe_ids], axis=1).astype(jnp.int32)
    return ScanResult(d, i, m, counts)


@jax.jit
def coarse_scan_sq8(
    list_sq: jax.Array,        # [nlist, lmax, d] uint8
    sq_vmin: jax.Array,        # [d]
    sq_scale: jax.Array,       # [d]
    list_ids: jax.Array,       # [nlist, lmax]
    list_sizes: jax.Array,     # [nlist]
    queries: jax.Array,        # [nq, d]
    probe_ids: jax.Array,      # [nq, nprobe]
) -> ScanResult:
    """IVF-SQ8 scan: gather 8-bit codes (d bytes/vector — 4× less HBM than
    f32), decode x̂ = vmin + (code + ½)·scale in registers, then the same
    dense distance matmul as the flat scan."""
    queries = queries.astype(jnp.float32)
    lmax = list_ids.shape[1]
    qsq = jnp.sum(queries * queries, axis=-1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lmax), 1)

    def probe_step(_, p):
        lids = probe_ids[:, p]
        codes = list_sq[lids].astype(jnp.float32)             # [nq, lmax, d]
        vecs = sq_vmin + (codes + 0.5) * sq_scale
        ids = list_ids[lids]
        sizes = list_sizes[lids]
        vsq = jnp.sum(vecs * vecs, axis=-1)
        cross = jnp.einsum(
            "qd,qld->ql", queries, vecs, preferred_element_type=jnp.float32
        )
        d2 = jnp.maximum(qsq[:, None] + vsq - 2.0 * cross, 0.0)
        valid = lane < sizes[:, None]
        d2 = jnp.where(valid, d2, PAD_DISTANCE)
        return None, (d2, ids, valid)

    nprobe = probe_ids.shape[1]
    _, (ds, ids, ms) = jax.lax.scan(probe_step, None, jnp.arange(nprobe))
    d, i, m = _finalize(ds, ids, ms)
    counts = jnp.sum(list_sizes[probe_ids], axis=1).astype(jnp.int32)
    return ScanResult(d, i, m, counts)


@functools.partial(jax.jit, static_argnames=("by_residual",))
def coarse_scan_pq(
    centroids: jax.Array,      # [nlist, d]
    list_codes: jax.Array,     # [nlist, lmax, M] i32
    list_ids: jax.Array,       # [nlist, lmax]
    list_sizes: jax.Array,     # [nlist]
    codebooks: jax.Array,      # [M, ksub, dsub]
    queries: jax.Array,        # [nq, d]
    probe_ids: jax.Array,      # [nq, nprobe]
    by_residual: bool = True,
) -> ScanResult:
    """IVF-PQ ADC scan.

    Per (query, probed list): build the asymmetric-distance lookup table over
    the query *residual* (FAISS IndexIVFPQ by_residual semantics), then the
    candidate distance is Σ_m lut[m, code_m]. The LUT build is an MXU einsum;
    the per-code lookup is a flat single-axis gather (lut flattened to
    [nq, M·ksub], indices = m·ksub + code) so no [·,·,M,ksub] broadcast is
    ever materialized.
    """
    queries = queries.astype(jnp.float32)
    nq, d = queries.shape
    M, ksub, dsub = codebooks.shape
    lmax = list_ids.shape[1]
    cbsq = jnp.sum(codebooks * codebooks, axis=-1)            # [M, ksub]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lmax), 1)
    m_offset = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, M), 2) * ksub
    )                                                          # [1, 1, M]

    def probe_step(_, p):
        lids = probe_ids[:, p]                                 # [nq]
        if by_residual:
            res = queries - centroids[lids]                    # [nq, d]
        else:
            res = queries
        rsub = res.reshape(nq, M, dsub)
        rsq = jnp.sum(rsub * rsub, axis=-1)                    # [nq, M]
        cross = jnp.einsum(
            "qmd,mkd->qmk", rsub, codebooks,
            preferred_element_type=jnp.float32,
        )                                                      # [nq, M, ksub]
        lut = rsq[:, :, None] + cbsq[None] - 2.0 * cross       # [nq, M, ksub]
        lut_flat = lut.reshape(nq, M * ksub)

        codes = list_codes[lids]                               # [nq, lmax, M]
        gather_idx = (codes + m_offset).reshape(nq, lmax * M)
        vals = jnp.take_along_axis(lut_flat, gather_idx, axis=1)
        d2 = jnp.sum(vals.reshape(nq, lmax, M), axis=-1)       # [nq, lmax]

        ids = list_ids[lids]
        valid = lane < list_sizes[lids][:, None]
        d2 = jnp.where(valid, d2, PAD_DISTANCE)   # pad here, not post-stack
        return None, (d2, ids, valid)

    nprobe = probe_ids.shape[1]
    _, (ds, ids, ms) = jax.lax.scan(probe_step, None, jnp.arange(nprobe))
    dd, ii, mm = _finalize(ds, ids, ms)
    counts = jnp.sum(list_sizes[probe_ids], axis=1).astype(jnp.int32)
    return ScanResult(dd, ii, mm, counts)
