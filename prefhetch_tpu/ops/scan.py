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
from typing import NamedTuple, Optional

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
    list_vectors: jax.Array,   # [nlist, lmax, d] (f32 or bf16)
    list_ids: jax.Array,       # [nlist, lmax]
    list_sizes: jax.Array,     # [nlist]
    queries: jax.Array,        # [nq, d]
    probe_ids: jax.Array,      # [nq, nprobe] — client-chosen list ids
    list_norms: Optional[jax.Array] = None,   # [nlist, lmax] ‖payload‖² f32
) -> ScanResult:
    """Dense candidate scan: exact squared-L2 of every candidate in the
    probed lists (payload = raw vectors for IVF-Flat, bf16 reconstructions
    for the IVF-PQ ADC fast path).

    Two MXU-friendly formulations, chosen by static shape:

    - probed volume ≥ whole index (nq·nprobe ≥ nlist): compute q·Zᵀ for the
      ENTIRE index as one dense matmul and select the probed rows — reads
      the index exactly once regardless of batch size.
    - otherwise: one flat slab-gather of the nq·nprobe probed lists, chunked
      so the widened f32 working set stays bounded, then batched matvecs.

    (The original per-probe lax.scan gathered 16 small batches serially and
    ran ~5× slower than either form at SIFT1M.)
    """
    queries = queries.astype(jnp.float32)
    nq = queries.shape[0]
    nprobe = probe_ids.shape[1]
    nlist, lmax = list_ids.shape
    d = queries.shape[1]
    qsq = jnp.sum(queries * queries, axis=-1)                 # [nq]
    if list_norms is None:
        list_norms = jnp.sum(
            list_vectors.astype(jnp.float32) ** 2, axis=-1
        )

    lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lmax), 2)
    sizes_p = list_sizes[probe_ids]                           # [nq, nprobe]
    valid = lane3 < sizes_p[:, :, None]                       # [nq, np, lmax]
    ids = list_ids[probe_ids]                                 # [nq, np, lmax]
    vp = list_norms[probe_ids]                                # [nq, np, lmax]

    # payload precision follows the payload itself: bf16 only when it is
    # already bf16 (PQ reconstructions); raw IVF-Flat vectors stay f32 so
    # coarse distances don't change with batch size across the two branches.
    # Queries stay f32 in both (bf16 promotes exactly, so branch outputs
    # agree bit-for-bit for bf16 payloads too).
    cdt = jnp.bfloat16 if list_vectors.dtype == jnp.bfloat16 else jnp.float32

    if nq * nprobe >= nlist:
        # full-index matmul + row select
        S = jnp.einsum(
            "qd,cld->qcl", queries, list_vectors.astype(cdt),
            preferred_element_type=jnp.float32,
        )                                                     # [nq, nlist, lmax]
        Sp = jnp.take_along_axis(S, probe_ids[:, :, None], axis=1)
    else:
        # chunked flat slab-gather + batched matvec
        flatn = nq * nprobe
        flat = probe_ids.reshape(-1)
        qrep = jnp.repeat(queries, nprobe, axis=0)            # [flatn, d]
        bytes_per_slab = lmax * d * 4
        chunk = max(1, min(flatn, (256 * 1024 * 1024) // bytes_per_slab))
        nchunks = -(-flatn // chunk)
        pad = nchunks * chunk - flatn
        flat_p = jnp.concatenate([flat, jnp.zeros(pad, flat.dtype)])
        qrep_p = jnp.concatenate([qrep, jnp.zeros((pad, d), qrep.dtype)])

        def chunk_step(_, c):
            sl = jax.lax.dynamic_slice_in_dim(flat_p, c * chunk, chunk)
            qc = jax.lax.dynamic_slice_in_dim(qrep_p, c * chunk, chunk)
            vecs = list_vectors[sl].astype(cdt)               # [chunk, lmax, d]
            return None, jnp.einsum(
                "bd,bld->bl", qc, vecs, preferred_element_type=jnp.float32
            )

        _, crosses = jax.lax.scan(chunk_step, None, jnp.arange(nchunks))
        Sp = crosses.reshape(nchunks * chunk, lmax)[:flatn].reshape(
            nq, nprobe, lmax
        )

    d2 = jnp.maximum(qsq[:, None, None] + vp - 2.0 * Sp, 0.0)
    d2 = jnp.where(valid, d2, PAD_DISTANCE)
    counts = jnp.sum(sizes_p, axis=1).astype(jnp.int32)
    return ScanResult(
        d2.reshape(nq, -1), ids.reshape(nq, -1), valid.reshape(nq, -1), counts
    )


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
