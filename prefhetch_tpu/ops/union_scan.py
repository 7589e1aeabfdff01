"""Union-tile batched coarse scan: one MXU matmul for the whole batch.

The Pallas slab kernel (ops/pallas_scan.py) walks a grid of nq·max_t
(query, tile) pairs, each step a [T, d] × [d, 1] matvec — per-step grid
latency and 1-wide MXU utilization cap it well below the HBM roofline,
and tiles probed by several queries of a batch are re-read once per query.

This formulation exploits what the MXU is actually good at:

  1. host: dedupe the batch's probed tiles → union list U (clustered
     query batches share most tiles, so |U| ≪ nq·max_t);
  2. device: gather the union payload [U, T, d] (contiguous row blocks —
     runs at HBM bandwidth), and score ALL queries against ALL union tiles
     as ONE dense matmul  [U·T, d] × [d, nq]  (‖x‖² − 2x·q + ‖q‖²);
  3. device: each query extracts its own tiles' rows from the distance
     matrix by position (take_along_axis — the per-query candidate layout
     and PAD semantics come out identical to the Pallas kernel's).

Cross-query tile sharing makes the scan read each shared tile ONCE per
batch instead of once per probing query. Exactness: bit-compatible
distances up to f32 summation order (tests/test_union_scan.py asserts
equality against the slab kernel within fp tolerance).

Shapes are bucketed: |U| pads to a multiple of 128 (the reserved empty
tile — its size-0 lanes emit PAD) so a serving batch hits a handful of
compiled programs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prefhetch_tpu.ops.topk import PAD_DISTANCE

U_BUCKET = 128


def union_probe_tiles(
    tile_idx: np.ndarray,    # [nq, max_t] int — tile ids incl. empty pads
    empty_tile: int,
    bucket: int = U_BUCKET,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host side: (union tile ids [U_pad], positions [nq, max_t]).

    positions[qi, k] = index into the union list of tile_idx[qi, k]; the
    union is padded with the empty tile to a bucket multiple, and the empty
    tile is always the union's LAST entry so pad positions point there."""
    uniq, inv = np.unique(tile_idx, return_inverse=True)
    # force the empty tile to the tail (np.unique sorts ascending and the
    # empty tile has the largest id by construction — assert, don't assume)
    if uniq[-1] != empty_tile:
        uniq = np.append(uniq, empty_tile)
    u_pad = -(-len(uniq) // bucket) * bucket
    union = np.full(u_pad, empty_tile, tile_idx.dtype)
    union[: len(uniq)] = uniq
    pos = inv.reshape(tile_idx.shape).astype(np.int32)
    return union, pos


@jax.jit
def union_scan_distances(
    payload: jax.Array,      # [ntiles+1, T, d] f32/bf16
    norms: jax.Array,        # [ntiles+1, T] f32
    sizes: jax.Array,        # [ntiles+1] int32
    queries: jax.Array,      # [nq, d] f32
    union: jax.Array,        # [U] int32 tile ids
    pos: jax.Array,          # [nq, max_t] int32 positions into union
) -> jax.Array:
    """Distances [nq, max_t·T] with PAD at invalid lanes — same contract
    as pallas_slab_distances, computed as one union matmul."""
    U = union.shape[0]
    T = payload.shape[1]
    nq = queries.shape[0]
    slab = payload[union]                               # [U, T, d]
    n = norms[union]                                    # [U, T]
    sz = sizes[union]                                   # [U]
    q = queries.astype(jnp.float32)
    # follow the payload's precision (bf16 recon payload → bf16 MXU pass;
    # f32 flat payload → f32), mirroring the slab kernel
    qc = q.astype(slab.dtype) if slab.dtype == jnp.bfloat16 else q
    cross = jax.lax.dot_general(
        slab.reshape(U * T, -1), qc,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # [U·T, nq]
    qsq = jnp.sum(q * q, axis=-1)                       # [nq]
    d2 = qsq[None, :] + n.reshape(U * T, 1) - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    lane = jnp.arange(T, dtype=jnp.int32)
    valid = (lane[None, :] < sz[:, None]).reshape(U * T)
    d2 = jnp.where(valid[:, None], d2, PAD_DISTANCE)
    # per-query extraction: out[qi, k, :] = d2m[qi, pos[qi, k], :]
    d2m = d2.reshape(U, T, nq).transpose(2, 0, 1)       # [nq, U, T]
    out = jnp.take_along_axis(d2m, pos[:, :, None], axis=1)
    return out.reshape(nq, -1)                          # [nq, max_t·T]


@functools.partial(jax.jit, static_argnames=("by_residual",))
def union_pq_scan_distances(
    codes: jax.Array,        # [ntiles+1, T, M] uint8 — PQ codes payload
    sizes: jax.Array,        # [ntiles+1] int32
    tile_list: jax.Array,    # [ntiles+1] int32 — owning inverted list
    centroids: jax.Array,    # [nlist, d]
    codebooks: jax.Array,    # [M, ksub, dsub]
    queries: jax.Array,      # [nq, d] f32
    union: jax.Array,        # [U] int32 tile ids
    pos: jax.Array,          # [nq, max_t] int32 positions into union
    by_residual: bool = True,
) -> jax.Array:
    """One-hot ADC scan over union code tiles: [nq, max_t·T] distances with
    PAD at invalid lanes — the memory-tight configuration (M bytes/vector,
    FAISS IVFPQ serving-memory parity; no reconstruction payload).

    The per-(query, probe) residual LUT never materializes — it separates
    exactly (complete the square under the residual):

        LUT(q, p)[m, k] = ‖(q − c_p)_m − cb[m,k]‖²
                        = T1(q)[m,k] + T2(p)[m,k] + C(q, p)/M-terms
        T1(q)[m,k] = ‖cb[m,k]‖² − 2⟨q_m, cb[m,k]⟩      (per query)
        T2(p)[m,k] = 2⟨c_{p,m}, cb[m,k]⟩                (per list)
        C(q, p)    = ‖q − c_p‖²                         (scalar)

    so ADC = one-hot(codes) @ (T1 + T2[list])ᵀ + C — the code lookup is an
    MXU matmul against a [nq, M·ksub] table instead of the per-element
    gather that measured ~100× slower on TPU (ops/scan.coarse_scan_pq)."""
    U = union.shape[0]
    T = codes.shape[1]
    nq, d = queries.shape
    M, ksub, dsub = codebooks.shape
    MK = M * ksub
    q = queries.astype(jnp.float32)
    qsub = q.reshape(nq, M, dsub)
    cbsq = jnp.sum(codebooks * codebooks, axis=-1)         # [M, ksub]
    t1 = cbsq[None] - 2.0 * jnp.einsum(
        "qmd,mkd->qmk", qsub, codebooks,
        preferred_element_type=jnp.float32,
    )                                                      # [nq, M, ksub]
    lut_q = t1.reshape(nq, MK)
    if by_residual:
        csub = centroids.astype(jnp.float32).reshape(-1, M, dsub)
        t2 = 2.0 * jnp.einsum(
            "lmd,mkd->lmk", csub, codebooks,
            preferred_element_type=jnp.float32,
        )
        lut_p = t2.reshape(-1, MK)                         # [nlist, MK]
        qsq = jnp.sum(q * q, axis=-1)
        csq = jnp.sum(centroids * centroids, axis=-1)
        cadd = (
            qsq[:, None] + csq[None, :]
            - 2.0 * q @ centroids.astype(jnp.float32).T
        )                                                  # [nq, nlist]
    else:
        lut_p = None
        cadd = jnp.broadcast_to(
            jnp.sum(q * q, axis=-1)[:, None], (nq, centroids.shape[0])
        )

    kiota = jax.lax.broadcasted_iota(jnp.int32, (T, M, ksub), 2)

    def body(_, u):
        tid = union[u]
        c = codes[tid].astype(jnp.int32)                   # [T, M]
        oh = (c[:, :, None] == kiota).astype(jnp.float32).reshape(T, MK)
        lut = lut_q
        if by_residual:
            lut = lut + lut_p[tile_list[tid]][None]
        dd = jax.lax.dot_general(
            oh, lut,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [T, nq]
        return None, dd

    _, dall = jax.lax.scan(body, None, jnp.arange(U))      # [U, T, nq]
    lists_u = tile_list[union]                             # [U]
    sz = sizes[union]
    d2 = dall.transpose(2, 0, 1)                           # [nq, U, T]
    d2 = d2 + jnp.take_along_axis(cadd, lists_u[None, :], axis=1)[:, :, None]
    d2 = jnp.maximum(d2, 0.0)
    lane = jnp.arange(T, dtype=jnp.int32)
    valid = lane[None, :] < sz[:, None]                    # [U, T]
    d2 = jnp.where(valid[None], d2, PAD_DISTANCE)
    out = jnp.take_along_axis(d2, pos[:, :, None], axis=1)
    return out.reshape(nq, -1)                             # [nq, max_t·T]


@functools.partial(jax.jit, static_argnames=("j_keep",))
def union_scan_pruned(
    payload: jax.Array,      # [ntiles+1, T, d] f32/bf16
    norms: jax.Array,        # [ntiles+1, T] f32
    sizes: jax.Array,        # [ntiles+1] int32
    queries: jax.Array,      # [nq, d] f32
    union: jax.Array,        # [U] int32 tile ids
    pos: jax.Array,          # [nq, max_t] int32 positions into union
    j_keep: int,
) -> Tuple[jax.Array, jax.Array]:
    """Union scan + segment-level pruning: compact each query's candidate
    matrix to its j_keep most promising tiles before selection.

    Returns (dist [nq, j_keep·T] with PAD at invalid lanes,
    sel [nq, j_keep] — kept slots into the pos/max_t axis, ordered by
    ascending per-tile min distance).

    The top-k after a full scan is selection-bound (TPU top-k moves ~7 GB/s
    effective — ops/topk.py): at [256, 55K] it costs as much as the scan
    itself. This kernel reads the same payload (the scan is HBM-bound and
    irreducible) but hands selection only the tiles whose MIN distance
    ranks in the query's top j_keep — the per-tile min is a lower bound on
    every candidate in the tile, so dropped tiles can only contribute
    candidates worse than j_keep already-seen ones. Exact for the top-1 by
    construction; for k > 1 a tail candidate beyond rank j_keep·T is lost
    only when > j_keep tiles hold top-k members with all their mins below
    the kept kth — measured on the clustered/hard 1M workloads: recall@100
    unchanged at j_keep=16 (reference lever: VERDICT r02 item 3, matching
    the reference hot loop server_lib.cpp:126-130).

    The [nq, max_t]-wide tile-min top-k is fused here (slow sort path, but
    max_t ≈ 54 — 3 orders below the hot-width rule); the wide [nq, j·T]
    selection stays in its own bare program per the ops/topk.py contract.
    """
    U = union.shape[0]
    T = payload.shape[1]
    nq = queries.shape[0]
    slab = payload[union]                               # [U, T, d]
    n = norms[union]                                    # [U, T]
    sz = sizes[union]                                   # [U]
    q = queries.astype(jnp.float32)
    qc = q.astype(slab.dtype) if slab.dtype == jnp.bfloat16 else q
    cross = jax.lax.dot_general(
        slab.reshape(U * T, -1), qc,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # [U·T, nq]
    qsq = jnp.sum(q * q, axis=-1)                       # [nq]
    d2 = qsq[None, :] + n.reshape(U * T, 1) - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    lane = jnp.arange(T, dtype=jnp.int32)
    valid = (lane[None, :] < sz[:, None]).reshape(U * T)
    d2 = jnp.where(valid[:, None], d2, PAD_DISTANCE)
    d3 = d2.reshape(U, T, nq)
    # per-(union tile, query) lower bound — fuses into the matmul epilogue
    dmin_u = jnp.min(d3, axis=1)                        # [U, nq]
    tm = jnp.take_along_axis(dmin_u.T, pos, axis=1)     # [nq, max_t]
    _, sel = jax.lax.top_k(-tm, j_keep)                 # [nq, j]
    upos = jnp.take_along_axis(pos, sel, axis=1)        # [nq, j] → union slot
    d2m = d3.transpose(2, 0, 1)                         # [nq, U, T]
    out = jnp.take_along_axis(d2m, upos[:, :, None], axis=1)
    return out.reshape(nq, -1), sel


@functools.partial(jax.jit, static_argnames=("j_keep",))
def union_scan_pruned_qm(
    payload: jax.Array,      # [ntiles+1, T, d] f32/bf16
    norms: jax.Array,        # [ntiles+1, T] f32
    sizes: jax.Array,        # [ntiles+1] int32
    queries: jax.Array,      # [nq, d] f32
    union: jax.Array,        # [U] int32 tile ids
    pos: jax.Array,          # [nq, max_t] int32 positions into union
    j_keep: int,
) -> Tuple[jax.Array, jax.Array]:
    """Query-major pruned union scan — same contract as union_scan_pruned
    but (a) the matmul emits [nq, U·T] directly so the per-query extraction
    is a middle-axis gather with NO transpose of the U·T-sized distance
    matrix (union_scan_pruned's [U·T, nq] → [nq, U, T] transpose re-moves
    ~2× the matrix through HBM), and (b) distances are written bf16
    (selection-grade, halves the d2 write+read; PAD lanes saturate to bf16
    +max ≈ 3.39e38 which still sorts last). Returns
    (dist bf16 [nq, j_keep·T], sel [nq, j_keep]).

    Measured at the SYNTHETIC profiler shape [256 q, U=2560, T=128, J=24]:
    1.9 ms vs 3.2 (union_scan_pruned) / 3.5 (union_scan_pruned_fused
    Pallas). At PRODUCTION union sizes (U≈9400 on the 1M bench) it LOSES
    to the fused Pallas kernel — materializing + re-reading the full
    [nq, U·T] bf16 matrix measured 6.4 ms scan / 22.8K headline vs fused's
    4.7 ms / 25.9K (r04). union_scan_pruned_fused is the production scan;
    this variant is kept as a profiler/oracle formulation only
    (PFH_BENCH_PRUNE_FUSED=0 style opt-ins)."""
    U = union.shape[0]
    T = payload.shape[1]
    nq = queries.shape[0]
    slab = payload[union]                               # [U, T, d]
    n = norms[union]                                    # [U, T]
    sz = sizes[union]                                   # [U]
    q = queries.astype(jnp.float32)
    qc = q.astype(slab.dtype) if slab.dtype == jnp.bfloat16 else q
    cross = jax.lax.dot_general(
        qc, slab.reshape(U * T, -1),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # [nq, U·T]
    qsq = jnp.sum(q * q, axis=-1)                       # [nq]
    d2 = qsq[:, None] + n.reshape(1, U * T) - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    lane = jnp.arange(T, dtype=jnp.int32)
    valid = (lane[None, :] < sz[:, None]).reshape(1, U * T)
    # tile-min selection runs on the bf16 values: keeping the reduce f32
    # forces XLA to materialize the f32 [nq, U·T] matrix alongside the
    # bf16 store (measured 4.5 ms vs 1.9) — so kept-tile ORDER may differ
    # from the f32 oracle when two tile mins round to the same bf16 value
    # (the kept SET is a valid bf16 top-j; downstream flat top-k + exact
    # re-rank are order-insensitive)
    d2 = jnp.where(valid, d2, PAD_DISTANCE).astype(jnp.bfloat16)
    d3 = d2.reshape(nq, U, T)
    dmin_u = jnp.min(d3, axis=2)                        # [nq, U]
    tm = jnp.take_along_axis(dmin_u, pos, axis=1)       # [nq, max_t]
    _, sel = jax.lax.top_k(-tm, j_keep)                 # [nq, j]
    upos = jnp.take_along_axis(pos, sel, axis=1)        # [nq, j] → union slot
    out = jnp.take_along_axis(d3, upos[:, :, None], axis=1)
    return out.reshape(nq, -1), sel


@functools.partial(jax.jit, static_argnames=("j_keep", "interpret"))
def union_scan_pruned_fused(
    payload: jax.Array,      # [ntiles+1, T, d] f32/bf16
    norms: jax.Array,        # [ntiles+1, T] f32
    sizes: jax.Array,        # [ntiles+1] int32
    queries: jax.Array,      # [nq, d] f32
    union: jax.Array,        # [U] int32 tile ids
    pos: jax.Array,          # [nq, max_t] int32 positions into union
    j_keep: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Pruned union scan on the fused Pallas kernel: same contract as
    union_scan_pruned — (dist bf16 [nq, j_keep·T], sel [nq, j_keep]) —
    but the per-tile min never re-reads the distance matrix from HBM
    (ops/pallas_scan.pallas_union_scan_min computes it in the VMEM
    epilogue) and only the KEPT tiles' distance rows are ever gathered.

    The narrow [nq, max_t] tile-min top-k fuses here (max_t ≈ 50, three
    orders below the hot-width rule); the wide [nq, j·T] selection stays
    in its own bare program per the ops/topk.py contract. Distances are
    bf16 (selection-grade; PAD lanes are +inf after the bf16 cast) — the
    downstream wide top-k already runs its level 1 on bf16."""
    from prefhetch_tpu.ops.pallas_scan import pallas_union_scan_min

    U = union.shape[0]
    T = payload.shape[1]
    nq = queries.shape[0]
    d2_all, dmin = pallas_union_scan_min(
        payload, norms, sizes, queries, union, interpret=interpret
    )                                                   # [U,nq,T], [U,1,nq]
    dm = dmin.reshape(U, nq).T                          # [nq, U] — tiny
    tm = jnp.take_along_axis(dm, pos, axis=1)           # [nq, max_t]
    _, sel = jax.lax.top_k(-tm, j_keep)                 # [nq, j]
    upos = jnp.take_along_axis(pos, sel, axis=1)        # [nq, j] → union slot
    # per-(query, kept tile) extraction: whole-T-lane reads from the
    # query-major [U, nq, T] layout — 2·j·T·nq bytes total, not U·T·nq
    out = jax.vmap(lambda m, u: m[u], in_axes=(1, 0))(d2_all, upos)
    return out.reshape(nq, -1), sel


@jax.jit
def union_scan_distances_q16(
    payload: jax.Array,      # [ntiles+1, T, d] f32/bf16
    norms: jax.Array,        # [ntiles+1, T] f32
    sizes: jax.Array,        # [ntiles+1] int32
    queries: jax.Array,      # [nq, d] f32
    union: jax.Array,        # [U] int32 tile ids
    pos: jax.Array,          # [nq, max_t] int32 positions into union
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Union scan fused with per-query u16 range quantization — the device
    side of the tiled binary coarse wire (utils/wire_bin.py).

    Returns (qdist u16 [nq, max_t·T], dmin f32 [nq], dstep f32 [nq]):
    valid lanes hold round((d − dmin)/dstep) ∈ [0, 65534]; invalid lanes
    hold 65535 (wire_bin.Q16_PAD). Selection-grade precision (error ≤
    range/65534 ≈ 2e-5 of the per-query spread — far below PQ/bf16 scan
    error) at 2 B/lane instead of 4, halving both device→host transfer and
    the response wire. The client reconstructs the mask from its cached
    tile-size table, so no masking/extraction happens on the host at all.

    f16 was rejected: SIFT-scale squared distances (~8e6) overflow f16's
    65504 max; bf16's 8-bit mantissa is coarser than this u16 grid.
    """
    U = union.shape[0]
    T = payload.shape[1]
    nq = queries.shape[0]
    slab = payload[union]                               # [U, T, d]
    n = norms[union]                                    # [U, T]
    sz = sizes[union]                                   # [U]
    q = queries.astype(jnp.float32)
    qc = q.astype(slab.dtype) if slab.dtype == jnp.bfloat16 else q
    cross = jax.lax.dot_general(
        slab.reshape(U * T, -1), qc,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # [U·T, nq]
    qsq = jnp.sum(q * q, axis=-1)                       # [nq]
    d2 = qsq[None, :] + n.reshape(U * T, 1) - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    lane = jnp.arange(T, dtype=jnp.int32)
    valid = (lane[None, :] < sz[:, None]).reshape(U * T)
    d2 = jnp.where(valid[:, None], d2, PAD_DISTANCE)
    d2m = d2.reshape(U, T, nq).transpose(2, 0, 1)       # [nq, U, T]
    out = jnp.take_along_axis(d2m, pos[:, :, None], axis=1)
    out = out.reshape(nq, -1)                           # [nq, max_t·T]
    # per-query range quantization over VALID lanes (PAD sorts above any
    # real distance, so min is safe; max needs the mask)
    vmask = out < PAD_DISTANCE
    dmin = jnp.min(out, axis=1)                          # [nq]
    dmax = jnp.max(jnp.where(vmask, out, -jnp.inf), axis=1)
    dstep = jnp.maximum(dmax - dmin, 1e-20) / 65534.0
    qd = jnp.clip(
        jnp.round((out - dmin[:, None]) / dstep[:, None]), 0, 65534
    ).astype(jnp.uint16)
    qd = jnp.where(vmask, qd, jnp.uint16(65535))
    return qd, dmin, dstep


@jax.jit
def resolve_topk_ids(
    pos: jax.Array,        # [nq, k] int32 — positions into the mt·T layout
    tile_idx: jax.Array,   # [nq, mt] int32 — the batch's probed tiles
    ids_table: jax.Array,  # [ntiles+1, T] int32 — global ids per tile slot
) -> jax.Array:
    """Map top-k positions in the padded tile layout to global vector ids.

    Separate dispatch from the top-k (ops/topk.py PERFORMANCE CONTRACT:
    fusing a gather into the top_k program demotes XLA's PartialReduce
    top-k to a ~100× slower sort). The per-element gather here touches only
    nq·k elements — off the hot-lane rule's scale by 3 orders."""
    T = ids_table.shape[1]
    trow = jnp.take_along_axis(tile_idx, pos // T, axis=1)   # [nq, k]
    return ids_table[trow, pos % T]


@functools.partial(
    jax.jit, static_argnames=("by_residual", "interpret", "nqb")
)
def union_pq_scan_distances_pallas(
    codes: jax.Array,        # [ntiles+1, T, M] uint8
    sizes: jax.Array,        # [ntiles+1] int32
    tile_list: jax.Array,    # [ntiles+1] int32
    centroids: jax.Array,    # [nlist, d]
    codebooks: jax.Array,    # [M, ksub, dsub]
    queries: jax.Array,      # [nq, d]
    union: jax.Array,        # [U] int32
    pos: jax.Array,          # [nq, max_t] int32
    by_residual: bool = True,
    nqb: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Pallas variant of union_pq_scan_distances: the [T, M·ksub] one-hot
    lives only in VMEM (ops/pallas_scan.pallas_pq_onehot_distances) and the
    grid parallelizes over (query block, union tile) — ~3.5× the XLA scan
    formulation at SIFT1M. bf16 LUT operands cost ~2-3% coarse-distance
    error (catastrophic cancellation between ±⟨r, cb⟩ LUT terms), absorbed
    by the exact re-rank; end recall measured identical."""
    from prefhetch_tpu.ops.pallas_scan import pallas_pq_onehot_distances

    U = union.shape[0]
    T = codes.shape[1]
    nq, d = queries.shape
    M, ksub, dsub = codebooks.shape
    q = queries.astype(jnp.float32)
    qsub = q.reshape(nq, M, dsub)
    cbsq = jnp.sum(codebooks * codebooks, axis=-1)
    lut_q = (
        cbsq[None] - 2.0 * jnp.einsum(
            "qmd,mkd->qmk", qsub, codebooks,
            preferred_element_type=jnp.float32,
        )
    ).reshape(nq, M * ksub)
    if by_residual:
        csub = centroids.astype(jnp.float32).reshape(-1, M, dsub)
        lut_p = (2.0 * jnp.einsum(
            "lmd,mkd->lmk", csub, codebooks,
            preferred_element_type=jnp.float32,
        )).reshape(-1, M * ksub)
        qsq = jnp.sum(q * q, axis=-1)
        csq = jnp.sum(centroids * centroids, axis=-1)
        cadd = (
            qsq[:, None] + csq[None, :]
            - 2.0 * q @ centroids.astype(jnp.float32).T
        )
    else:
        lut_p = jnp.zeros((centroids.shape[0], M * ksub), jnp.float32)
        cadd = jnp.broadcast_to(
            jnp.sum(q * q, axis=-1)[:, None], (nq, centroids.shape[0])
        )

    part = pallas_pq_onehot_distances(
        codes, lut_q, lut_p, tile_list, union, nqb=nqb,
        interpret=interpret,
    ).reshape(nq, U, T)
    lists_u = tile_list[union]
    d2 = part + jnp.take_along_axis(
        cadd, lists_u[None, :], axis=1
    )[:, :, None]
    d2 = jnp.maximum(d2, 0.0)
    lane = jnp.arange(T, dtype=jnp.int32)
    valid = lane[None, :] < sizes[union][:, None]
    d2 = jnp.where(valid[None], d2, PAD_DISTANCE)
    out = jnp.take_along_axis(d2, pos[:, :, None], axis=1)
    return out.reshape(nq, -1)
