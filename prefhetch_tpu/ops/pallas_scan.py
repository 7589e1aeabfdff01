"""Pallas fused candidate-scan kernel.

The coarse scan gathers, per (query, probe), one inverted-list slab
[lmax, d] from HBM and reduces it against the query. XLA's gather+einsum
path works (ops/scan.py), but the access pattern is exactly what
``PrefetchScalarGridSpec`` is built for: the probed list ids are
scalar-prefetched, the index_map selects each slab, and Mosaic
double-buffers the HBM→VMEM DMAs across grid steps while the MXU computes
the current slab's distances — a hand-fused gather+matmul+mask with no
intermediate HBM materialization.

Per grid step b (one flat (query, probe) pair):
    dist[b, :] = ‖q_b‖² + ‖z‖² − 2·z @ q_b   over slab z = payload[list[b]]
with invalid lanes (beyond the list's true size) set to PAD_DISTANCE.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prefhetch_tpu.ops.topk import PAD_DISTANCE


def _kernel(flat_lists_ref,          # scalar-prefetch [B] int32
            sizes_ref,               # scalar-prefetch [nlist] int32
            payload_ref,             # [1, lmax, d] — the b-th probed slab
            norms_ref,               # [1, 1, lmax] f32
            q_ref,                   # [1, 1, d] f32 — the b-th query row
            out_ref):                # [1, 1, lmax] f32
    b = pl.program_id(0)
    lmax = out_ref.shape[2]
    size = sizes_ref[flat_lists_ref[b]]
    # literal pad value: module-level PAD_DISTANCE is a traced constant,
    # which pallas kernels may not capture
    out_ref[0] = jnp.full((1, lmax), jnp.float32(PAD_DISTANCE), jnp.float32)

    # tiled probe expansions pad rows with an all-empty slab; skip its MXU
    # work entirely (the DMA was already skipped by Mosaic's revisiting
    # rule — consecutive identical block indices are fetched once)
    @pl.when(size > 0)
    def _():
        slab = payload_ref[0].astype(jnp.float32)        # [lmax, d]
        q = q_ref[0]                                      # [1, d]
        qsq = jnp.sum(q * q)
        cross = jax.lax.dot_general(
            slab, q,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(1, lmax)                                # [1, lmax]
        d2 = qsq + norms_ref[0] - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, lmax), 1)
        out_ref[0] = jnp.where(lane < size, d2, jnp.float32(PAD_DISTANCE))


def _kernel_sq8(flat_lists_ref,      # scalar-prefetch [B] int32
                sizes_ref,           # scalar-prefetch [nlist] int32
                payload_ref,         # [1, lmax, d] uint8 — SQ8 codes
                norms_ref,           # [1, 1, lmax] f32 (decoded-value norms)
                q_ref,               # [1, 1, d] f32
                aff_ref,             # [1, 2, d] f32 — (vmin, scale)
                out_ref):            # [1, 1, lmax] f32
    """SQ8 variant: decode x̂ = vmin + (code+½)·scale in VMEM, then the same
    fused distance matmul — half the HBM bytes per candidate of bf16.

    The affine decode folds into the matmul:
        x̂·q = (code+½)·(scale⊙q) + vmin·q
    so the MXU still sees one [lmax, d]×[d, 1] contraction and the decode
    costs one elementwise add on the code matrix."""
    b = pl.program_id(0)
    lmax = out_ref.shape[2]
    size = sizes_ref[flat_lists_ref[b]]
    out_ref[0] = jnp.full((1, lmax), jnp.float32(PAD_DISTANCE), jnp.float32)

    @pl.when(size > 0)
    def _():
        # Mosaic has no direct uint8→f32 cast; widen to int32 first
        codes = payload_ref[0].astype(jnp.int32).astype(jnp.float32) + 0.5
        q = q_ref[0]                                        # [1, d]
        vmin = aff_ref[0, 0:1]                              # [1, d]
        scale = aff_ref[0, 1:2]                             # [1, d]
        qs = q * scale                                      # [1, d]
        qsq = jnp.sum(q * q)
        cross = jax.lax.dot_general(
            codes, qs,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(1, lmax) + jnp.sum(vmin * q)
        d2 = qsq + norms_ref[0] - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, lmax), 1)
        out_ref[0] = jnp.where(lane < size, d2, jnp.float32(PAD_DISTANCE))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_slab_distances_sq8(
    payload: jax.Array,      # [nlist, lmax, d] uint8 SQ8 codes
    norms: jax.Array,        # [nlist, lmax] f32 (decoded-value norms)
    sizes: jax.Array,        # [nlist] int32
    vmin: jax.Array,         # [d] f32
    scale: jax.Array,        # [d] f32
    queries: jax.Array,      # [nq, d] f32
    probe_ids: jax.Array,    # [nq, nprobe] int32
    interpret: bool = False,
) -> jax.Array:
    """SQ8 distances [nq, nprobe·lmax], PAD at invalid lanes."""
    nq, nprobe = probe_ids.shape
    nlist, lmax, d = payload.shape
    B = nq * nprobe
    flat = probe_ids.reshape(-1).astype(jnp.int32)
    qrep = jnp.repeat(queries.astype(jnp.float32), nprobe, axis=0)
    norms3 = norms.reshape(nlist, 1, lmax)
    qrep3 = qrep.reshape(B, 1, d)
    aff = jnp.stack([vmin, scale]).reshape(1, 2, d).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, lmax, d),
                lambda b, flat_ref, sz_ref: (flat_ref[b], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, lmax),
                lambda b, flat_ref, sz_ref: (flat_ref[b], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, d),
                lambda b, flat_ref, sz_ref: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, d),
                lambda b, flat_ref, sz_ref: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, lmax),
            lambda b, flat_ref, sz_ref: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _kernel_sq8,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, lmax), jnp.float32),
        interpret=interpret,
    )(flat, sizes.astype(jnp.int32), payload, norms3, qrep3, aff)
    return out.reshape(nq, nprobe * lmax)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_slab_distances(
    payload: jax.Array,      # [nlist, lmax, d] f32/bf16
    norms: jax.Array,        # [nlist, lmax] f32
    sizes: jax.Array,        # [nlist] int32
    queries: jax.Array,      # [nq, d] f32
    probe_ids: jax.Array,    # [nq, nprobe] int32
    interpret: bool = False,
) -> jax.Array:
    """Distances [nq, nprobe·lmax], PAD at invalid lanes (kernel-fused)."""
    nq, nprobe = probe_ids.shape
    nlist, lmax, d = payload.shape
    B = nq * nprobe
    flat = probe_ids.reshape(-1).astype(jnp.int32)
    qrep = jnp.repeat(queries.astype(jnp.float32), nprobe, axis=0)  # [B, d]
    # unit middle axes so every VMEM block's trailing dims equal the full
    # array dims (Mosaic tiling rule for sublane<8 blocks)
    norms3 = norms.reshape(nlist, 1, lmax)
    qrep3 = qrep.reshape(B, 1, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, lmax, d),
                lambda b, flat_ref, sz_ref: (flat_ref[b], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, lmax),
                lambda b, flat_ref, sz_ref: (flat_ref[b], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, d),
                lambda b, flat_ref, sz_ref: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, lmax),
            lambda b, flat_ref, sz_ref: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, lmax), jnp.float32),
        interpret=interpret,
    )(flat, sizes.astype(jnp.int32), payload, norms3, qrep3)
    return out.reshape(nq, nprobe * lmax)


def _kernel_union_min(union_ref,     # scalar prefetch [U] int32 tile ids
                      sizes_ref,     # scalar prefetch [ntiles+1] int32
                      payload_ref,   # [1, T, d] — union[u]'s payload tile
                      norms_ref,     # [1, 1, T] f32
                      q_ref,         # [nq, d] payload dtype
                      qsq_ref,       # [1, nq] f32
                      d2_ref,        # [1, nq, T] bf16 out — query-major
                      min_ref):      # [1, 1, nq] f32 out — per-tile min
    """Union scan with a FUSED per-tile min epilogue.

    The XLA union matmul materializes [U·T, nq] f32 (≈1.2 GB at the 1M
    operating point) and segment pruning re-reads all of it for the
    per-tile min — profiled +1.6 ms on top of an 8.1 ms scan. Here the
    [nq, T] distance block lives in VMEM: its min comes free before the
    bf16 store, the store is HALF the f32 bytes, and the query-major
    [U, nq, T] layout lets the downstream extraction gather move whole
    T-lanes per (query, kept tile) — no transpose of the largest
    intermediate ever hits HBM."""
    u = pl.program_id(0)
    nq, T = d2_ref.shape[1], d2_ref.shape[2]
    size = sizes_ref[union_ref[u]]
    d2_ref[0] = jnp.full((nq, T), jnp.float32(PAD_DISTANCE), d2_ref.dtype)
    min_ref[0] = jnp.full((1, nq), jnp.float32(PAD_DISTANCE), jnp.float32)

    @pl.when(size > 0)
    def _():
        tile = payload_ref[0]                         # [T, d]
        cross = jax.lax.dot_general(
            q_ref[...], tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # [nq, T]
        d2 = qsq_ref[0, :][:, None] + norms_ref[0] - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (nq, T), 1)
        d2 = jnp.where(lane < size, d2, jnp.float32(PAD_DISTANCE))
        d2_ref[0] = d2.astype(d2_ref.dtype)
        min_ref[0] = jnp.min(d2, axis=1).reshape(1, nq)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_union_scan_min(
    payload: jax.Array,      # [ntiles+1, T, d] f32/bf16
    norms: jax.Array,        # [ntiles+1, T] f32
    sizes: jax.Array,        # [ntiles+1] int32
    queries: jax.Array,      # [nq, d] f32
    union: jax.Array,        # [U] int32 tile ids
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(distances bf16 [U, nq, T] query-major with PAD(=inf in bf16) at
    invalid lanes, per-tile min f32 [U, 1, nq]) over the union tiles.

    bf16 distances are selection-grade only — the triage top-k already
    runs its wide level on bf16 (ops/topk.py level1_bf16) and the exact
    re-rank downstream absorbs boundary swaps."""
    ntp1, T, d = payload.shape
    nq = queries.shape[0]
    U = union.shape[0]
    q = queries.astype(jnp.float32)
    qsq = jnp.sum(q * q, axis=-1).reshape(1, nq)
    qc = q.astype(payload.dtype) if payload.dtype == jnp.bfloat16 else q

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(U,),
        in_specs=[
            pl.BlockSpec(
                (1, T, d),
                lambda u, un_ref, sz_ref: (un_ref[u], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, T),
                lambda u, un_ref, sz_ref: (un_ref[u], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nq, d),
                lambda u, un_ref, sz_ref: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nq),
                lambda u, un_ref, sz_ref: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, nq, T),
                lambda u, un_ref, sz_ref: (u, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, nq),
                lambda u, un_ref, sz_ref: (u, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    return pl.pallas_call(
        _kernel_union_min,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((U, nq, T), jnp.bfloat16),
            jax.ShapeDtypeStruct((U, 1, nq), jnp.float32),
        ],
        interpret=interpret,
    )(
        union.astype(jnp.int32), sizes.astype(jnp.int32),
        payload, norms.reshape(ntp1, 1, T).astype(jnp.float32), qc, qsq,
    )


def _kernel_pq_onehot(union_ref,        # scalar prefetch [U] int32 tile ids
                      lists_ref,        # scalar prefetch [ntiles+1] int32
                      codes_ref,        # [1, T, M] uint8 — union[u]'s codes
                      lutq_ref,         # [1, nqb, MK] bf16 — query block
                      lutp_ref,         # [1, 1, MK] bf16 — owning list's LUT
                      out_ref):         # [nqb, T] f32 — query-major
    """One-hot ADC in VMEM: the [T, M·ksub] one-hot never touches HBM.

    dist[q, t] = Σ_m (lutq + lutp)[q, m·ksub + codes[t, m]] — computed as
    lut @ onehot(codes)ᵀ on the MXU. The bf16 operands keep MXU rate; LUT
    rounding is ~2-3% of coarse distance (cancellation between ±⟨r, cb⟩
    terms), absorbed by the exact re-rank downstream (end recall measured
    unchanged). Output is QUERY-major so the downstream extract/top-k needs
    no transpose of the largest intermediate."""
    codes = codes_ref[0].astype(jnp.int32)              # [T, M]
    T, M = codes.shape
    MK = lutq_ref.shape[2]
    ksub = MK // M
    k = jax.lax.broadcasted_iota(jnp.int32, (T, M, ksub), 2)
    oh = (codes[:, :, None] == k).astype(jnp.bfloat16).reshape(T, MK)
    lut = lutq_ref[0] + lutp_ref[0]                     # [nqb, MK] bf16
    out_ref[:, :] = jax.lax.dot_general(
        lut, oh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "nqb"))
def pallas_pq_onehot_distances(
    codes: jax.Array,        # [ntiles+1, T, M] uint8/int8
    lutq: jax.Array,         # [nq, MK] f32/bf16 — per-query LUT component
    lutp: jax.Array,         # [nlist, MK] f32/bf16 — per-list LUT component
    tile_list: jax.Array,    # [ntiles+1] int32
    union: jax.Array,        # [U] int32
    nqb: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """ADC partial distances [nq, U·T] over union code tiles, query-major
    (reshape to [nq, U, T]; add the per-(query, list) scalar and mask
    outside)."""
    U = union.shape[0]
    ntp1, T, M = codes.shape
    nq, MK = lutq.shape
    nqb = min(nqb, nq)
    nq_orig = nq
    if nq % nqb:                # pad the query block axis, slice after
        pad = nqb - nq % nqb
        lutq = jnp.concatenate(
            [lutq, jnp.zeros((pad, MK), lutq.dtype)], axis=0
        )
        nq = nq + pad
    grid = (nq // nqb, U)       # qb outer: the lutq block stays resident

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, T, M),
                lambda qb, u, un_ref, tl_ref: (un_ref[u], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nqb, MK),
                lambda qb, u, un_ref, tl_ref: (0, qb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, MK),
                lambda qb, u, un_ref, tl_ref: (tl_ref[un_ref[u]], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (nqb, T),
            lambda qb, u, un_ref, tl_ref: (qb, u),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _kernel_pq_onehot,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, U * T), jnp.float32),
        interpret=interpret,
    )(
        union.astype(jnp.int32), tile_list.astype(jnp.int32),
        codes,                         # uint8 — widened in-kernel
        lutq.reshape(1, nq, MK).astype(jnp.bfloat16),
        lutp.reshape(-1, 1, MK).astype(jnp.bfloat16),
    )
    return out[:nq_orig] if nq_orig != nq else out
