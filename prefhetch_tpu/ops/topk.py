"""Masked smallest-k selection.

The reference's client sorts full candidate vectors with std::sort and takes
a prefix (src/client/client_lib.cpp:150-156,189-208). The TPU-native
equivalent is lax.top_k over a padded, masked candidate tensor: invalid
(padding) slots are pushed to +inf so they can never enter the result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Large sentinel rather than inf: top_k on -x with inf produces nan-free
# behavior either way, but finite sentinels keep downstream arithmetic sane.
# plain python float: a module-level jnp scalar would initialize the XLA
# backend at import time (breaking jax.distributed.initialize) and trace as
# a captured constant in pallas kernels
PAD_DISTANCE = 3.4e38


@functools.partial(jax.jit, static_argnames=("k",))
def topk_select(
    distances: jax.Array,   # [..., n] — invalid lanes must hold PAD_DISTANCE
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """(k smallest distances ascending, their positions).

    PERFORMANCE CONTRACT: this program contains ONLY the top_k — XLA's fast
    TPU top-k (PartialReduce) pattern-matches a bare top_k; fusing a select
    or a downstream gather into the same program demotes it to a full sort
    (measured ~100-1000× slower at [64, 16K]). Pad inputs upstream (the scan
    does — ScanResult.distances) and gather downstream in a separate
    dispatch.
    """
    neg, idx = jax.lax.top_k(-distances, k)
    return -neg, idx


@functools.partial(
    jax.jit, static_argnames=("k", "n_segments", "level1_bf16")
)
def topk_select_segmented(
    distances: jax.Array,   # [nq, n_segments·seg] — PAD at invalid lanes
    k: int,
    n_segments: int,
    level1_bf16: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Two-level exact top-k: per-segment top-k, then top-k of survivors.

    EXACT for any segmentation: the global k smallest contain at most k
    members per segment, so the per-segment prefilter never discards a
    winner. ~1.6× faster than flat top_k at [64, 55K] (two narrower sorts
    beat one wide one). Returns positions in the ORIGINAL flat layout.

    level1_bf16 runs the wide first level on bfloat16 (~13% faster at
    [256, 55K]): selection near the k-th boundary may differ for
    candidates within bf16 rounding of each other — use it only when a
    downstream exact re-rank absorbs boundary swaps (the triage pipeline
    does; measured end recall change ≤ 0.001). Returned distances are
    then bf16-precision.

    When k ≥ seg the per-segment level keeps EVERY lane (kk = seg) — pure
    overhead — so the call collapses to a single flat top_k. Measured at
    the headline shape [256, 24·128] with a real device_get sync (relay
    block_until_ready returns early): cast-to-f32 + top_k in ONE program
    1.39 ms vs bare-bf16 1.70 vs the two-level bf16 form 1.83 — a leading
    convert does NOT demote XLA's PartialReduce fast path (only fused
    selects/gathers do; see topk_select's contract). bf16 input therefore
    up-casts inside the program; values remain bf16-precision."""
    nq, width = distances.shape
    seg = width // n_segments
    kk = min(k, seg)
    if kk >= seg:
        if distances.dtype == jnp.bfloat16:
            neg, idx = jax.lax.top_k(-distances.astype(jnp.float32), k)
            # cast back: the contract is distances.dtype out on EVERY
            # path (values carry bf16 precision already — the upcast is a
            # kernel-speed trick, not an accuracy one)
            return (-neg).astype(distances.dtype), idx
        return topk_select(distances, k)
    d3 = (-distances).reshape(nq * n_segments, seg)
    if level1_bf16:
        d3 = d3.astype(jnp.bfloat16)
    v1, i1 = jax.lax.top_k(d3, kk)
    v1 = v1.reshape(nq, n_segments * kk)
    i1 = i1.reshape(nq, n_segments * kk)
    v2, i2 = jax.lax.top_k(v1, k)
    seg_slot = i2 // kk
    lane = jnp.take_along_axis(i1, i2, axis=1)
    return (-v2).astype(distances.dtype), seg_slot * seg + lane


@functools.partial(jax.jit, static_argnames=("k",))
def masked_topk_smallest(
    distances: jax.Array,   # [..., n]
    mask: jax.Array,        # [..., n] bool — True = valid
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Return (k smallest valid distances ascending, their positions).

    Convenience form for SMALL widths (≤ a few hundred): the fused
    select+top_k takes XLA's slow sort path, which is fine at small n.
    On the hot path use topk_select on pre-padded distances instead.
    """
    masked = jnp.where(mask, distances, PAD_DISTANCE)
    neg, idx = jax.lax.top_k(-masked, k)
    return -neg, idx
