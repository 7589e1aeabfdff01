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
PAD_DISTANCE = jnp.float32(3.4e38)


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
