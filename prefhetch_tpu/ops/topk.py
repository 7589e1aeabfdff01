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
def masked_topk_smallest(
    distances: jax.Array,   # [..., n]
    mask: jax.Array,        # [..., n] bool — True = valid
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Return (k smallest valid distances ascending, their positions).

    Ties and padding: invalid lanes get +PAD_DISTANCE; among equal distances
    lax.top_k favors lower index, matching the reference's stable scan-order
    tie behavior closely enough for recall parity.
    """
    masked = jnp.where(mask, distances, PAD_DISTANCE)
    neg, idx = jax.lax.top_k(-masked, k)
    return -neg, idx
