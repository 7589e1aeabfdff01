"""Brute-force exact L2 index.

Equivalent of faiss::IndexFlatL2, which the reference uses as the coarse
quantizer (reference: src/server/server_lib.cpp:33). Also serves as the
recall oracle for integration tests.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prefhetch_tpu.ops.distances import pairwise_sq_l2


class FlatL2:
    """Exact squared-L2 search over a dense base matrix (MXU matmul + top-k)."""

    def __init__(self, d: int):
        self.d = d
        self._base: jax.Array | None = None

    @property
    def ntotal(self) -> int:
        return 0 if self._base is None else self._base.shape[0]

    def add(self, x: np.ndarray) -> None:
        x = jnp.asarray(x, jnp.float32)
        self._base = x if self._base is None else jnp.concatenate([self._base, x])

    def reconstruct(self, i: int) -> np.ndarray:
        return np.asarray(self._base[i])

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (distances [nq, k] ascending, ids [nq, k])."""
        q = jnp.asarray(queries, jnp.float32)

        @jax.jit
        def _search(q, base):
            d2 = pairwise_sq_l2(q, base)
            neg, idx = jax.lax.top_k(-d2, k)
            return -neg, idx

        d, i = _search(q, self._base)
        return np.asarray(d), np.asarray(i)
