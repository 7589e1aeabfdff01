"""IVF index model families: IVF-Flat and IVF-PQ.

The faiss-fork-equivalent model layer (reference C7, SURVEY.md §2.1): each
model owns a trained IVFIndex and exposes both

- the *protocol-decomposed* services used by the server engine
  (``search_encrypted``-style coarse scan over client-chosen lists), and
- a convenience local ``search`` (assign + scan + rerank in-process) for
  testing and non-private deployments.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from prefhetch_tpu.index.build import build_ivf_index, load_index, save_index
from prefhetch_tpu.index.types import IVFIndex
from prefhetch_tpu.ops.distances import rank_centroids
from prefhetch_tpu.ops.rerank import exact_rerank
from prefhetch_tpu.ops.scan import (
    ScanResult,
    coarse_scan_flat,
    coarse_scan_pq,
    coarse_scan_sq8,
)
from prefhetch_tpu.ops.topk import topk_select_segmented
from prefhetch_tpu.utils.config import IndexParams


class _IVFBase:
    """Shared IVF behavior over the dense padded index layout."""

    def __init__(self, params: IndexParams):
        self.params = params
        self.index: Optional[IVFIndex] = None
        self.nprobe: int = 1  # mirrors faiss Index::nprobe mutable knob

    # -- lifecycle -----------------------------------------------------
    def train_add(self, train: np.ndarray, base: np.ndarray) -> None:
        """train + add in one pass (reference: server_lib.cpp:71,80)."""
        self.index = build_ivf_index(train, base, self.params)

    def save(self, directory: str) -> str:
        assert self.index is not None, "index not trained"
        return save_index(self.index, directory)

    @classmethod
    def load(cls, path: str) -> "_IVFBase":
        idx = load_index(path)
        model = cls(idx.params)
        model.index = idx
        return model

    @property
    def is_trained(self) -> bool:
        return self.index is not None

    @property
    def ntotal(self) -> int:
        return 0 if self.index is None else self.index.ntotal

    def reconstruct_centroids(self) -> np.ndarray:
        """quantizer->reconstruct loop equivalent (server_lib.cpp:101-109)."""
        return self.index.reconstruct_centroids()

    # -- protocol services ----------------------------------------------
    def coarse_scan(
        self, queries: np.ndarray, probe_ids: np.ndarray
    ) -> ScanResult:
        """All-candidate scan of client-chosen lists (SURVEY.md §2.3)."""
        raise NotImplementedError

    # -- local convenience search ----------------------------------------
    def search(
        self, queries: np.ndarray, k: int, coarse_probe: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Full in-process pipeline: rank centroids → coarse scan →
        top-coarse_probe → exact rerank (needs raw vectors) → top-k.

        For IVF-PQ this reranks with ADC scores only unless the model holds
        raw base vectors (set via keep_raw_base in train_add callers)."""
        idx = self.index
        if idx.params.metric == "cosine":
            from prefhetch_tpu.data.synthetic import normalize_rows

            queries = normalize_rows(np.asarray(queries))
        q = jnp.asarray(queries, jnp.float32)
        _, probe = rank_centroids(q, idx.centroids, self.nprobe)
        res = self.coarse_scan(q, probe)
        kk = k if coarse_probe is None else coarse_probe
        # separate dispatch: scan distances are pre-padded, so the top-k
        # stays on XLA's fast path (see ops/topk.py contract); segmented
        # two-level selection is exact and faster at scan widths
        d, pos = topk_select_segmented(res.distances, kk, self.nprobe)
        ids = np.take_along_axis(
            np.asarray(res.ids), np.asarray(pos), axis=1
        )
        return np.asarray(d)[:, :k], ids[:, :k]


class IVFFlat(_IVFBase):
    """IVF with uncompressed vectors in the inverted lists."""

    def __init__(self, params: Optional[IndexParams] = None, **kw):
        params = params or IndexParams(pq_m=0, **kw)
        if params.uses_pq:
            params = IndexParams(
                **{**params.__dict__, "pq_m": 0}
            )
        super().__init__(params)

    def coarse_scan(self, queries, probe_ids) -> ScanResult:
        idx = self.index
        return coarse_scan_flat(
            idx.list_vectors,
            idx.list_ids,
            idx.list_sizes,
            jnp.asarray(queries, jnp.float32),
            jnp.asarray(probe_ids, jnp.int32),
            idx.list_norms,
        )


class IVFPQ(_IVFBase):
    """IVF-PQ: 8-bit PQ codes in the lists, ADC candidate scoring.

    Reference constructor parity: IndexIVFPQ(quantizer, d, nlist, M, nbits)
    (src/server/server_lib.cpp:34-36).
    """

    def __init__(self, params: Optional[IndexParams] = None, **kw):
        super().__init__(params or IndexParams(**kw))
        assert self.params.uses_pq, "IVFPQ requires pq_m > 0"

    def coarse_scan(self, queries, probe_ids) -> ScanResult:
        idx = self.index
        if idx.list_recon is not None:
            # MXU fast path: ADC distance computed as ‖q − z‖² over the
            # precomputed reconstructions (equal values up to bf16 rounding;
            # a dense matmul instead of per-code LUT gathers)
            return coarse_scan_flat(
                idx.list_recon, idx.list_ids, idx.list_sizes,
                jnp.asarray(queries, jnp.float32),
                jnp.asarray(probe_ids, jnp.int32),
                idx.list_norms,
            )
        return coarse_scan_pq(
            idx.centroids,
            idx.list_codes,
            idx.list_ids,
            idx.list_sizes,
            idx.codebooks,
            jnp.asarray(queries, jnp.float32),
            jnp.asarray(probe_ids, jnp.int32),
            by_residual=idx.params.by_residual,
        )


class IVFSQ8(_IVFBase):
    """IVF with per-dimension 8-bit scalar quantization
    (faiss IndexIVFScalarQuantizer QT_8bit analog): d bytes/vector, decoded
    on the fly inside the dense-matmul scan."""

    def __init__(self, params: Optional[IndexParams] = None, **kw):
        params = params or IndexParams(pq_m=0, quantizer="sq8", **kw)
        if params.quantizer != "sq8":
            import dataclasses

            params = dataclasses.replace(params, quantizer="sq8")
        super().__init__(params)

    def coarse_scan(self, queries, probe_ids) -> ScanResult:
        idx = self.index
        return coarse_scan_sq8(
            idx.list_sq, idx.sq_vmin, idx.sq_scale,
            idx.list_ids, idx.list_sizes,
            jnp.asarray(queries, jnp.float32),
            jnp.asarray(probe_ids, jnp.int32),
        )


def rerank_exact(
    base: np.ndarray, queries: np.ndarray, cand_ids: np.ndarray
) -> np.ndarray:
    """Module-level exact rerank over raw base vectors (server stage 6)."""
    return np.asarray(
        exact_rerank(
            jnp.asarray(base, jnp.float32),
            jnp.asarray(queries, jnp.float32),
            jnp.asarray(cand_ids, jnp.int32),
        )
    )
