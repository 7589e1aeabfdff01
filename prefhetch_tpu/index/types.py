"""IVF(-PQ) index storage layout — TPU-native.

The reference's FAISS fork stores inverted lists as ragged CPU arrays inside
faiss::IndexIVFPQ (built by ``add``, reference: src/server/server_lib.cpp:80).
XLA needs static shapes, so here inverted lists live as dense, padded device
arrays:

- ``list_ids   [nlist, lmax] int32``  — global vector ids, -1 padding
- ``list_sizes [nlist] int32``        — true (unpadded) list lengths
- one of:
  - ``list_vectors [nlist, lmax, d] float32``       (IVF-Flat)
  - ``list_codes   [nlist, lmax, M] int32``         (IVF-PQ, uint8 codes
    widened to int32 — TPU gathers/compares prefer 32-bit lanes; HBM-resident
    serialized form stays uint8 for index-memory parity)

``lmax`` is the max list length padded up to a multiple of 128 so the
candidate-scan kernels tile cleanly onto 8×128 VPU lanes.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from prefhetch_tpu.utils.config import IndexParams

LANE = 128


def pad_to_lane(n: int) -> int:
    return max(LANE, -(-n // LANE) * LANE)


class HostArrays:
    """Identity-hashed box of host-side ndarray copies kept on the index.

    IVFIndex parks everything on device, but the tiled-view re-pack
    (index/tiling.py) is HOST work: fetching arrays back through this
    sandbox's d2h relay is both slow (~12 MB/s; the 1.3 GB bf16 payload
    alone is 100+ s) and prone to minute-scale stalls even for small
    reads (see ntotal_host below) — one r05 rehearsal spent its whole
    720 s budget inside build_tiled_view. Builders/loader stash host
    copies here (keys: payload, ids, sizes, norms, codes — whichever
    exist) so the re-pack never touches the device. Boxed rather than a
    raw dict/ndarray because the field is flax-static: static fields
    must stay hashable, and identity hash/eq is correct for a cache."""

    __slots__ = ("d",)

    def __init__(self, d: dict):
        self.d = d

    def get(self, key: str):
        return self.d.get(key)


@flax.struct.dataclass
class IVFIndex:
    """Dense padded IVF(-PQ) index; a JAX pytree, shardable with pjit."""

    centroids: jax.Array            # [nlist, d] f32 — coarse quantizer
    list_ids: jax.Array             # [nlist, lmax] i32, -1 pad
    list_sizes: jax.Array           # [nlist] i32
    # IVF-Flat payload (None when PQ is used)
    list_vectors: Optional[jax.Array] = None   # [nlist, lmax, d] f32
    # IVF-PQ payload
    list_codes: Optional[jax.Array] = None     # [nlist, lmax, M] i32
    codebooks: Optional[jax.Array] = None      # [M, ksub, dsub] f32
    # IVF-SQ8 payload: per-dimension 8-bit scalar quantization
    # (x ≈ vmin + (code + 0.5)·scale) — d bytes/vector, decoded on the fly
    # inside the scan so the distance is still a dense matmul
    list_sq: Optional[jax.Array] = None        # [nlist, lmax, d] uint8
    sq_vmin: Optional[jax.Array] = None        # [d] f32
    sq_scale: Optional[jax.Array] = None       # [d] f32
    # MXU fast path: PQ-reconstructed vectors z = centroid + decode(code),
    # bf16. The ADC distance ‖r − decode(code)‖² equals ‖q − z‖² exactly, so
    # the candidate scan becomes a dense matmul over z instead of 2·M·lmax
    # element-gathers per query — gathers are the slowest primitive on TPU,
    # matmuls the fastest. Costs 2·d bytes/vector of extra HBM (documented
    # trade; the LUT path remains for memory-tight deployments).
    list_recon: Optional[jax.Array] = None     # [nlist, lmax, d] bf16
    # precomputed ‖payload‖² per slot (payload = raw vectors or recon) so the
    # scan never re-reduces the index to get norms
    list_norms: Optional[jax.Array] = None     # [nlist, lmax] f32
    params: IndexParams = flax.struct.field(
        pytree_node=False, default_factory=IndexParams
    )
    # host-side vector count, stamped by the builders/loader: ntotal must
    # never require a device→host transfer (tiny d2h reads through this
    # sandbox's axon relay have been observed to stall for minutes, wedging
    # server startup on the warm-load ntotal sanity check)
    ntotal_host: Optional[int] = flax.struct.field(
        pytree_node=False, default=None
    )
    # host copies of the arrays the tiled-view re-pack reads (see
    # HostArrays) — spares build_tiled_view every d2h relay fetch
    host_arrays: Optional[HostArrays] = flax.struct.field(
        pytree_node=False, default=None
    )

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    @property
    def lmax(self) -> int:
        return self.list_ids.shape[1]

    @property
    def d(self) -> int:
        return self.centroids.shape[1]

    @property
    def uses_pq(self) -> bool:
        return self.list_codes is not None

    @property
    def ntotal(self) -> int:
        if self.ntotal_host is not None:
            return self.ntotal_host
        # host-side sum: a device reduce here would trigger TPU init/compile
        # on first touch (observed 60s+ for a /healthz probe)
        return int(np.asarray(self.list_sizes).sum())

    def reconstruct_centroids(self) -> np.ndarray:
        """Centroid export for the client (privacy step 1).

        Equivalent of the reference's per-centroid ``quantizer->reconstruct``
        loop (src/server/server_lib.cpp:101-109).
        """
        return np.asarray(self.centroids)
