"""Tiled inverted-list view: fixed-size tiles instead of global-lmax padding.

The dense padded layout ([nlist, lmax, …]) pads EVERY list to the longest
list; k-means imbalance makes lmax ≈ 3.5× the mean list length at SIFT1M,
so the scan does 3.5× the necessary work and the payload occupies 3.5× the
necessary HBM. The tiled view re-packs each list into ⌈size/T⌉ consecutive
tiles of T slots (only the last tile of each list is padded), plus one
reserved all-empty tile used to pad probe expansions.

The scan kernel is unchanged — it already takes (payload, norms, sizes,
probe ids): tiles simply become the "lists" it sees. The server expands the
client's logical probes (centroid ids — the wire contract is untouched)
into tile ids host-side per request; tiles of a list are consecutive, so
candidate order (probe-major, storage order within a list) is preserved.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prefhetch_tpu.index.types import IVFIndex

TILE = 512


@dataclasses.dataclass
class TiledView:
    """Device arrays for the tiled scan + host tables for probe expansion."""

    payload: jax.Array          # [ntiles+1, T, d] — +1 = reserved empty tile
    norms: jax.Array            # [ntiles+1, T] f32
    sizes: jax.Array            # [ntiles+1] i32 — valid slots per tile
    ids: jax.Array              # [ntiles+1, T] i32 device — for tail gathers
    tile_ids_np: np.ndarray     # [ntiles+1, T] i32 host — global vector ids
    tile_sizes_np: np.ndarray   # [ntiles+1] i32 host
    tile_start_np: np.ndarray   # [nlist] host — first tile of each list
    tile_count_np: np.ndarray   # [nlist] host — tiles per list
    tile: int = TILE
    # SQ8-quantized payload: x̂ = vmin + (code + ½)·scale per dimension.
    # None when payload is bf16/f32. Halves the scan's HBM traffic.
    sq_vmin: Optional[jax.Array] = None      # [d] f32
    sq_scale: Optional[jax.Array] = None     # [d] f32
    # owning inverted list of each tile (empty tile → 0); the PQ one-hot
    # scan needs it to select the per-list LUT component
    tile_list_np: Optional[np.ndarray] = None    # [ntiles+1] i32

    @property
    def empty_tile(self) -> int:
        return self.payload.shape[0] - 1

    def expand_probes(
        self, probe_ids: np.ndarray, bucket: int = 8,
        min_t: int | None = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Logical probes [nq, nprobe] → (tile ids [nq, max_t],
        candidate counts [nq] — the protocol's listSizesPerQuery).

        max_t is the per-batch max tile count rounded up to `bucket` (bounds
        jit-shape churn); rows are padded with the empty tile. Serving
        callers pass min_t = the worst case over ANY probe set (see
        serving_max_tiles) so every batch hits ONE compiled shape — padding
        tiles cost ~nothing on device (the kernel skips empty tiles and
        Mosaic dedups their consecutive DMAs)."""
        nq, nprobe = probe_ids.shape
        tcounts = self.tile_count_np[probe_ids]               # [nq, nprobe]
        t_totals = tcounts.sum(axis=1)
        max_t = int(-(-int(t_totals.max()) // bucket) * bucket)
        if min_t is not None:
            max_t = max(max_t, int(min_t))
        out = np.full((nq, max_t), self.empty_tile, np.int32)
        for qi in range(nq):
            pos = 0
            for p in probe_ids[qi]:
                s = self.tile_start_np[p]
                c = self.tile_count_np[p]
                out[qi, pos : pos + c] = np.arange(s, s + c, dtype=np.int32)
                pos += c
        cand_counts = self.tile_sizes_np[out].sum(axis=1)
        return out, cand_counts.astype(np.int64)

    def serving_max_tiles(self, nprobe: int, bucket: int = 8) -> int:
        """Fixed tile-axis size covering any nprobe-probe set: the sum of
        the nprobe largest per-list tile counts, bucket-rounded. Using this
        as expand_probes(min_t=…) pins the serving scan to one compiled
        shape per (batch-rows-bucket, nprobe)."""
        counts = np.sort(self.tile_count_np)[::-1]
        worst = int(counts[: min(nprobe, len(counts))].sum())
        return int(-(-max(worst, 1) // bucket) * bucket)


def build_tiled_view(
    index: IVFIndex, tile: int = TILE, quant: str = "none"
) -> Optional[TiledView]:
    """Derive the tiled view from a built index (host-side re-pack).

    Uses the dense scan payload (recon for PQ, raw vectors for flat);
    returns None if the index has no dense payload.

    quant="sq8": per-dimension affine uint8 payload (x̂ = vmin+(code+½)·s) —
    half the HBM bytes of bf16. Norms are computed from the DECODED values
    so the scan's distances are exact for the quantized payload.

    quant="pq": the payload is the raw PQ CODES [·, T, M] uint8 — the
    memory-tight layout (M bytes/vector, FAISS IVFPQ parity) consumed by
    the one-hot ADC scan (ops/union_scan.union_pq_scan_distances)."""
    # prefer the loader/builder's host copies (IVFIndex.host_arrays):
    # np.asarray on device arrays is a d2h fetch through this sandbox's
    # ~12 MB/s relay — 100+ s for the 1.3 GB payload, and even small
    # fetches stall for minutes when the relay is congested (one r05
    # rehearsal spent its whole 720 s budget inside this function)
    host = getattr(index, "host_arrays", None)

    def _h(key, dev):
        a = host.get(key) if host is not None else None
        return a if a is not None else (
            None if dev is None else np.asarray(dev)
        )

    if quant == "pq":
        if index.list_codes is None:
            return None
        codes_h = _h("codes", index.list_codes)
        payload_np = codes_h.astype(np.uint8)             if codes_h.dtype != np.uint8 else codes_h
    elif index.list_recon is not None:
        payload_np = _h("payload", index.list_recon)
    elif index.list_vectors is not None:
        payload_np = _h("payload", index.list_vectors)
    else:
        return None
    ids_np = _h("ids", index.list_ids)
    sizes_np = _h("sizes", index.list_sizes)
    nlist, lmax, d = payload_np.shape

    sq_vmin = sq_scale = None
    if quant == "sq8":
        flat = payload_np.reshape(-1, d).astype(np.float32)
        vmin = flat.min(axis=0)
        vmax = flat.max(axis=0)
        scale = np.maximum(vmax - vmin, 1e-12) / 256.0
        codes = np.clip(
            np.floor((flat - vmin[None]) / scale[None]), 0, 255
        ).astype(np.uint8)
        decoded = vmin[None] + (codes.astype(np.float32) + 0.5) * scale[None]
        payload_np = codes.reshape(nlist, lmax, d)
        decoded_norms = (decoded ** 2).sum(-1).reshape(nlist, lmax)
        sq_vmin, sq_scale = vmin, scale

    tile_count = -(-sizes_np // tile)                 # ⌈size/T⌉, 0 for empty
    tile_count = np.maximum(tile_count, 0)
    tile_start = np.zeros(nlist, np.int64)
    np.cumsum(tile_count[:-1], out=tile_start[1:])
    ntiles = int(tile_count.sum())

    # np.empty, not zeros: every valid slot is overwritten below and only
    # tile tails need zeroing — first-touch of ~340 MB of zeros costs ~5 s
    # on this VM (see CLAUDE.md THP note) for bytes that are replaced
    payload = np.empty((ntiles + 1, tile, d), payload_np.dtype)
    payload[-1] = 0                                   # reserved empty tile
    tile_ids = np.full((ntiles + 1, tile), -1, np.int32)
    tile_sizes = np.zeros(ntiles + 1, np.int32)
    if quant == "sq8":
        norms_np = decoded_norms
    elif quant == "pq":
        norms_np = np.zeros(payload_np.shape[:2], np.float32)  # ADC needs none
    elif index.list_norms is not None:
        norms_np = _h("norms", index.list_norms)
    else:
        norms_np = (payload_np.astype(np.float32) ** 2).sum(-1)
    tile_norms = np.zeros((ntiles + 1, tile), np.float32)
    tile_list = np.zeros(ntiles + 1, np.int32)

    for c in range(nlist):
        size = int(sizes_np[c])
        t0 = int(tile_start[c])
        for k in range(int(tile_count[c])):
            lo = k * tile
            hi = min(size, lo + tile)
            n = hi - lo
            payload[t0 + k, :n] = payload_np[c, lo:hi]
            if n < tile:
                payload[t0 + k, n:] = 0
            tile_ids[t0 + k, :n] = ids_np[c, lo:hi]
            tile_norms[t0 + k, :n] = norms_np[c, lo:hi]
            tile_sizes[t0 + k] = n
            tile_list[t0 + k] = c

    return TiledView(
        payload=jnp.asarray(payload),
        norms=jnp.asarray(tile_norms),
        sizes=jnp.asarray(tile_sizes),
        ids=jnp.asarray(tile_ids),
        tile_ids_np=tile_ids,
        tile_sizes_np=tile_sizes,
        tile_start_np=tile_start.astype(np.int64),
        tile_count_np=tile_count.astype(np.int64),
        tile=tile,
        sq_vmin=None if sq_vmin is None else jnp.asarray(sq_vmin),
        sq_scale=None if sq_scale is None else jnp.asarray(sq_scale),
        tile_list_np=tile_list,
    )
