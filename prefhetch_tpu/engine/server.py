"""Server-side query engine — the reference's ``Server`` class rebuilt.

(reference: include/server/server_lib.h:12-50, src/server/server_lib.cpp)

Responsibilities, 1:1 with the reference:

- index lifecycle: cold build (train + add + save) vs warm load, keyed on a
  parameter-encoding artifact file (init_index, server_lib.cpp:55-99),
- raw base vectors kept resident for exact re-rank and retrieval
  (m_DatasetBase, server_lib.cpp:76,89),
- four compute services: retrieve_centroids / coarse_search /
  precise_search / precise_vector_pir (server_lib.cpp:101-196).

TPU-native differences: services are jitted JAX functions over a dense
padded index (ops/scan.py), the engine is explicitly thread-safe for
concurrent HTTP handlers (the reference shares a mutable singleton across
Drogon threads with no locking — SURVEY.md §5.2), and the index can be
sharded over a device mesh (parallel/).
"""

from __future__ import annotations

import logging
import os
import threading
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prefhetch_tpu.data.io import read_fvecs
from prefhetch_tpu.index.build import build_ivf_index, load_index, save_index
from prefhetch_tpu.index.types import IVFIndex
from prefhetch_tpu.ops.rerank import exact_rerank, fetch_vectors
from prefhetch_tpu.ops.scan import coarse_scan_flat, coarse_scan_pq
from prefhetch_tpu.utils.config import PipelineConfig

logger = logging.getLogger("prefhetch.engine")


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class QueryEngine:
    """Holds the trained index + raw base matrix; serves the 4 query services."""

    _instance: Optional["QueryEngine"] = None
    _instance_lock = threading.Lock()

    def __init__(self, config: PipelineConfig, index_dir: str = "."):
        config.validate()
        self.config = config
        self.index_dir = index_dir
        self.index: Optional[IVFIndex] = None
        self.base: Optional[jnp.ndarray] = None
        self._lock = threading.Lock()

    # Reference singleton accessor (include/server/server_lib.h:20-23).
    @classmethod
    def get_instance(
        cls, config: Optional[PipelineConfig] = None, index_dir: str = "."
    ) -> "QueryEngine":
        with cls._instance_lock:
            if cls._instance is None:
                assert config is not None, "first get_instance needs a config"
                cls._instance = cls(config, index_dir)
            return cls._instance

    @classmethod
    def reset_instance(cls) -> None:
        """Drop the singleton (bench HBM purges, test isolation). Any
        handle kept across a reset points at deleted device arrays and
        must be re-acquired via get_instance."""
        with cls._instance_lock:
            cls._instance = None

    # ------------------------------------------------------------------
    def init_index(self) -> None:
        """Cold build or warm load (reference: server_lib.cpp:55-99)."""
        cfg = self.config
        artifact = os.path.join(self.index_dir, cfg.index.artifact_name())

        base = read_fvecs(cfg.base_path)
        if base.shape[1] != cfg.index.d:
            raise ValueError(
                "dataset does not have same dimension as configured d"
            )
        if cfg.index.metric == "cosine":
            from prefhetch_tpu.data.synthetic import normalize_rows

            base = normalize_rows(base)
        self.base = jnp.asarray(base, jnp.float32)

        if not os.path.exists(artifact):
            logger.info("Loading train set")
            train = read_fvecs(cfg.train_path)
            if train.shape[1] != cfg.index.d:
                # reference: "Incorrect dimensions for train set ..."
                raise ValueError(
                    "Incorrect dimensions for train set, not the same as "
                    "PRECISE_VECTOR_DIMENSIONS"
                )
            logger.info("Training on %d vectors", train.shape[0])
            self.index = build_ivf_index(train, base, cfg.index)
            path = save_index(self.index, self.index_dir)
            logger.info("Cached dataset to index file - %s", path)
        else:
            logger.info("Reading cached data from index file - %s", artifact)
            self.index = load_index(artifact)
            if self.index.params != cfg.index:
                raise ValueError("Loaded index params do not match config")
            if self.index.ntotal != base.shape[0]:
                # artifact_name() encodes geometry only; a same-geometry
                # index cached at another dataset scale would serve ids
                # outside this base matrix
                raise ValueError(
                    f"Loaded index holds {self.index.ntotal} vectors but "
                    f"the base set has {base.shape[0]}"
                )

    def set_index(self, index: IVFIndex, base: np.ndarray) -> None:
        """In-process injection (for tests / embedded use)."""
        self.index = index
        self.base = jnp.asarray(base, jnp.float32)

    # Tile size override for the tiled serving layout (None = the
    # index/tiling.py default). Tests use small tiles so tiny fixtures
    # still exercise multi-tile compositions (e.g. segment pruning).
    serve_tile: Optional[int] = None

    @property
    def _tiled_view(self):
        """Tiled scan layout, built once per index (None without a dense
        payload — e.g. pure-LUT PQ mode)."""
        if not hasattr(self, "_tiled_cache"):
            from prefhetch_tpu.index.tiling import build_tiled_view

            with self._lock:      # ThreadingHTTPServer: one init wins
                if not hasattr(self, "_tiled_cache"):
                    self._tiled_cache = (
                        build_tiled_view(self.index, tile=self.serve_tile)
                        if self.serve_tile
                        else build_tiled_view(self.index)
                    )
        return self._tiled_cache

    @property
    def _list_ids_np(self) -> np.ndarray:
        if not hasattr(self, "_ids_np_cache"):
            self._ids_np_cache = np.asarray(self.index.list_ids)
        return self._ids_np_cache

    @property
    def _list_sizes_np(self) -> np.ndarray:
        if not hasattr(self, "_sizes_np_cache"):
            self._sizes_np_cache = np.asarray(self.index.list_sizes)
        return self._sizes_np_cache

    # ------------------------------------------------------------------
    def enable_sharding(self, n_devices: Optional[int] = None) -> None:
        """Shard the index + base matrix over a device mesh: inverted lists
        along nlist, base rows along nbase; queries replicated; collectives
        over ICI (parallel/sharded.py). Services below auto-route to the
        sharded kernels. Net-new capability vs the reference (SURVEY §2.4)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from prefhetch_tpu.parallel.mesh import AXIS, make_mesh
        from prefhetch_tpu.parallel.sharded import shard_index

        self._mesh = make_mesh(n_devices)
        self.index = shard_index(self.index, self._mesh)
        ndev = self._mesh.devices.size
        nb = self.base.shape[0]
        if nb % ndev != 0:
            # pad base rows so the row-shard divides evenly; padded rows are
            # unreachable (ids are always < nb)
            pad = ndev - nb % ndev
            self.base = jnp.concatenate(
                [self.base, jnp.zeros((pad, self.base.shape[1]), jnp.float32)]
            )
        self.base = jax.device_put(
            self.base, NamedSharding(self._mesh, P(AXIS))
        )
        logger.info(
            "Sharded index across %d devices (%d lists/device)",
            ndev, self.index.nlist // ndev,
        )

    @property
    def is_sharded(self) -> bool:
        return getattr(self, "_mesh", None) is not None

    @property
    def _sharded_tiled(self):
        """Tile-sharded twin of the tiled view (lazy, once per index):
        payload/norms/sizes row-sharded over the mesh, ids replicated
        (parallel/sharded.shard_tiled_view). Lets the production tiled
        wire + fused route run sharded with bit-identical semantics
        (r03 VERDICT #4 — the sharded engine previously fell back to the
        slow scan formulation)."""
        if not hasattr(self, "_sharded_tiled_cache"):
            from prefhetch_tpu.parallel.sharded import shard_tiled_view

            with self._lock:
                if not hasattr(self, "_sharded_tiled_cache"):
                    view = self._tiled_view
                    self._sharded_tiled_cache = (
                        None if view is None
                        else shard_tiled_view(view, self._mesh)
                    )
        return self._sharded_tiled_cache

    def _partition_union(self, union_np, pos_np, nq_pad: int, mt: int):
        """Host-side union split across tile owners with the u_loc axis
        PINNED per (row bucket, tile count) — a fresh u_loc is a fresh XLA
        program (minutes through the remote compiler)."""
        from prefhetch_tpu.parallel.sharded import partition_union

        st = self._sharded_tiled
        if not hasattr(self, "_uloc_pin"):
            self._uloc_pin = {}
        key = (nq_pad, mt)
        ndev = self._mesh.devices.size
        union_dev, pos_dev, u_loc = partition_union(
            union_np, pos_np, self._tiled_view.empty_tile, st.tpl, ndev,
            u_loc=self._uloc_pin.get(key),
        )
        self._uloc_pin[key] = u_loc
        return union_dev, pos_dev

    # -- service 1: GET /query -----------------------------------------
    def retrieve_centroids(self) -> np.ndarray:
        """Export all nlist centroids (reference: server_lib.cpp:101-109)."""
        return self.index.reconstruct_centroids()

    # Serving row pinning: when set (serve frontends set it to the batch
    # scheduler's max_batch), EVERY service call pads its row axis to this
    # single value → exactly one compiled XLA program per service instead
    # of one per power-of-two bucket. Device cost is negligible (the MXU
    # pads the nq lane dimension to 128 anyway); it matters here because
    # this sandbox's remote XLA compiles take minutes each.
    rows_pin: Optional[int] = None

    def _rows_pad(self, nq: int) -> int:
        if self.rows_pin is not None and nq <= self.rows_pin:
            return int(self.rows_pin)
        return _next_pow2(nq)

    # ------------------------------------------------------------------
    def _tiled_batch_prep(self, probes_np: np.ndarray, q: jnp.ndarray):
        """Shared serving-shape pinning for the tiled scan paths.

        Expands logical probes to a PINNED tile axis (one compiled shape per
        (row-bucket, nprobe)), buckets batch rows to the next power of two,
        and builds the bucket-padded union tile list — every data-dependent
        dimension is pinned because a fresh XLA program costs minutes
        through this sandbox's remote compiler.

        Takes q as a HOST array [nq, d] (row padding happens in numpy —
        a device-side pad would compile one XLA program per wave size).
        Returns (tile_idx [nq_pad, mt] i32, q_pad jnp [nq_pad, d],
        union np [U_pad], pos np [nq_pad, mt], counts [nq] i64, nq) —
        union/pos stay HOST arrays so the sharded path can partition them
        across tile owners before upload."""
        from prefhetch_tpu.ops.union_scan import union_probe_tiles

        view = self._tiled_view
        if not hasattr(self, "_serve_mt"):
            self._serve_mt = {}
        nprobe = probes_np.shape[1]
        if nprobe not in self._serve_mt:
            self._serve_mt[nprobe] = view.serving_max_tiles(nprobe)
        tile_idx, counts = view.expand_probes(
            probes_np, min_t=self._serve_mt[nprobe]
        )
        nq = tile_idx.shape[0]
        nq_pad = self._rows_pad(nq)
        if nq_pad != nq:
            tile_idx = np.concatenate(
                [tile_idx, np.full((nq_pad - nq, tile_idx.shape[1]),
                                   view.empty_tile, np.int32)]
            )
            # pad rows HOST-side: a device-side jnp.concatenate here would
            # compile (and dispatch) a DISTINCT XLA program for every wave
            # size nq — serving waves take any size 1..rows_pin, and each
            # fresh program costs minutes through the remote compiler
            q = np.concatenate(
                [q, np.zeros((nq_pad - nq, q.shape[1]), np.float32)]
            )
        q = jnp.asarray(q, jnp.float32)
        # union-tile batched matmul scan (ops/union_scan.py): shared probed
        # tiles are read/scored once per batch, one MXU matmul instead of
        # nq·max_t grid steps. |U| is PINNED per row bucket (worst case
        # nq·mt distinct tiles, capped at the whole index).
        union_np, pos_np = union_probe_tiles(tile_idx, view.empty_tile)
        ntiles_cap = int(view.payload.shape[0])          # incl. empty
        u_pad = min(_next_pow2(nq_pad * tile_idx.shape[1] + 1), ntiles_cap)
        u_pad = max(u_pad, len(union_np))    # never truncate
        if u_pad != len(union_np):
            union_np = np.concatenate([
                union_np,
                np.full(u_pad - len(union_np), view.empty_tile,
                        union_np.dtype),
            ])
        return (tile_idx, q, union_np, pos_np, counts, nq)

    # -- service 2 (binary wire): tiled coarse search ---------------------
    def tile_table(self) -> Tuple[np.ndarray, np.ndarray, int]:
        """The static tile→(sizes, global ids) tables a binary-wire client
        caches once (GET /tiletable): (sizes i32 [ntiles+1],
        ids i32 [ntiles+1, T], T). Public information — derived from the
        same index layout the centroid export already reveals."""
        if self._tiled_view is None:
            raise ValueError("tiled wire requires a dense-payload index")
        v = self._tiled_view
        return v.tile_sizes_np, v.tile_ids_np, v.tile

    def coarse_search_tiled_async(
        self,
        precise_query: np.ndarray,        # [nq, d]
        nearest_centroid_idx: np.ndarray,  # [nq, nprobe]
    ):
        """All-candidate coarse scan, tiled binary wire form.

        ASYNC form: every device program and transfer is DISPATCHED (jax
        queues them without blocking) and a zero-arg resolver is returned;
        calling it blocks on the final transfers. Through this sandbox's
        relay a synchronous roundtrip costs ~28 ms regardless of payload —
        the serving loop overlaps wave N's resolve with wave N+1's dispatch
        (serve/native_server.py), so throughput is set by device/host work,
        not relay latency. The sync wrapper below keeps the one-call form.

        Same privacy semantics as coarse_search (EVERY candidate distance in
        the probed lists goes back to the client — the server still never
        learns which candidates the client keeps, server_lib.cpp:111-138),
        but the response stays in the device's padded tile layout:

            (tile_idx i32 [nq, mt], qdist u16 [nq, mt·T],
             dmin f32 [nq], dstep f32 [nq], counts i64 [nq])

        The client resolves ids/validity from its cached tile table
        (tile_table), so the server does ZERO per-candidate host work —
        round 2 measured the ragged JSON wire at 23 q/s against a 15.8K q/s
        device pipeline; this path exists to close that gap."""
        if self._tiled_view is None:
            raise ValueError("tiled wire requires a dense-payload index")
        from prefhetch_tpu.ops.union_scan import union_scan_distances_q16

        view = self._tiled_view
        q = np.asarray(precise_query, np.float32)
        probes_np = np.asarray(nearest_centroid_idx, np.int64)
        tile_idx_p, q_p, union_np, pos_np, counts, nq = (
            self._tiled_batch_prep(probes_np, q)
        )
        if self.is_sharded:
            from prefhetch_tpu.parallel.sharded import sharded_union_scan_q16

            union_dev, pos_dev = self._partition_union(
                union_np, pos_np, q_p.shape[0], tile_idx_p.shape[1]
            )
            qd, dmin, dstep = sharded_union_scan_q16(
                self._mesh, self._sharded_tiled, q_p, union_dev, pos_dev
            )
        else:
            qd, dmin, dstep = union_scan_distances_q16(
                view.payload, view.norms, view.sizes, q_p,
                jnp.asarray(union_np), jnp.asarray(pos_np),
            )

        def resolve():
            # ONE device_get: the relay charges ~30 ms per d2h roundtrip
            # regardless of payload — fetching the outputs separately
            # measured ~30 ms EACH, batched ~40 ms total
            qd_h, dmin_h, dstep_h = jax.device_get((qd, dmin, dstep))
            return (
                tile_idx_p[:nq],
                qd_h[:nq],
                dmin_h[:nq],
                dstep_h[:nq],
                counts,
            )

        return resolve

    def coarse_search_tiled(
        self,
        precise_query: np.ndarray,        # [nq, d]
        nearest_centroid_idx: np.ndarray,  # [nq, nprobe]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        return self.coarse_search_tiled_async(
            precise_query, nearest_centroid_idx
        )()

    def coarse_search_topk(
        self,
        precise_query: np.ndarray,        # [nq, d]
        nearest_centroid_idx: np.ndarray,  # [nq, nprobe]
        k: int,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self.coarse_search_topk_async(
            precise_query, nearest_centroid_idx, k
        )()

    def coarse_search_topk_async(
        self,
        precise_query: np.ndarray,        # [nq, d]
        nearest_centroid_idx: np.ndarray,  # [nq, nprobe]
        k: int,
    ):
        """Server-side top-k coarse selection (binary wire opt-in);
        dispatch-only async form — see coarse_search_tiled_async.

        Returns (ids i32 [nq, k] ascending by coarse distance,
        dists f32 [nq, k], counts i64 [nq]).

        Privacy: EQUIVALENT to the reference protocol in effect — the
        reference client names its kept top-COARSE_PROBE candidates in
        cleartext in the very next request (/precisesearch,
        src/client/client_lib.cpp:158-187), so the server learns the
        selection one round-trip later regardless; selecting server-side
        reveals nothing extra while shrinking the response ~200× (the
        all-candidates wires remain for clients that continue into the
        encrypted/PIR stages and never name candidates). Round-2
        measurement that motivated this: the all-candidates u16 response
        at 1M (6.8 MB per 64-batch) transferred at ~25 MB/s through the
        sandbox relay, capping the engine at ~310 q/s."""
        if self._tiled_view is None:
            raise ValueError("tiled wire requires a dense-payload index")
        from prefhetch_tpu.ops.topk import topk_select
        from prefhetch_tpu.ops.union_scan import (
            resolve_topk_ids, union_scan_distances,
        )

        view = self._tiled_view
        q = np.asarray(precise_query, np.float32)
        probes_np = np.asarray(nearest_centroid_idx, np.int64)
        tile_idx_p, q_p, union_np, pos_np, counts, nq = (
            self._tiled_batch_prep(probes_np, q)
        )
        if int(counts.min()) < k:
            raise ValueError(
                f"probed lists hold {int(counts.min())} candidates < k={k}"
            )
        # three dispatches (scan | top-k | id-resolve): XLA's fast TPU
        # top-k only pattern-matches a bare top_k program (ops/topk.py)
        dist = self._dispatch_union_scan(
            view, q_p, union_np, pos_np, tile_idx_p.shape[1]
        )
        vals, pos = topk_select(dist, k)
        ids_table = (
            self._sharded_tiled.ids if self.is_sharded else view.ids
        )
        ids = resolve_topk_ids(pos, jnp.asarray(tile_idx_p), ids_table)

        def resolve():
            ids_h, vals_h = jax.device_get((ids, vals))   # one roundtrip
            return ids_h[:nq], vals_h[:nq], counts

        return resolve

    def _serve_prune_j(self, mt: int) -> int:
        """Segment-pruning tile budget for the fused serving route (0 =
        off). The r03 serving fused path ran the UNPRUNED scan + the wide
        [nq, mt·T] top-k — ~3× the device time of the bench headline's
        pruned composition, and the measured binder of http_qps (the
        device serializes under overlapped resolvers). Default matches
        the bench lever (J=24 at COARSE_PROBE=256, 1M hard-sweep choice;
        scaled with the funnel), bounded by the tile axis; disabled when
        it cannot cover COARSE_PROBE or would not shrink anything.
        PFH_SERVE_PRUNE_J overrides (0 disables)."""
        cp = int(self.config.protocol.coarse_probe)
        T = self._tiled_view.tile
        default_j = 24 * max(1, cp // 256)
        j = int(os.environ.get("PFH_SERVE_PRUNE_J", default_j))
        j = min(j, mt)
        if j <= 0 or j * T < cp or j >= mt:
            return 0
        return j

    def _dispatch_union_scan_pruned(self, view, q_p, union_np, pos_np,
                                    mt, j):
        """Segment-pruned union scan on the right backend → (dist
        [nq_pad, j·T], sel [nq_pad, j]). Sharded and single-device XLA
        formulations are bit-identical (f32); the single-chip TPU path
        uses the fused Pallas kernel (bf16 distances, selection-grade —
        the wide top-k's level 1 is bf16 anyway)."""
        import jax as _jax

        if self.is_sharded:
            from prefhetch_tpu.parallel.sharded import (
                sharded_union_scan_pruned,
            )

            union_dev, pos_dev = self._partition_union(
                union_np, pos_np, q_p.shape[0], mt
            )
            return sharded_union_scan_pruned(
                self._mesh, self._sharded_tiled, q_p, union_dev, pos_dev, j
            )
        from prefhetch_tpu.ops.union_scan import (
            union_scan_pruned, union_scan_pruned_fused,
        )

        u_j, p_j = jnp.asarray(union_np), jnp.asarray(pos_np)
        if _jax.default_backend() == "tpu":
            # fused Pallas kernel: at PRODUCTION union sizes (U≈3.7× the
            # profiler's synthetic 2560) the qm formulation's full
            # [nq, U·T] bf16 materialization + re-read loses (6.4 vs
            # 4.7 ms scan; headline 22.8K vs 25.9K measured r04) — the
            # VMEM-epilogue extraction never writes the full matrix.
            # AOT-cached: Mosaic programs never hit the XLA persistent
            # cache cross-process in this sandbox (utils/aot.py)
            from prefhetch_tpu.utils.aot import aot_call

            return aot_call(
                union_scan_pruned_fused,
                (view.payload, view.norms, view.sizes, q_p, u_j, p_j),
                tag="uspf", n_out=2, statics={"j_keep": j},
            )
        return union_scan_pruned(
            view.payload, view.norms, view.sizes, q_p, u_j, p_j, j
        )

    def _dispatch_union_scan(self, view, q_p, union_np, pos_np, mt):
        """Dispatch the tiled union scan on the right backend: the
        tile-sharded shard_map twin when sharded, the single-device
        formulation otherwise. Returns dist [nq_pad, mt·T] (replicated
        across the mesh when sharded) — bit-identical either way
        (tests/test_sharded_serving.py)."""
        from prefhetch_tpu.ops.union_scan import union_scan_distances

        if self.is_sharded:
            from prefhetch_tpu.parallel.sharded import sharded_union_scan

            union_dev, pos_dev = self._partition_union(
                union_np, pos_np, q_p.shape[0], mt
            )
            return sharded_union_scan(
                self._mesh, self._sharded_tiled, q_p, union_dev, pos_dev
            )
        return union_scan_distances(
            view.payload, view.norms, view.sizes, q_p,
            jnp.asarray(union_np), jnp.asarray(pos_np),
        )

    # -- service 2: POST /coarsesearch ----------------------------------
    def coarse_search(
        self,
        precise_query: np.ndarray,        # [nq, d]
        nearest_centroid_idx: np.ndarray,  # [nq, nprobe]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All-candidate coarse scan of the client-chosen inverted lists.

        Returns the reference's ragged wire layout
        (server_lib.cpp:111-138): candidates concatenated query-after-query
        (probe order, storage order within a list), as
        (coarse_distance_scores [Σsizes] f32,
         coarse_vector_indexes [Σsizes] i64,
         list_sizes_per_query [nq] i64).
        """
        idx = self.index
        q = jnp.asarray(precise_query, jnp.float32)
        p = jnp.asarray(nearest_centroid_idx, jnp.int32)

        # TPU serving fast path: logical probes expand to fixed-size tiles
        # (index/tiling.py — no global-lmax padding), the Pallas fused scan
        # computes distances, and ids/mask resolve host-side from the static
        # tile tables. The wire contract (logical centroid ids in, ragged
        # candidates out) is unchanged. force_tiled (or
        # PFH_SERVE_FORCE_TILED=1) runs this branch on any backend with the
        # Pallas kernel in interpret mode — CI covers the production
        # composition on the CPU suite.
        import jax as _jax

        on_tpu = _jax.default_backend() == "tpu"
        force_tiled = (
            getattr(self, "force_tiled", False)
            or os.environ.get("PFH_SERVE_FORCE_TILED") == "1"
        )
        if (
            not self.is_sharded
            and (on_tpu or force_tiled)
            and self._tiled_view is not None
        ):
            view = self._tiled_view
            probes_np = np.asarray(nearest_centroid_idx, np.int64)
            tile_idx_p, q_p, union_np, pos_np, counts, nq = (
                self._tiled_batch_prep(probes_np, q)
            )
            dist = np.asarray(
                self._dispatch_union_scan(
                    view, q_p, union_np, pos_np, tile_idx_p.shape[1]
                )
            )[:nq]
            tile_idx = tile_idx_p
            tile_idx = tile_idx[:nq]
            ids_np = view.tile_ids_np[tile_idx]            # [nq, mt, T]
            tsz = view.tile_sizes_np[tile_idx]             # [nq, mt]
            lane = np.arange(view.tile)
            mask = (lane[None, None, :] < tsz[:, :, None]).reshape(dist.shape)
            flat_mask = mask.reshape(-1)
            scores = dist.reshape(-1)[flat_mask].astype(np.float32)
            indexes = ids_np.reshape(-1)[flat_mask].astype(np.int64)
            return scores, indexes, counts

        if self.is_sharded:
            from prefhetch_tpu.parallel.sharded import sharded_coarse_scan

            res = sharded_coarse_scan(self._mesh, idx, q, p)
        elif idx.list_sq is not None:
            from prefhetch_tpu.ops.scan import coarse_scan_sq8

            res = coarse_scan_sq8(
                idx.list_sq, idx.sq_vmin, idx.sq_scale,
                idx.list_ids, idx.list_sizes, q, p,
            )
        elif idx.uses_pq and idx.list_recon is not None:
            # MXU fast path: dense scan over PQ reconstructions (ADC-equal)
            res = coarse_scan_flat(
                idx.list_recon, idx.list_ids, idx.list_sizes, q, p,
                idx.list_norms,
            )
        elif idx.uses_pq:
            res = coarse_scan_pq(
                idx.centroids, idx.list_codes, idx.list_ids, idx.list_sizes,
                idx.codebooks, q, p, by_residual=idx.params.by_residual,
            )
        else:
            res = coarse_scan_flat(
                idx.list_vectors, idx.list_ids, idx.list_sizes, q, p,
                idx.list_norms,
            )
        # padded → ragged at the host/wire boundary
        dist = np.asarray(res.distances)
        ids = np.asarray(res.ids)
        mask = np.asarray(res.mask)
        counts = np.asarray(res.counts).astype(np.int64)
        flat_mask = mask.reshape(-1)
        scores = dist.reshape(-1)[flat_mask].astype(np.float32)
        indexes = ids.reshape(-1)[flat_mask].astype(np.int64)
        return scores, indexes, counts

    # -- service 3: POST /precisesearch ----------------------------------
    def precise_search(
        self,
        precise_query: np.ndarray,             # [nq, d]
        nearest_coarse_vector_idx: np.ndarray,  # [nq, coarse_probe]
    ) -> np.ndarray:
        """Exact L2 of the named candidates (reference: server_lib.cpp:140-167)."""
        return self.precise_search_async(
            precise_query, nearest_coarse_vector_idx
        )()

    def precise_search_async(
        self,
        precise_query: np.ndarray,             # [nq, d]
        nearest_coarse_vector_idx: np.ndarray,  # [nq, coarse_probe]
    ):
        """Dispatch-only form of precise_search — see
        coarse_search_tiled_async for the relay-latency rationale."""
        if self.is_sharded:
            from prefhetch_tpu.parallel.sharded import sharded_rerank

            out = np.asarray(
                sharded_rerank(
                    self._mesh, self.base,
                    jnp.asarray(precise_query, jnp.float32),
                    jnp.asarray(nearest_coarse_vector_idx, jnp.int32),
                )
            )
            return lambda: out
        q = np.asarray(precise_query, np.float32)
        cand = np.asarray(nearest_coarse_vector_idx, np.int64)
        nq = q.shape[0]
        nq_pad = self._rows_pad(nq)     # bucket rows: see coarse_search
        if nq_pad != nq:
            q = np.concatenate([q, np.zeros((nq_pad - nq, q.shape[1]), q.dtype)])
            cand = np.concatenate(
                [cand, np.zeros((nq_pad - nq, cand.shape[1]), cand.dtype)]
            )
        scores = exact_rerank(
            self.base,
            jnp.asarray(q, jnp.float32),
            jnp.asarray(cand, jnp.int32),
        )
        return lambda: np.asarray(scores)[:nq]

    def search_fused(
        self,
        precise_query: np.ndarray,             # [nq, d]
        nearest_centroid_idx: np.ndarray,      # [nq, nprobe]
        k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Whole triage round in ONE request (binary wire kind 11):
        coarse top-COARSE_PROBE on device → exact re-rank → final top-k.
        Returns (ids i64 [nq, k], dists f32 [nq, k]) ascending.

        Net-new serving route (the reference protocol is strictly
        multi-round, client_lib.cpp:83-208): with server-side coarse
        selection already conceded by /coarsesearch kind 9, a fused round
        has identical privacy semantics and removes one full HTTP round
        trip per query — on a one-core host the wire/host cost is the
        serving bottleneck, so this is the high-throughput opt-in."""
        return self.search_fused_async(
            precise_query, nearest_centroid_idx, k
        )()

    def search_fused_async(
        self,
        precise_query: np.ndarray,             # [nq, d]
        nearest_centroid_idx: np.ndarray,      # [nq, nprobe]
        k: int,
    ):
        """Dispatch-only fused round: coarse scan → top-CP → id resolve →
        exact re-rank → final top-k, ONE async device chain with a single
        host sync at the resolver (candidate ids never leave the device
        between stages). See coarse_search_tiled_async."""
        from prefhetch_tpu.ops.rerank import final_topk
        from prefhetch_tpu.ops.topk import topk_select
        from prefhetch_tpu.ops.union_scan import resolve_topk_ids

        if self._tiled_view is None:
            # flat fallback: the sync two-stage composition
            cp = max(int(self.config.protocol.coarse_probe), k)
            ids, dists, _ = self.coarse_search_topk(
                precise_query, nearest_centroid_idx, cp
            )
            cand = ids.astype(np.int64, copy=False)
            scores = self.precise_search(precise_query, cand)
            order = np.argsort(scores, axis=1, kind="stable")[:, :k]
            out = (
                np.take_along_axis(cand, order, axis=1),
                np.take_along_axis(
                    np.asarray(scores, np.float32), order, axis=1
                ),
            )
            return lambda: out
        cp = max(int(self.config.protocol.coarse_probe), k)
        view = self._tiled_view
        q = np.asarray(precise_query, np.float32)
        probes_np = np.asarray(nearest_centroid_idx, np.int64)
        tile_idx_p, q_p, union_np, pos_np, counts, nq = (
            self._tiled_batch_prep(probes_np, q)
        )
        if int(counts.min()) < cp:
            raise ValueError(
                f"probed lists hold {int(counts.min())} candidates < "
                f"COARSE_PROBE={cp}"
            )
        mt = tile_idx_p.shape[1]
        j = self._serve_prune_j(mt)
        tiles_dev = jnp.asarray(tile_idx_p)
        if j:
            from prefhetch_tpu.ops.topk import topk_select_segmented

            dist, sel = self._dispatch_union_scan_pruned(
                view, q_p, union_np, pos_np, mt, j
            )
            _, pos = topk_select_segmented(dist, cp, j, level1_bf16=True)
            tiles_dev = jnp.take_along_axis(tiles_dev, sel, axis=1)
        else:
            dist = self._dispatch_union_scan(view, q_p, union_np, pos_np, mt)
            _, pos = topk_select(dist, cp)
        if self.is_sharded:
            # tile-sharded scan + row-sharded re-rank (the r03 sharded
            # fallback ran the slow two-stage composition — VERDICT #4)
            from prefhetch_tpu.parallel.sharded import sharded_fused_tail

            cand = resolve_topk_ids(pos, tiles_dev, self._sharded_tiled.ids)
            ids_k, dists_k = sharded_fused_tail(
                self._mesh, self.base, q_p, cand, k
            )
        else:
            cand = resolve_topk_ids(pos, tiles_dev, view.ids)
            scores = exact_rerank(self.base, q_p, cand.astype(jnp.int32))
            ids_k, dists_k = final_topk(scores, cand, k)  # i32 ids on device;
        # the wire layer widens to the protocol's i64 host-side (x64 is off
        # under jit — an astype(int64) here would silently stay int32)

        def resolve():
            ids_h, dists_h = jax.device_get((ids_k, dists_k))  # one roundtrip
            return ids_h[:nq], dists_h[:nq]

        return resolve

    # -- service 3b: POST /encryptedsearch --------------------------------
    @property
    def he_service(self):
        """Lazily-built BFV homomorphic compute service (no keys held).

        Backend selection: the int8-MXU MAC kernel when a TPU is the default
        jax backend, host numpy otherwise. Override with PFH_HE_BACKEND
        (e.g. =tpu under a CPU jax to CI-cover the jitted path)."""
        if not hasattr(self, "_he_service"):
            import jax as _jax

            from prefhetch_tpu.crypto.params import bfv_params_for
            from prefhetch_tpu.engine.hecompute import HEComputeService

            he = self.config.he
            backend = os.environ.get("PFH_HE_BACKEND") or (
                "tpu" if _jax.default_backend() == "tpu" else "numpy"
            )
            with self._lock:
                if not hasattr(self, "_he_service"):
                    svc = HEComputeService(
                        bfv_params_for(
                            he.n, he.t_bits, he.n_limbs,
                            odd_t=getattr(he, "resp_mod", "full")
                            == "packed",
                        ),
                        backend=backend,
                    )
                    svc.set_base(np.asarray(self.base))
                    self._he_service = svc
        return self._he_service

    @property
    def ckks_service(self):
        """Lazily-built CKKS slot-packed scoring service.

        Device key-switching backend (engine/ckks_device.py — automorphism
        as permutation gather, digit key-switch through the MXU NTT) when a
        TPU is the default jax backend; host numpy otherwise. Override with
        PFH_CKKS_BACKEND=tpu|numpy (the device path is plain jnp, so =tpu
        also runs — slowly — on the CPU suite)."""
        if not hasattr(self, "_ckks_service"):
            import jax as _jax

            from prefhetch_tpu.crypto.params import ckks_params_for

            he = self.config.he
            backend = os.environ.get("PFH_CKKS_BACKEND") or (
                "tpu" if _jax.default_backend() == "tpu" else "numpy"
            )
            with self._lock:
                if not hasattr(self, "_ckks_service"):
                    params = ckks_params_for(he.n, he.scale_bits, he.n_limbs)
                    if backend == "tpu":
                        from prefhetch_tpu.engine.ckks_device import DeviceCKKS

                        self._ckks_service = DeviceCKKS(params)
                    else:
                        from prefhetch_tpu.engine.hecompute import (
                            CKKSComputeService,
                        )

                        self._ckks_service = CKKSComputeService(params)
        return self._ckks_service

    def encrypted_precise_search(
        self,
        encrypted_queries: list,                 # [nq] ct wire dicts
        nearest_coarse_vector_idx: np.ndarray,   # [nq, P]
        scheme: str = "bfv",
        key_id: str | None = None,
        galois_keys: dict | None = None,
        resp_mod: str = "full",
    ):
        """Encrypted re-rank: Enc(⟨q,x⟩) MACs for the named candidates.

        The plaintext-query precise_search counterpart
        (reference: src/server/server_lib.cpp:140-167), upgraded to the
        encrypted path the reference reserved
        (include/client/client_lib.h:28-36).

        BFV returns the truncated-response wire dict
        {"c1Ntt", "c0Ip", "candidateNorms"} (engine/hecompute.py
        encrypted_scores_trunc — candidate gather/pack/NTT/MAC on device);
        CKKS returns (ct wires per block per query, norms)."""
        base = np.asarray(self.base)
        out_cts, out_norms = [], []
        if scheme == "ckks":
            from prefhetch_tpu.crypto.ckks import CKKSCiphertext

            svc = self.ckks_service
            if galois_keys:
                svc.register_keys(key_id, galois_keys)
            if not svc.has_keys(key_id):
                raise ValueError("unknown CKKS keyId — register Galois keys first")
            if resp_mod == "combined":
                # ONE level-1 result ct per query (~16× smaller download):
                # hecompute.encrypted_scores_combined / the device twin.
                # Client must have registered the combine-tree Galois keys
                # (crypto/ckks.combine_tree_steps) alongside the IP tree's.
                if hasattr(svc, "encrypted_scores_combined_batch"):
                    # device twin accepts raw wires: seedTf cts upload only
                    # c0 + an 8-byte key (c1 regenerates in the program).
                    # Parked-base mode: the server owns the base
                    # (server_lib.cpp:126-130), so only [nq, P] int32 ids
                    # cross the host↔device link — the [nq, P, d] row
                    # upload was the dominant per-request relay cost
                    if getattr(svc, "_base_dev", None) is None:
                        svc.set_base(base)
                    res, norms = svc.encrypted_scores_combined_batch(
                        encrypted_queries,
                        np.asarray(nearest_coarse_vector_idx, np.int32),
                        key_id,
                    )
                else:                                     # host service
                    cand = base[
                        np.asarray(nearest_coarse_vector_idx, np.int64)
                    ].astype(np.float64)                  # [nq, P, d]
                    res, norms_l = [], []
                    for i, w in enumerate(encrypted_queries):
                        c, nm = svc.encrypted_scores_combined(
                            svc.ctx.ct_from_wire(w), cand[i], key_id
                        )
                        res.append(c)
                        norms_l.append(nm)
                    norms = np.stack(norms_l)
                return {
                    "encryptedScoresCombined": [c.to_wire() for c in res],
                    "candidateNorms": norms.tolist(),
                }
            for i, ct_wire in enumerate(encrypted_queries):
                ct = CKKSCiphertext.from_wire(ct_wire)
                cands = base[np.asarray(nearest_coarse_vector_idx[i], np.int64)]
                cts, norms = svc.encrypted_scores(ct, cands, key_id)
                out_cts.append([c.to_wire() for c in cts])
                out_norms.append(norms.tolist())
        else:
            from prefhetch_tpu.crypto.bfv import Ciphertext
            from prefhetch_tpu.utils.wire import pack_i32

            cand = np.asarray(nearest_coarse_vector_idx, np.int64)
            if resp_mod == "packed":
                # packed single-ct wire: d/nb queries per 2-limb response
                # ct (~66× smaller download) — needs client Galois keys
                svc = self.he_service
                if galois_keys:
                    svc.register_galois_keys(key_id, galois_keys)
                if not svc.has_galois_keys(key_id):
                    raise ValueError(
                        "unknown BFV keyId — register Galois keys first"
                    )
                # wire-direct: seedTf cts upload only c0 + an 8-byte key
                # (c1 regenerates inside the device program)
                packed, norms, grp = svc.encrypted_scores_packed_wire(
                    encrypted_queries, cand, key_id
                )
                return {
                    "packedScores": [c.to_wire() for c in packed],
                    "candidateNorms": norms.tolist(),
                    "packGroup": grp,
                }
            cts_in = [
                self.he_service.ctx.ct_from_wire(w)
                for w in encrypted_queries
            ]
            if resp_mod == "q1":
                # modulus-switched single-limb wire, ~2× smaller (client
                # must hold a sparse secret — hecompute._trunc_mac_q1_fn)
                c1_q1, c0_ip, norms = (
                    self.he_service.encrypted_scores_trunc_q1(cts_in, cand)
                )
                return {
                    "c1Q1": pack_i32(c1_q1),
                    "c0Ip": pack_i32(c0_ip),
                    "candidateNorms": norms.tolist(),
                }
            c1_ntt, c0_ip, norms = self.he_service.encrypted_scores_trunc(
                cts_in, cand
            )
            return {
                "c1Ntt": pack_i32(c1_ntt),
                "c0Ip": pack_i32(c0_ip),
                "candidateNorms": norms.tolist(),
            }
        return out_cts, out_norms

    # -- service 4b: POST /pir-fetch (real PIR) ----------------------------
    @property
    def pir_service(self):
        """Real single-server PIR (crypto/pir.py) over the base matrix."""
        if not hasattr(self, "_pir_service"):
            from prefhetch_tpu.crypto.params import pir_params_for
            from prefhetch_tpu.crypto.pir import PIRServer

            he = self.config.he
            with self._lock:
                if not hasattr(self, "_pir_service"):
                    self._pir_service = PIRServer(
                        np.asarray(self.base),
                        pir_params_for(he.n, he.pir_plain_modulus, he.n_limbs),
                    )
        return self._pir_service

    @property
    def pir2_service(self):
        """2-D hypercube PIR (SealPIR-style): upload O(1) ct, server work
        O(G) device MACs + O(√G) expansion key switches — the form that
        scales to the full dataset. Device-backed when a TPU is the default
        backend (PFH_PIR_BACKEND overrides)."""
        if not hasattr(self, "_pir2_service"):
            import jax as _jax

            from prefhetch_tpu.crypto.params import pir_params_for

            he = self.config.he
            backend = os.environ.get("PFH_PIR_BACKEND") or (
                "tpu" if _jax.default_backend() == "tpu" else "numpy"
            )
            with self._lock:
                if not hasattr(self, "_pir2_service"):
                    params = pir_params_for(
                        he.n, he.pir_plain_modulus, he.n_limbs
                    )
                    if backend == "tpu":
                        from prefhetch_tpu.engine.pir_device import DevicePIR2

                        self._pir2_service = DevicePIR2(
                            np.asarray(self.base), params
                        )
                    else:
                        from prefhetch_tpu.crypto.pir import PIR2Server

                        self._pir2_service = PIR2Server(
                            np.asarray(self.base), params
                        )
        return self._pir2_service

    def pir_fetch(
        self,
        pir_queries: list | None = None,
        packed: list | None = None,
        hypercube: list | None = None,
        hypercube_multi: list | None = None,
        key_id: str | None = None,
        galois_keys: dict | None = None,
    ) -> list:
        """Answer PIR queries; the server never learns the row indices.

        Four forms: `pir_queries` = naive (G selector cts per row);
        `packed` = 1-D oblivious expansion (ONE ct per row, host);
        `hypercube` = 2-D SealPIR-style (ONE ct per row, device-backed —
        the production path at large nbase); `hypercube_multi` = 2-D with
        multi-row packed queries (ONE ct per ⌊N/m⌋ rows — K× less upload;
        each entry {"ct": wire, "nRows": k} yields k responses in order)."""
        if hypercube_multi is not None:
            svc = self.pir2_service
            if galois_keys:
                svc.register_galois_keys(key_id, galois_keys)
            if not svc.has_keys(key_id):
                raise ValueError(
                    "unknown PIR keyId — register Galois keys first"
                )
            out: list = []
            # batch runs of equal nRows (the client pads every chunk to one
            # fixed nRows, so a whole request is usually ONE batched call
            # sharing ~2 DB passes across all its cts)
            i = 0
            while i < len(hypercube_multi):
                nr = int(hypercube_multi[i]["nRows"])
                j = i
                while (
                    j < len(hypercube_multi)
                    and int(hypercube_multi[j]["nRows"]) == nr
                ):
                    j += 1
                wires = [e["ct"] for e in hypercube_multi[i:j]]
                if hasattr(svc, "answer_2d_multi_batch"):
                    out.extend(svc.answer_2d_multi_batch(wires, key_id, nr))
                else:
                    for w in wires:
                        out.extend(svc.answer_2d_multi(w, key_id, nr))
                i = j
            return out
        if hypercube is not None:
            svc = self.pir2_service
            if galois_keys:
                svc.register_galois_keys(key_id, galois_keys)
            if not svc.has_keys(key_id):
                raise ValueError(
                    "unknown PIR keyId — register Galois keys first"
                )
            if len(hypercube) > 1 and hasattr(svc, "answer_2d_batch"):
                # stage-8 fetches K rows per query: fold every selector
                # set against ONE pass over the packed DB (pir_device)
                return svc.answer_2d_batch(hypercube, key_id)
            return [svc.answer_2d(w, key_id) for w in hypercube]
        svc = self.pir_service
        if packed is not None:
            if galois_keys:
                svc.register_galois_keys(key_id, galois_keys)
            if not svc.has_keys(key_id):
                raise ValueError(
                    "unknown PIR keyId — register Galois keys first"
                )
            return [svc.answer_packed(w, key_id) for w in packed]
        return [svc.answer(q) for q in pir_queries]

    # -- service 4: POST /precise-vector-pir ------------------------------
    def precise_vector_pir(self, ids: np.ndarray) -> np.ndarray:
        """Gather the K named vectors per query
        (reference: server_lib.cpp:169-196 — a PIR placeholder: ids arrive
        in cleartext at this protocol revision)."""
        if self.is_sharded:
            from prefhetch_tpu.parallel.sharded import sharded_fetch

            return np.asarray(
                sharded_fetch(self._mesh, self.base, jnp.asarray(ids, jnp.int32))
            )
        return np.asarray(
            fetch_vectors(self.base, jnp.asarray(ids, jnp.int32))
        )
