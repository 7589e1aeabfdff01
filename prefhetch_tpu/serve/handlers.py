"""Transport-agnostic route dispatch — the controller layer.

The reference binds route handling to Drogon controller methods
(src/server/controllers/Query.h:9-33, Query.cc:10-127). Here the same
handlers are a plain (method, path, headers, body) → (status, content-type,
bytes) function so every frontend — the stdlib threaded server
(serve/http_server.py), the asyncio event loop (serve/aio_server.py), and
the native C++ epoll frontend (native/pfh_http.cpp via
serve/native_server.py) — shares one implementation and one test surface.

Two wire encodings per route:

- JSON with the reference's exact field names (Query.cc:34-56 — parity
  surface, see the table in serve/http_server.py), and
- the binary container of utils/wire_bin.py (client opt-in via the request
  Content-Type / Accept: application/x-prefhetch-bin), which exists because
  JSON text for ~15K-candidate coarse responses capped serving at ~23 q/s
  (round-2 measurement) on a one-core host.
"""

from __future__ import annotations

import collections
import json
import logging
import threading
import time
from typing import Dict, Optional, Tuple

import numpy as np

from prefhetch_tpu.utils import wire_bin

logger = logging.getLogger("prefhetch.serve")

JSON_CT = "application/json"
BIN_CT = wire_bin.CONTENT_TYPE


class ServerStats:
    """Per-route request counters + latency aggregates.

    Server-side observability the reference lacks entirely (its only timer
    is client-side, SURVEY.md §5.1). Exposed at GET /stats."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counts = collections.Counter()
        self._errors = collections.Counter()
        self._total_s = collections.defaultdict(float)
        self._max_s = collections.defaultdict(float)

    def record(self, route: str, seconds: float, ok: bool) -> None:
        with self._lock:
            self._counts[route] += 1
            if not ok:
                self._errors[route] += 1
            self._total_s[route] += seconds
            self._max_s[route] = max(self._max_s[route], seconds)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                route: {
                    "count": self._counts[route],
                    "errors": self._errors[route],
                    "mean_ms": round(
                        self._total_s[route] / self._counts[route] * 1e3, 3
                    ),
                    "max_ms": round(self._max_s[route] * 1e3, 3),
                }
                for route in self._counts
            }


Response = Tuple[int, str, bytes]


def _json_resp(obj, status: int = 200) -> Response:
    return status, JSON_CT, json.dumps(obj).encode()


def _bin_resp(kind: int, sections, status: int = 200) -> Response:
    return status, BIN_CT, wire_bin.encode(kind, sections)


class Dispatcher:
    """Routes requests to the engine; owns the stats aggregate."""

    def __init__(self, engine) -> None:
        self.engine = engine
        self.stats = ServerStats()
        # cached static binary payloads (built on first request)
        self._tiletable_cache: Optional[bytes] = None
        self._cache_lock = threading.Lock()

    # -- entry point ----------------------------------------------------
    def handle(
        self,
        method: str,
        path: str,
        headers: Dict[str, str],
        body: bytes,
    ) -> Response:
        t0 = time.perf_counter()
        ok = True
        try:
            if method == "GET":
                resp = self._get(path, headers)
            elif method == "POST":
                resp = self._post(path, headers, body)
            else:
                resp = _json_resp({"error": "method not allowed"}, 405)
        except (KeyError, TypeError, ValueError, IndexError) as e:
            resp = _json_resp({"error": str(e)}, 400)
        ok = resp[0] < 400
        self.stats.record(
            f"{method} {path}", time.perf_counter() - t0, ok
        )
        return resp

    # -- GET routes ------------------------------------------------------
    def _get(self, path: str, headers: Dict[str, str]) -> Response:
        engine = self.engine
        accept_bin = BIN_CT in headers.get("accept", "")
        if path == "/query" or path.rstrip("/") == "":
            # GET /query → bare centroid array (reference: Query.cc:17-23)
            centroids = np.asarray(engine.retrieve_centroids(), np.float32)
            if accept_bin:
                return _bin_resp(wire_bin.KIND_CENTROIDS, [centroids])
            from prefhetch_tpu import native

            enc = native.json_encode_f32_nested(centroids)
            if enc is not None:
                return 200, JSON_CT, enc
            return _json_resp(centroids.tolist())
        if path == "/tiletable":
            # net-new (binary wire): static tile→(size, ids) tables the
            # client caches once; index-layout metadata on par with the
            # centroid export. Always binary (it is ~4 MB at SIFT1M).
            with self._cache_lock:
                if self._tiletable_cache is None:
                    sizes, ids, tile = engine.tile_table()
                    self._tiletable_cache = wire_bin.encode(
                        wire_bin.KIND_TILETABLE,
                        [sizes.astype(np.int32), ids.astype(np.int32)],
                    )
            return 200, BIN_CT, self._tiletable_cache
        if path == "/codebooks":
            # net-new: public PQ index metadata so encrypted-mode clients
            # can send a QUANTIZED coarse query instead of the plaintext one
            # (the reserved compute_encrypted_coarse_query slot, reference:
            # include/client/client_lib.h:28-36)
            idx = engine.index
            if idx.codebooks is None:
                return _json_resp({"codebooks": None})
            return _json_resp({
                "codebooks": np.asarray(idx.codebooks).tolist(),
                "byResidual": bool(idx.params.by_residual),
            })
        if path == "/healthz":
            return _json_resp({"status": "ok", "ntotal": engine.index.ntotal})
        if path == "/stats":
            snap = self.stats.snapshot()
            if hasattr(engine, "stats"):   # batching mode
                snap["batcher"] = engine.stats()
            return _json_resp(snap)
        return _json_resp({"error": "not found"}, 404)

    # -- POST routes -----------------------------------------------------
    def _post(
        self, path: str, headers: Dict[str, str], body: bytes
    ) -> Response:
        is_bin = headers.get("content-type", "").startswith(BIN_CT)
        if path == "/coarsesearch":
            if is_bin:
                return self._coarse_search_bin(body)
            return self._coarse_search(self._parse_json(body))
        if path == "/precisesearch":
            if is_bin:
                return self._precise_search_bin(body)
            return self._precise_search(self._parse_json(body))
        if path == "/search":
            if is_bin:
                return self._search_bin(body)
            return _json_resp({"error": "binary wire only"}, 400)
        if path == "/encryptedsearch":
            return self._encrypted_search(self._parse_json(body))
        if path == "/precise-vector-pir":
            if is_bin:
                return self._precise_vector_pir_bin(body)
            return self._precise_vector_pir(self._parse_json(body))
        if path == "/pir-fetch":
            return self._pir_fetch(self._parse_json(body))
        return _json_resp({"error": "not found"}, 404)

    @staticmethod
    def _parse_json(body: bytes):
        try:
            return json.loads(body)
        except ValueError as e:
            raise ValueError(f"bad json: {e}") from None

    # reference: Query.cc:29-63
    def _coarse_search(self, body) -> Response:
        probes = np.asarray(body["nearestCentroidIndexes"], np.int64)
        if "coarseQueryCodes" in body:
            # encrypted-mode quantized coarse query: the client sends PQ
            # codes of (q − centroid[probe₀]) instead of the full-precision
            # query — the reserved compute_encrypted_coarse_query
            # realization (reference: include/client/client_lib.h:28-36,
            # "Sending precise query temporarily"). The server reconstructs
            # q̂ and triages with it; the exact re-rank runs encrypted.
            codes = np.asarray(body["coarseQueryCodes"], np.int64)
            q = self._reconstruct_coarse_query(codes, probes)
        else:
            q = np.asarray(body["preciseQuery"], np.float32)
        self._check_coarse_args(q, probes)
        scores, indexes, sizes = self.engine.coarse_search(q, probes)
        # hot wire path: the response carries Σ list-sizes scores + ids
        # (~10⁴–10⁵ numbers/query at SIFT1M) — serialized by the native C++
        # codec (native/prefhetch_native.cpp), ~12× faster than
        # json.dumps(x.tolist()) at this size; stdlib fallback below.
        from prefhetch_tpu import native

        enc_s = native.json_encode_f32(scores)
        enc_i = native.json_encode_i64(indexes)
        enc_z = native.json_encode_i64(sizes)
        if enc_s is not None and enc_i is not None and enc_z is not None:
            return 200, JSON_CT, (
                b'{"coarseDistanceScores":' + enc_s
                + b',"coarseVectorIndexes":' + enc_i
                + b',"listSizesPerQuery":' + enc_z + b"}"
            )
        return _json_resp(
            {
                "coarseDistanceScores": scores.tolist(),
                "coarseVectorIndexes": indexes.tolist(),
                "listSizesPerQuery": sizes.tolist(),
            }
        )

    def _reconstruct_coarse_query(
        self, codes: np.ndarray, probes: np.ndarray
    ) -> np.ndarray:
        idx = self.engine.index
        if idx.codebooks is None:
            raise ValueError("coarseQueryCodes requires a PQ index")
        cb = np.asarray(idx.codebooks)       # [M, ksub, dsub]
        M, ksub, dsub = cb.shape
        if codes.ndim != 2 or codes.shape[1] != M:
            raise ValueError("coarseQueryCodes shape mismatch")
        if codes.min() < 0 or codes.max() >= ksub:
            raise ValueError("PQ code out of range")
        rec = cb[np.arange(M)[None, :], codes]         # [nq, M, dsub]
        q = rec.reshape(codes.shape[0], -1)
        if idx.params.by_residual:
            q = q + np.asarray(idx.centroids)[probes[:, 0]]
        return q.astype(np.float32)

    def _check_coarse_args(self, q: np.ndarray, probes: np.ndarray) -> None:
        if q.ndim != 2 or probes.ndim != 2 or q.shape[0] != probes.shape[0]:
            raise ValueError(
                "preciseQuery/nearestCentroidIndexes shape mismatch"
            )
        nlist = self.engine.index.nlist
        if probes.min() < 0 or probes.max() >= nlist:
            raise ValueError("centroid index out of range")

    # binary coarse wire, two request kinds:
    # - KIND_COARSE_REQ (q f32 [nq, d], probes i64 [nq, nprobe])
    #   → KIND_COARSE_TILED (tile_idx i32, qdist u16, dmin f32, dstep f32,
    #     counts i64) — ALL candidates, client-side selection (reference
    #     privacy decomposition, for flows that never name candidates)
    # - KIND_COARSE_TOPK_REQ (q, probes, k u32 [1])
    #   → KIND_COARSE_TOPK (ids i32 [nq, k], dists f32 [nq, k], counts) —
    #     server-side top-k; privacy-equivalent for the reference flow,
    #     whose next request names the kept set anyway (see
    #     engine.coarse_search_topk docstring)
    def _coarse_search_bin(self, body: bytes) -> Response:
        kind, secs = wire_bin.decode(body)
        if kind == wire_bin.KIND_COARSE_REQ and len(secs) == 2:
            q = np.asarray(secs[0], np.float32)
            probes = np.asarray(secs[1], np.int64)
            self._check_coarse_args(q, probes)
            tile_idx, qdist, dmin, dstep, counts = (
                self.engine.coarse_search_tiled(q, probes)
            )
            return _bin_resp(
                wire_bin.KIND_COARSE_TILED,
                [tile_idx.astype(np.int32, copy=False), qdist,
                 dmin.astype(np.float32, copy=False),
                 dstep.astype(np.float32, copy=False),
                 counts.astype(np.int64, copy=False)],
            )
        if kind == wire_bin.KIND_COARSE_TOPK_REQ and len(secs) == 3:
            q = np.asarray(secs[0], np.float32)
            probes = np.asarray(secs[1], np.int64)
            k = int(np.asarray(secs[2]).reshape(-1)[0])
            if not 0 < k <= 1 << 20:
                raise ValueError("bad k")
            self._check_coarse_args(q, probes)
            ids, dists, counts = self.engine.coarse_search_topk(q, probes, k)
            return _bin_resp(
                wire_bin.KIND_COARSE_TOPK,
                [ids.astype(np.int32, copy=False),
                 dists.astype(np.float32, copy=False),
                 counts.astype(np.int64, copy=False)],
            )
        raise ValueError("bad coarse binary request")

    def _search_bin(self, body: bytes) -> Response:
        """Fused one-round triage (net-new, binary wire kind 11): coarse
        top-CP + exact re-rank + final top-k in one request. Same privacy
        semantics as /coarsesearch kind 9 followed by /precisesearch (see
        engine.search_fused); halves the per-query HTTP rounds."""
        kind, secs = wire_bin.decode(body)
        if kind != wire_bin.KIND_SEARCH_REQ or len(secs) != 3:
            raise ValueError("bad search binary request")
        q = np.asarray(secs[0], np.float32)
        probes = np.asarray(secs[1], np.int64)
        k = int(np.asarray(secs[2]).reshape(-1)[0])
        if not 0 < k <= 1 << 20:
            raise ValueError("bad k")
        self._check_coarse_args(q, probes)
        ids, dists = self.engine.search_fused(q, probes, k)
        return _bin_resp(
            wire_bin.KIND_SEARCH,
            [ids.astype(np.int64, copy=False),
             dists.astype(np.float32, copy=False)],
        )

    # reference: Query.cc:65-97
    def _precise_search(self, body) -> Response:
        q = np.asarray(body["preciseQuery"], np.float32)
        cand = np.asarray(body["nearestCoarseVectorIndexes"], np.int64)
        scores = self._precise_scores(q, cand)
        from prefhetch_tpu import native

        enc = native.json_encode_f32_nested(scores)
        if enc is not None:
            return 200, JSON_CT, b'{"preciseDistanceScores":' + enc + b"}"
        return _json_resp({"preciseDistanceScores": scores.tolist()})

    def _precise_search_bin(self, body: bytes) -> Response:
        kind, secs = wire_bin.decode(body)
        if kind != wire_bin.KIND_PRECISE_REQ or len(secs) != 2:
            raise ValueError("bad precise binary request")
        q = np.asarray(secs[0], np.float32)
        cand = np.asarray(secs[1], np.int64)
        scores = self._precise_scores(q, cand)
        return _bin_resp(
            wire_bin.KIND_PRECISE,
            [np.asarray(scores, np.float32)],
        )

    def _precise_scores(self, q: np.ndarray, cand: np.ndarray) -> np.ndarray:
        if q.ndim != 2 or cand.ndim != 2 or q.shape[0] != cand.shape[0]:
            raise ValueError(
                "preciseQuery/nearestCoarseVectorIndexes shape mismatch"
            )
        ntotal = self.engine.base.shape[0]
        if cand.min() < 0 or cand.max() >= ntotal:
            raise ValueError("vector index out of range")
        return self.engine.precise_search(q, cand)

    # net-new route: the encrypted re-rank the reference reserved for SEAL
    # (include/client/client_lib.h:28-36). The query never leaves the
    # client in plaintext on this path.
    def _encrypted_search(self, body) -> Response:
        enc_queries = body["encryptedPreciseQuery"]       # [nq] ct wires
        cand = np.asarray(body["nearestCoarseVectorIndexes"], np.int64)
        if cand.ndim != 2 or len(enc_queries) != cand.shape[0]:
            raise ValueError(
                "encryptedPreciseQuery/nearestCoarseVectorIndexes shape "
                "mismatch"
            )
        ntotal = self.engine.base.shape[0]
        if cand.min() < 0 or cand.max() >= ntotal:
            raise ValueError("vector index out of range")
        result = self.engine.encrypted_precise_search(
            enc_queries,
            cand,
            scheme=body.get("scheme", "bfv"),
            key_id=body.get("keyId"),
            galois_keys=body.get("galoisKeys"),
            resp_mod=body.get("respMod", "full"),
        )
        if isinstance(result, dict):
            # BFV truncated-response wire (c1 NTT-domain + c0 ip coeffs)
            return _json_resp(result)
        cts, norms = result
        return _json_resp({"encryptedScores": cts, "candidateNorms": norms})

    # net-new route: REAL single-server PIR (crypto/pir.py) — unlike
    # /precise-vector-pir (the reference's cleartext-index placeholder),
    # the request carries only selector ciphertexts.
    def _pir_fetch(self, body) -> Response:
        if "pirHypercubeMulti" in body:
            multi = body["pirHypercubeMulti"]
            if not isinstance(multi, list) or not multi:
                raise ValueError("pirHypercubeMulti must be a non-empty list")
            for entry in multi:
                if not isinstance(entry, dict) or "ct" not in entry \
                        or "nRows" not in entry:
                    raise ValueError(
                        "pirHypercubeMulti entries need 'ct' and 'nRows'"
                    )
            results = self.engine.pir_fetch(
                hypercube_multi=multi,
                key_id=body.get("keyId"),
                galois_keys=body.get("galoisKeys"),
            )
        elif "pirHypercube" in body:
            hyper = body["pirHypercube"]
            if not isinstance(hyper, list) or not hyper:
                raise ValueError("pirHypercube must be a non-empty list")
            results = self.engine.pir_fetch(
                hypercube=hyper,
                key_id=body.get("keyId"),
                galois_keys=body.get("galoisKeys"),
            )
        elif "pirPacked" in body:
            packed = body["pirPacked"]
            if not isinstance(packed, list) or not packed:
                raise ValueError("pirPacked must be a non-empty list")
            results = self.engine.pir_fetch(
                packed=packed,
                key_id=body.get("keyId"),
                galois_keys=body.get("galoisKeys"),
            )
        else:
            queries = body["pirQueries"]
            if not isinstance(queries, list) or not queries:
                raise ValueError("pirQueries must be a non-empty list")
            results = self.engine.pir_fetch(pir_queries=queries)
        return _json_resp({"pirResults": results})

    # reference: Query.cc:99-127
    def _precise_vector_pir(self, body) -> Response:
        ids = np.asarray(body["nearestPreciseVectorIndexes"], np.int64)
        vecs = self._fetch_vectors(ids)
        from prefhetch_tpu import native

        enc = native.json_encode_f32_nested(vecs)
        if enc is not None:
            return 200, JSON_CT, b'{"queryResults":' + enc + b"}"
        return _json_resp({"queryResults": vecs.tolist()})

    def _precise_vector_pir_bin(self, body: bytes) -> Response:
        kind, secs = wire_bin.decode(body)
        if kind != wire_bin.KIND_FETCH_REQ or len(secs) != 1:
            raise ValueError("bad fetch binary request")
        vecs = self._fetch_vectors(np.asarray(secs[0], np.int64))
        return _bin_resp(wire_bin.KIND_FETCH, [np.asarray(vecs, np.float32)])

    def _fetch_vectors(self, ids: np.ndarray) -> np.ndarray:
        if ids.ndim != 2:
            raise ValueError("nearestPreciseVectorIndexes must be 2-D")
        ntotal = self.engine.base.shape[0]
        if ids.min() < 0 or ids.max() >= ntotal:
            raise ValueError("vector index out of range")
        return self.engine.precise_vector_pir(ids)
