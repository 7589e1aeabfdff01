"""HTTP frontend — the reference's Drogon controller layer rebuilt.

Exposes the exact four routes and JSON field names of the reference wire
protocol (reference: src/server/controllers/Query.h:14-31, Query.cc:10-127;
SURVEY.md §2.2):

| route                 | method | request fields                                  | response fields |
|-----------------------|--------|------------------------------------------------|-----------------|
| /query                | GET    | —                                              | bare [nlist][d] float array |
| /coarsesearch         | POST   | preciseQuery, nearestCentroidIndexes            | coarseDistanceScores, coarseVectorIndexes, listSizesPerQuery |
| /precisesearch        | POST   | preciseQuery, nearestCoarseVectorIndexes        | preciseDistanceScores |
| /precise-vector-pir   | POST   | nearestPreciseVectorIndexes                     | queryResults |

Implementation: stdlib ThreadingHTTPServer (the TPU compute underneath is
serialized per-service by jit anyway; a C++ epoll frontend is the planned
native fast path). Unlike the reference — which parses request bodies
unconditionally and never returns HTTP errors — malformed requests get 400s.
"""

from __future__ import annotations

import collections
import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from prefhetch_tpu.engine.server import QueryEngine

logger = logging.getLogger("prefhetch.serve")


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


class _Handler(BaseHTTPRequestHandler):
    engine: QueryEngine = None  # injected by make_server
    stats: ServerStats = None
    protocol_version = "HTTP/1.1"

    # quiet default request logging
    def log_message(self, fmt, *args):  # noqa: N802
        logger.debug(fmt, *args)

    def _send_json(self, obj, status: int = 200) -> None:
        self._send_raw(json.dumps(obj).encode(), status)

    def _send_raw(self, body: bytes, status: int = 200) -> None:
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _read_json(self):
        length = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(length))

    def do_GET(self):  # noqa: N802
        t0 = time.perf_counter()
        ok = True
        try:
            if self.path == "/query" or self.path.rstrip("/") == "":
                # GET /query → bare centroid array (reference: Query.cc:17-23)
                centroids = self.engine.retrieve_centroids()
                from prefhetch_tpu import native

                enc = native.json_encode_f32_nested(np.asarray(centroids))
                if enc is not None:
                    self._send_raw(enc)
                else:
                    self._send_json(centroids.tolist())
            elif self.path == "/codebooks":
                # net-new: public PQ index metadata so encrypted-mode
                # clients can send a QUANTIZED coarse query instead of the
                # full-precision plaintext one (the reserved
                # compute_encrypted_coarse_query slot, reference:
                # include/client/client_lib.h:28-36)
                idx = self.engine.index
                if idx.codebooks is None:
                    self._send_json({"codebooks": None})
                else:
                    self._send_json({
                        "codebooks": np.asarray(idx.codebooks).tolist(),
                        "byResidual": bool(idx.params.by_residual),
                    })
            elif self.path == "/healthz":
                self._send_json(
                    {"status": "ok", "ntotal": self.engine.index.ntotal}
                )
            elif self.path == "/stats":
                snap = self.stats.snapshot()
                if hasattr(self.engine, "stats"):   # batching mode
                    snap["batcher"] = self.engine.stats()
                self._send_json(snap)
            else:
                ok = False
                self._send_json({"error": "not found"}, 404)
        finally:
            self.stats.record(f"GET {self.path}", time.perf_counter() - t0, ok)

    def do_POST(self):  # noqa: N802
        t0 = time.perf_counter()
        ok = True
        try:
            body = self._read_json()
        except (ValueError, KeyError) as e:
            self._send_json({"error": f"bad json: {e}"}, 400)
            self.stats.record(f"POST {self.path}", time.perf_counter() - t0, False)
            return
        try:
            if self.path == "/coarsesearch":
                self._coarse_search(body)
            elif self.path == "/precisesearch":
                self._precise_search(body)
            elif self.path == "/encryptedsearch":
                self._encrypted_search(body)
            elif self.path == "/precise-vector-pir":
                self._precise_vector_pir(body)
            elif self.path == "/pir-fetch":
                self._pir_fetch(body)
            else:
                ok = False
                self._send_json({"error": "not found"}, 404)
        except (KeyError, TypeError, ValueError, IndexError) as e:
            ok = False
            self._send_json({"error": str(e)}, 400)
        finally:
            self.stats.record(f"POST {self.path}", time.perf_counter() - t0, ok)

    # reference: Query.cc:29-63
    def _coarse_search(self, body):
        probes = np.asarray(body["nearestCentroidIndexes"], np.int64)
        if "coarseQueryCodes" in body:
            # encrypted-mode quantized coarse query: the client sends PQ
            # codes of (q − centroid[probe₀]) instead of the full-precision
            # query — the reserved compute_encrypted_coarse_query
            # realization (reference: include/client/client_lib.h:28-36,
            # "Sending precise query temporarily"). The server reconstructs
            # q̂ and triages with it; the exact re-rank runs encrypted.
            codes = np.asarray(body["coarseQueryCodes"], np.int64)
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
            q = q.astype(np.float32)
        else:
            q = np.asarray(body["preciseQuery"], np.float32)
        if q.ndim != 2 or probes.ndim != 2 or q.shape[0] != probes.shape[0]:
            raise ValueError("preciseQuery/nearestCentroidIndexes shape mismatch")
        nlist = self.engine.index.nlist
        if probes.min() < 0 or probes.max() >= nlist:
            raise ValueError("centroid index out of range")
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
            self._send_raw(
                b'{"coarseDistanceScores":' + enc_s
                + b',"coarseVectorIndexes":' + enc_i
                + b',"listSizesPerQuery":' + enc_z + b"}"
            )
        else:
            self._send_json(
                {
                    "coarseDistanceScores": scores.tolist(),
                    "coarseVectorIndexes": indexes.tolist(),
                    "listSizesPerQuery": sizes.tolist(),
                }
            )

    # reference: Query.cc:65-97
    def _precise_search(self, body):
        q = np.asarray(body["preciseQuery"], np.float32)
        cand = np.asarray(body["nearestCoarseVectorIndexes"], np.int64)
        if q.ndim != 2 or cand.ndim != 2 or q.shape[0] != cand.shape[0]:
            raise ValueError("preciseQuery/nearestCoarseVectorIndexes shape mismatch")
        ntotal = self.engine.base.shape[0]
        if cand.min() < 0 or cand.max() >= ntotal:
            raise ValueError("vector index out of range")
        scores = self.engine.precise_search(q, cand)
        from prefhetch_tpu import native

        enc = native.json_encode_f32_nested(scores)
        if enc is not None:
            self._send_raw(b'{"preciseDistanceScores":' + enc + b"}")
        else:
            self._send_json({"preciseDistanceScores": scores.tolist()})

    # net-new route: the encrypted re-rank the reference reserved for SEAL
    # (include/client/client_lib.h:28-36). The query never leaves the client
    # in plaintext on this path.
    def _encrypted_search(self, body):
        enc_queries = body["encryptedPreciseQuery"]       # [nq] ct wires
        cand = np.asarray(body["nearestCoarseVectorIndexes"], np.int64)
        if cand.ndim != 2 or len(enc_queries) != cand.shape[0]:
            raise ValueError(
                "encryptedPreciseQuery/nearestCoarseVectorIndexes shape mismatch"
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
        )
        if isinstance(result, dict):
            # BFV truncated-response wire (c1 NTT-domain + c0 ip coeffs)
            self._send_json(result)
        else:
            cts, norms = result
            self._send_json(
                {"encryptedScores": cts, "candidateNorms": norms}
            )

    # net-new route: REAL single-server PIR (crypto/pir.py) — unlike
    # /precise-vector-pir (the reference's cleartext-index placeholder), the
    # request carries only selector ciphertexts.
    def _pir_fetch(self, body):
        if "pirHypercube" in body:
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
        self._send_json({"pirResults": results})

    # reference: Query.cc:99-127
    def _precise_vector_pir(self, body):
        ids = np.asarray(body["nearestPreciseVectorIndexes"], np.int64)
        if ids.ndim != 2:
            raise ValueError("nearestPreciseVectorIndexes must be 2-D")
        ntotal = self.engine.base.shape[0]
        if ids.min() < 0 or ids.max() >= ntotal:
            raise ValueError("vector index out of range")
        vecs = self.engine.precise_vector_pir(ids)
        from prefhetch_tpu import native

        enc = native.json_encode_f32_nested(vecs)
        if enc is not None:
            self._send_raw(b'{"queryResults":' + enc + b"}")
        else:
            self._send_json({"queryResults": vecs.tolist()})


def make_server(
    engine: QueryEngine,
    host: str = "0.0.0.0",
    port: int = 8080,
    batching: bool = False,
    max_batch: int = 64,
    max_wait_ms: float = 8.0,
) -> ThreadingHTTPServer:
    """batching=True interposes the cross-request BatchScheduler
    (serve/batcher.py) so concurrent requests share device batches.
    max_wait_ms is the coalescing window: requests arriving within it join
    the same device batch (raise it for throughput under heavy concurrency,
    lower it for isolated-request latency)."""
    if batching:
        from prefhetch_tpu.serve.batcher import BatchScheduler

        engine = BatchScheduler(
            engine, max_batch=max_batch, max_wait_ms=max_wait_ms
        )
    handler = type(
        "BoundHandler", (_Handler,), {"engine": engine, "stats": ServerStats()}
    )
    srv = ThreadingHTTPServer((host, port), handler, bind_and_activate=False)
    # stdlib default listen backlog is 5 — bursts of concurrent clients get
    # connection resets under batched serving; raise it
    srv.request_queue_size = 128
    srv.server_bind()
    srv.server_activate()
    return srv


def serve_forever(
    engine: QueryEngine,
    host: str = "0.0.0.0",
    port: int = 8080,
    background: bool = False,
    batching: bool = False,
    max_wait_ms: float = 8.0,
) -> Optional[ThreadingHTTPServer]:
    """Run the web server (reference: Server::run_webserver,
    src/server/server_lib.cpp:48-53). background=True returns the server
    with a daemon thread (for tests)."""
    srv = make_server(engine, host, port, batching=batching,
                      max_wait_ms=max_wait_ms)
    logger.info("Server listening on %s:%d", host, port)
    if background:
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        return srv
    srv.serve_forever()
    return None
