"""Native epoll frontend: per-BATCH Python serving loop.

The C++ side (native/pfh_http.cpp — the production counterpart of the
reference's Drogon event loop, src/server/server_lib.cpp:48-53) owns every
socket: accept, HTTP/1.1 keep-alive parsing, response writes, and the
cross-request batching window (poll blocks for the first request, then
drains arrivals until `grace_us` of silence). Python wakes up once per
BATCH, so its per-request cost — the measured bottleneck of the asyncio
frontend on this one-core host (~5 ms/request through parse → executor →
dispatcher → batcher future) — is amortized across the whole wave:

    poll() → group by (route, kind, shape) → ONE engine call per group
           → encode + respond each

Hot binary routes (/coarsesearch kinds 4/9, /precisesearch kind 5,
/search kind 11) are batched here; every other route falls through to the
shared Dispatcher (serve/handlers.py) per-request, which stays the
semantic authority for the reference-parity JSON wire.
"""

from __future__ import annotations

import ctypes
import logging
import threading
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from prefhetch_tpu import native
from prefhetch_tpu.serve.handlers import BIN_CT, Dispatcher
from prefhetch_tpu.utils import wire_bin

logger = logging.getLogger("prefhetch.serve")

_CT_JSON = 0
_CT_BIN = 1


def _ct_code(ctype_str: str) -> int:
    return _CT_BIN if ctype_str.startswith(BIN_CT) else _CT_JSON


class _Req:
    __slots__ = (
        "req_id", "method", "path", "flags", "body", "kind", "secs", "rows",
    )

    def __init__(self, desc) -> None:
        self.req_id = desc.req_id
        self.method = desc.method.decode("ascii", "replace")
        self.path = desc.path.decode("ascii", "replace")
        self.flags = desc.flags
        if desc.body_len:
            # view into the C++-owned buffer (alive until respond): the
            # decode below makes zero-copy numpy views of the sections
            self.body = np.ctypeslib.as_array(
                desc.body, shape=(desc.body_len,)
            )
        else:
            self.body = np.empty(0, np.uint8)
        self.kind = -1
        self.secs: Optional[List[np.ndarray]] = None
        # query rows this request contributes to a wave (multi-row binary
        # requests — the reference protocol is batch-of-NQUERY per request,
        # client_lib.cpp:83-208 — count by ROWS so the wave cap matches the
        # engine's pinned row axis)
        self.rows = 1

    def decode_bin(self) -> bool:
        """Zero-copy binary decode (wire_bin views into the C++ buffer);
        sets kind/secs/rows. False = malformed."""
        try:
            self.kind, self.secs = wire_bin.decode(self.body)
        except ValueError:
            return False
        if self.secs and getattr(self.secs[0], "ndim", 0) >= 1:
            self.rows = max(1, int(self.secs[0].shape[0]))
        return True


class NativeHTTPServer:
    """Serving loop over the native epoll frontend."""

    def __init__(
        self,
        engine,
        port: int = 8080,
        max_batch: int = 64,
        grace_ms: float = 1.5,
        poll_ms: float = 200.0,
        n_resolvers: int = 2,
    ) -> None:
        lib = native.get_http_lib()
        if lib is None:
            raise RuntimeError("native http frontend unavailable (no g++?)")
        # relay d2h/h2d transfers acquire the GIL in many short chunks; at
        # the default 5 ms switch interval each chunk can wait a full slice
        # behind the other serving thread and a ~35 ms resolve stretches to
        # seconds (measured: a d2h loop made ZERO progress in 3 s beside a
        # busy thread; 0.2 ms -> full speed). Process-global, deliberately:
        # a serving process exists to serve.
        import sys as _sys

        _sys.setswitchinterval(0.0002)
        self._lib = lib
        self._h = lib.pfh_http_start(port, 256)
        if not self._h:
            raise OSError(f"pfh_http: cannot bind port {port}")
        self.port = int(lib.pfh_http_port(self._h))
        self.engine = engine
        # pin every service's row axis to max_batch: one compiled XLA
        # program per service regardless of wave composition (remote
        # compiles here cost minutes — engine.rows_pin docstring)
        if hasattr(engine, "rows_pin"):
            engine.rows_pin = max_batch
        self.dispatcher = Dispatcher(engine)
        self._max_batch = max_batch
        self._grace_us = int(grace_ms * 1e3)
        self._poll_us = int(poll_ms * 1e3)
        self._descs = (native.ReqDesc * max_batch)()
        self._stop = threading.Event()
        self.batches = 0
        self.batched_rows = 0
        # per-phase accumulators (seconds) — /stats surfaces them; the
        # serving-gap work is driven by these numbers
        self.timing = {
            "waves": 0, "reqs": 0, "decode_s": 0.0, "dispatch_s": 0.0,
            "resolve_s": 0.0, "encode_s": 0.0, "slow_s": 0.0,
            "wave_sizes": [],
            # cadence diagnostics: where a wave's wall time goes
            "poll_s": 0.0,       # dispatch thread blocked in C++ poll
            "queue_s": 0.0,      # dispatched wave waiting for a resolver
            "cut_full": 0, "cut_idle": 0,   # wave cut reasons
        }
        # wave pipeline: the dispatch thread queues device work (async jax
        # dispatch — never blocks on the relay) and hands a resolver to the
        # completion thread, which eats the ~28 ms relay sync while the
        # NEXT wave is already being decoded/dispatched. Bounded depth =
        # backpressure when the device falls behind.
        import queue as _queue

        # SEVERAL resolver threads (r04): the ~30 ms relay d2h per wave is
        # LATENCY, not bandwidth — a lone completion thread serialized it
        # (r03: resolve_s 8.84 of ~10.5 s busy) while concurrent
        # device_gets through the relay overlap almost fully. n_resolvers
        # waves resolve concurrently; the queue depth bounds how far the
        # dispatch thread races ahead (backpressure when the device or the
        # relay falls behind: put() blocks, arrivals pile up in the C++
        # ready queue, and the NEXT poll drains them as one big wave —
        # fragmented small waves each pay the full relay roundtrip, so
        # wave size stays the other throughput lever).
        self._n_resolvers = max(1, int(n_resolvers))
        self._cq: "_queue.Queue" = _queue.Queue(maxsize=self._n_resolvers)
        # waves in flight past dispatch (queued or resolving): the adaptive
        # batching policy flushes pending requests only when every resolver
        # could take work (pipeline near-idle) or the wave is full —
        # otherwise arrivals keep accumulating while the resolvers work
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        self._cthreads = [
            threading.Thread(
                target=self._completion_loop,
                name=f"pfh-native-complete-{i}", daemon=True,
            )
            for i in range(self._n_resolvers)
        ]
        for t in self._cthreads:
            t.start()
        # slow-path pool: non-wave routes (JSON protocol, /encryptedsearch,
        # /pir-fetch) used to run INLINE on the dispatch thread — one
        # encrypted request (~100 ms of device work) stalled every hot
        # wave behind it. Two workers keep heavy routes off the dispatch
        # loop and let consecutive encrypted batches pipeline.
        from concurrent.futures import ThreadPoolExecutor

        self._slow_pool = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="pfh-native-slow"
        )
        self._thread = threading.Thread(
            target=self._loop, name="pfh-native-serve", daemon=True
        )
        self._thread.start()

    # -- lifecycle -------------------------------------------------------
    def shutdown(self) -> None:
        if self._stop.is_set():
            return
        self._stop.set()
        self._thread.join(timeout=5.0)
        # the dispatch thread is done: every queued job precedes the
        # sentinels, so joining the completion threads drains all responses
        for _ in self._cthreads:
            self._cq.put(None)
        for t in self._cthreads:
            t.join(timeout=30.0)
        self._slow_pool.shutdown(wait=True)
        self._lib.pfh_http_stop(self._h)
        self._h = None

    # -- serving loop ----------------------------------------------------
    def _loop(self) -> None:
        """Adaptive-wave dispatch loop.

        Naive fixed-grace batching fragments under a pipelined resolver:
        clients' next requests arrive a few ms apart, the short grace
        window cuts tiny waves, and every tiny wave pays the full ~30 ms
        relay d2h (measured: mean wave 13 of a possible 32, fused route
        at a third of its ceiling). Instead, arrivals ACCUMULATE while the
        pipeline is busy and a wave is cut only when (a) it is full, or
        (b) the pipeline is near-idle (≤1 wave past dispatch) and a short
        grace has passed with no new arrival — so wave N+1 is sized by
        everything that arrived during wave N's resolve."""
        from collections import deque

        lib, h = self._lib, self._h
        tm = self.timing
        pending: "deque[_Req]" = deque()
        pending_rows = 0
        while not self._stop.is_set():
            if pending_rows < self._max_batch:
                wait = self._grace_us if pending else self._poll_us
                t_poll = time.perf_counter()
                n = lib.pfh_http_poll(h, self._descs, self._max_batch,
                                      wait, 0)
                tm["poll_s"] += time.perf_counter() - t_poll
                got = n > 0
                for i in range(n):
                    r = _Req(self._descs[i])
                    # decode NOW (zero-copy views): the wave cap counts
                    # query ROWS, not requests — a multi-row request must
                    # not blow the engine's pinned row axis
                    if r.method == "POST" and (r.flags & 1):
                        if not r.decode_bin():
                            self._respond_error(r, 400, "bad binary request")
                            continue
                    pending.append(r)
                    pending_rows += r.rows
            else:
                got = False
            if not pending:
                continue
            if pending_rows < self._max_batch:
                if got:
                    continue        # still arriving — keep collecting
                with self._inflight_lock:
                    busy = self._inflight > self._n_resolvers
                if busy:
                    continue        # resolvers busy — let the wave grow
                tm["cut_idle"] += 1
            else:
                tm["cut_full"] += 1
            # cut a PREFIX whose rows fit the pinned batch; the remainder
            # opens the next wave (multi-row requests never split)
            reqs: List[_Req] = []
            rows_t = 0
            while pending and rows_t + pending[0].rows <= self._max_batch:
                r = pending.popleft()
                reqs.append(r)
                rows_t += r.rows
            if not reqs:        # one request wider than the wave cap
                reqs.append(pending.popleft())
            pending_rows -= sum(r.rows for r in reqs)
            t0 = time.perf_counter()
            try:
                self._serve_batch(reqs, t0)
            except Exception:   # noqa: BLE001 — the loop must survive
                logger.exception("native serve batch failed")
                for r in reqs:
                    self._respond_error(r, 500, "internal error")

    def _respond(self, req: _Req, status: int, ctype: int,
                 body: bytes) -> None:
        self._lib.pfh_http_respond(
            self._h, req.req_id, status, ctype, body, len(body)
        )

    def _respond_error(self, req: _Req, status: int, msg: str) -> None:
        try:
            self._respond(
                req, status, _CT_JSON,
                b'{"error": "' + msg.encode()[:200] + b'"}',
            )
        except Exception:   # noqa: BLE001
            pass

    # group keys: one engine call per (path, kind, shape signature)
    def _serve_batch(self, reqs: List[_Req], t0: float) -> None:
        tm = self.timing
        tm["waves"] += 1
        tm["reqs"] += len(reqs)
        if len(tm["wave_sizes"]) < 4096:
            # wave size in query ROWS (multi-row requests count fully)
            tm["wave_sizes"].append(sum(r.rows for r in reqs))
        groups: Dict[Tuple, List[_Req]] = {}
        slow: List[_Req] = []
        for r in reqs:
            key = None
            if r.secs is not None:      # binary-decoded at poll time
                try:
                    key = self._group_key(r)
                except (IndexError, ValueError):
                    key = None
            if key is None:
                slow.append(r)
            else:
                groups.setdefault(key, []).append(r)

        t_dec = time.perf_counter()
        tm["decode_s"] += t_dec - t0
        for key, members in groups.items():
            try:
                self._serve_group(key, members)
            except (ValueError, KeyError, IndexError, TypeError):
                # a poisoned batch (e.g. k > candidate count for ONE
                # request) must not 400 the whole wave: retry singly
                # through the dispatcher's full validation
                logger.warning(
                    "group %s (%d reqs) fell to the slow path",
                    key[0], len(members), exc_info=True,
                )
                for r in members:
                    slow.append(r)
            self.batches += 1
            self.batched_rows += sum(
                int(m.secs[0].shape[0]) for m in members if m.secs
            )
        t_grp = time.perf_counter()
        for r in slow:
            # copy the body OUT of the C++-owned buffer before leaving the
            # wave: the pool task may outlive this poll round
            self._slow_pool.submit(self._serve_slow, r, r.body.tobytes())

        t_end = time.perf_counter()
        tm["slow_s"] += t_end - t_grp
        self.dispatcher.stats.record(
            f"BATCH n={len(reqs)}", t_end - t0, True
        )

    @staticmethod
    def _group_key(r: _Req) -> Optional[Tuple]:
        s = r.secs
        if r.path == "/coarsesearch" and r.kind == wire_bin.KIND_COARSE_TOPK_REQ \
                and len(s) == 3 and s[0].ndim == 2 and s[1].ndim == 2:
            return ("ctopk", s[0].shape[1], s[1].shape[1],
                    int(np.asarray(s[2]).reshape(-1)[0]))
        if r.path == "/coarsesearch" and r.kind == wire_bin.KIND_COARSE_REQ \
                and len(s) == 2 and s[0].ndim == 2 and s[1].ndim == 2:
            return ("ctiled", s[0].shape[1], s[1].shape[1])
        if r.path == "/precisesearch" and r.kind == wire_bin.KIND_PRECISE_REQ \
                and len(s) == 2 and s[0].ndim == 2 and s[1].ndim == 2:
            return ("precise", s[0].shape[1], s[1].shape[1])
        if r.path == "/search" and r.kind == wire_bin.KIND_SEARCH_REQ \
                and len(s) == 3 and s[0].ndim == 2 and s[1].ndim == 2:
            return ("fused", s[0].shape[1], s[1].shape[1],
                    int(np.asarray(s[2]).reshape(-1)[0]))
        return None

    def _serve_group(self, key: Tuple, members: List[_Req]) -> None:
        """Dispatch a coalesced group and hand a resolver to the completion
        thread. The engine *_async calls only queue device work (jax's async
        dispatch) plus host prep — they never block on the ~28 ms relay
        roundtrip; the completion thread pays that while the NEXT wave is
        already being decoded and dispatched here."""
        tm = self.timing
        t0 = time.perf_counter()
        rows = [int(m.secs[0].shape[0]) for m in members]
        q = np.concatenate([m.secs[0] for m in members]).astype(
            np.float32, copy=False
        )
        second = np.concatenate([m.secs[1] for m in members]).astype(
            np.int64, copy=False
        )
        tm["concat_s"] = tm.get("concat_s", 0.0) + (time.perf_counter() - t0)
        route = key[0]
        if route in ("ctopk", "fused"):
            k = key[3]
            if not 0 < k <= 1 << 20:
                raise ValueError("bad k")
            if route == "ctopk":
                resolver = self.engine.coarse_search_topk_async(q, second, k)
            else:
                resolver = self.engine.search_fused_async(q, second, k)
        elif route == "ctiled":
            resolver = self.engine.coarse_search_tiled_async(q, second)
        elif route == "precise":
            resolver = self.engine.precise_search_async(q, second)
        else:   # pragma: no cover — _group_key and this must stay in sync
            raise ValueError(f"unknown group {route}")
        tm["dispatch_s"] += time.perf_counter() - t0
        with self._inflight_lock:
            self._inflight += 1
        # bounded queue = backpressure: if the device falls behind, the
        # dispatch thread stalls here instead of piling up device programs
        self._cq.put((route, members, rows, resolver, time.perf_counter()))

    # -- completion thread ----------------------------------------------
    def _completion_loop(self) -> None:
        # n_resolvers of these run concurrently: resolve_s sums THREAD
        # seconds (overlapped waves double-count wall time — it is a
        # diagnostic of relay pressure, not a wall-clock share)
        tm = self.timing
        while True:
            job = self._cq.get()
            if job is None:
                return
            route, members, rows, resolver, t_enq = job
            try:
                t0 = time.perf_counter()
                with self._inflight_lock:
                    tm["queue_s"] += t0 - t_enq
                try:
                    out = resolver()
                except Exception:   # noqa: BLE001 — the loop must survive
                    logger.exception("native resolve failed (%s)", route)
                    for m in members:
                        self._respond_error(m, 500, "internal error")
                    continue
                t1 = time.perf_counter()
                try:
                    self._encode_respond(route, members, rows, out)
                except Exception:   # noqa: BLE001
                    logger.exception("native encode failed (%s)", route)
                    for m in members:
                        self._respond_error(m, 500, "internal error")
                t2 = time.perf_counter()
                with self._inflight_lock:
                    tm["resolve_s"] += t1 - t0
                    tm["encode_s"] += t2 - t1
            finally:
                with self._inflight_lock:
                    self._inflight -= 1

    def _serve_slow(self, r: _Req, body: bytes) -> None:
        t0 = time.perf_counter()
        try:
            status, ctype, out = self.dispatcher.handle(
                r.method, r.path,
                {
                    "content-type": BIN_CT if (r.flags & 1) else "",
                    "accept": BIN_CT if (r.flags & 2) else "",
                },
                body,
            )
            self._respond(r, status, _ct_code(ctype), out)
        except Exception:   # noqa: BLE001
            self._respond_error(r, 500, "internal error")
        with self._inflight_lock:
            self.timing["slow_s"] += time.perf_counter() - t0

    def _respond_multi(self, members: List[_Req], buf: np.ndarray,
                       offsets: np.ndarray) -> None:
        """One FFI call + ONE eventfd wake for the whole group (the
        per-request respond path measured n ctypes transitions + n
        syscalls per wave)."""
        ids = np.array([m.req_id for m in members], np.uint64)
        sts = np.full(len(members), 200, np.int32)
        self._lib.pfh_http_respond_multi(
            self._h, len(members),
            ids.ctypes.data_as(ctypes.c_void_p),
            sts.ctypes.data_as(ctypes.c_void_p),
            _CT_BIN,
            buf.ctypes.data_as(ctypes.c_void_p),
            offsets.ctypes.data_as(ctypes.c_void_p),
        )

    def _encode_respond(self, route: str, members: List[_Req],
                        rows: List[int], out) -> None:
        if route == "ctopk":
            ids, dists, counts = out
            secs = [
                ids.astype(np.int32, copy=False),
                dists.astype(np.float32, copy=False),
                counts.astype(np.int64, copy=False),
            ]
            kind = wire_bin.KIND_COARSE_TOPK
        elif route == "ctiled":
            tile_idx, qdist, dmin, dstep, counts = out
            secs = [
                tile_idx.astype(np.int32, copy=False),
                qdist,
                dmin.astype(np.float32, copy=False),
                dstep.astype(np.float32, copy=False),
                counts.astype(np.int64, copy=False),
            ]
            kind = wire_bin.KIND_COARSE_TILED
        elif route == "precise":
            secs = [np.asarray(out, np.float32)]
            kind = wire_bin.KIND_PRECISE
        else:   # fused
            ids, dists = out
            secs = [
                ids.astype(np.int64, copy=False),
                dists.astype(np.float32, copy=False),
            ]
            kind = wire_bin.KIND_SEARCH
        buf, offsets = wire_bin.encode_rows(kind, secs, rows)
        self._respond_multi(members, buf, offsets)


def serve_forever_native(
    engine,
    host: str = "0.0.0.0",
    port: int = 8080,
    background: bool = False,
    max_batch: int = 64,
    grace_ms: float = 1.5,
    n_resolvers: int = 2,
    **_ignored,
):
    """Start the native frontend (binds INADDR_ANY; `host` accepted for
    signature parity with serve_forever_aio). Returns the server when
    `background`, else blocks until interrupted."""
    srv = NativeHTTPServer(
        engine, port=port, max_batch=max_batch, grace_ms=grace_ms,
        n_resolvers=n_resolvers,
    )
    logger.info("native epoll frontend listening on :%d", srv.port)
    if background:
        return srv
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.shutdown()
    return srv
