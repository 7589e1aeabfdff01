"""Cross-request batching scheduler.

BASELINE config 5 ("64-way batched serving"): concurrent HTTP requests are
coalesced into one device batch per service so the TPU always sees large
matmuls instead of per-request dribbles. The reference processes each
request independently on its Drogon handler thread (SURVEY.md §2.4 — no
batching anywhere); this scheduler is net-new capability.

Design: one worker thread per service. Callers enqueue (payload, Future);
the worker drains the queue up to ``max_batch`` query rows (waiting at most
``max_wait_ms`` for stragglers after the first arrival), concatenates along
the query axis, makes ONE engine call, and splits results back per caller.
Correctness is unconditional on batch composition — every engine service is
row-independent.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable, List, Tuple

import numpy as np


class _Service:
    def __init__(self, fn: Callable, split: Callable, max_batch: int,
                 max_wait_ms: float, grace_ms: float | None = None):
        self.fn = fn
        self.split = split
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        # arrival-silence early dispatch: once the queue has been empty for
        # `grace` seconds the wave is over — dispatch instead of sitting out
        # the rest of the window. Lockstep client waves (each client blocks
        # on its response, so a whole wave lands within ~1 ms) get batch
        # latency ≈ grace instead of ≈ max_wait; dribbling arrivals spaced
        # < grace apart still coalesce up to the full window. None = always
        # wait out the window (round-2 behavior).
        self.grace = None if grace_ms is None else grace_ms / 1e3
        self.q: "queue.Queue[Tuple[tuple, Future]]" = queue.Queue()
        self.batches_run = 0
        self.rows_run = 0
        t = threading.Thread(target=self._loop, daemon=True)
        t.start()

    def submit(self, *payload) -> Future:
        f: Future = Future()
        self.q.put((payload, f))
        return f

    def _loop(self):
        import time as _time

        carry = None
        while True:
            payload, fut = carry if carry is not None else self.q.get()
            carry = None
            batch = [(payload, fut)]
            rows = payload[0].shape[0]
            # full-window collect: keep draining until max_wait has elapsed
            # since the batch opened (or max_batch rows arrive). Draining
            # only-until-momentarily-empty dispatched ~5-row batches under
            # dribbling concurrent arrivals, paying a full device round trip
            # each; the window amortizes it across every in-flight client.
            t_open = _time.perf_counter()
            while rows < self.max_batch:
                remaining = self.max_wait - (_time.perf_counter() - t_open)
                if remaining <= 0:
                    break
                if self.grace is not None:
                    remaining = min(remaining, self.grace)
                try:
                    p2, f2 = self.q.get(timeout=remaining)
                except queue.Empty:
                    break
                # only coalesce shape-compatible payloads (same trailing
                # dims — e.g. same nprobe / coarse_probe); defer others
                if any(
                    a.shape[1:] != b.shape[1:] for a, b in zip(p2, payload)
                ):
                    carry = (p2, f2)
                    break
                batch.append((p2, f2))
                rows += p2[0].shape[0]
            args = tuple(
                np.concatenate([b[0][i] for b in batch], axis=0)
                for i in range(len(payload))
            )
            try:
                out = self.fn(*args)
            except Exception as e:  # propagate to every caller
                for _, f in batch:
                    f.set_exception(e)
                continue
            self.batches_run += 1
            self.rows_run += rows
            offset = 0
            for p, f in batch:
                n = p[0].shape[0]
                f.set_result(self.split(out, offset, n))
                offset += n


def _split_coarse(out, offset, n):
    scores, indexes, sizes = out
    start = int(sizes[:offset].sum())
    stop = start + int(sizes[offset : offset + n].sum())
    return scores[start:stop], indexes[start:stop], sizes[offset : offset + n]


def _split_rows(out, offset, n):
    return out[offset : offset + n]


def _split_row_tuple(out, offset, n):
    return tuple(a[offset : offset + n] for a in out)


class BatchScheduler:
    """Engine facade with cross-request batching. Exposes the same service
    signatures as QueryEngine, so the HTTP layer can use either."""

    def __init__(self, engine, max_batch: int = 64, max_wait_ms: float = 4.0,
                 grace_ms: float | None = None):
        self.engine = engine
        self.config = engine.config
        self._coarse = _Service(
            engine.coarse_search, _split_coarse, max_batch, max_wait_ms,
            grace_ms,
        )
        self._precise = _Service(
            engine.precise_search, _split_rows, max_batch, max_wait_ms,
            grace_ms,
        )
        self._fetch = _Service(
            engine.precise_vector_pir, _split_rows, max_batch, max_wait_ms,
            grace_ms,
        )
        self._coarse_tiled = (
            _Service(
                engine.coarse_search_tiled, _split_row_tuple, max_batch,
                max_wait_ms, grace_ms,
            )
            if hasattr(engine, "coarse_search_tiled")
            else None
        )
        # server-select coarse top-k: one service PER k value (k is part of
        # the engine-call identity — the shape-compat check only compares
        # array shapes, so mixing k values in one queue would mis-coalesce)
        self._coarse_topk: dict = {}
        self._search_svc: dict = {}
        self._coarse_topk_lock = threading.Lock()
        self._batch_args = (max_batch, max_wait_ms, grace_ms)

    # passthroughs -------------------------------------------------------
    @property
    def index(self):
        return self.engine.index

    @property
    def base(self):
        return self.engine.base

    def retrieve_centroids(self):
        return self.engine.retrieve_centroids()

    def tile_table(self):
        return self.engine.tile_table()

    def encrypted_precise_search(self, *a, **kw):
        return self.engine.encrypted_precise_search(*a, **kw)

    def pir_fetch(self, *a, **kw):
        return self.engine.pir_fetch(*a, **kw)

    # batched services ----------------------------------------------------
    def coarse_search(self, precise_query, nearest_centroid_idx):
        return self._coarse.submit(
            np.asarray(precise_query), np.asarray(nearest_centroid_idx)
        ).result()

    def coarse_search_tiled(self, precise_query, nearest_centroid_idx):
        if self._coarse_tiled is None:
            raise ValueError("engine does not support the tiled wire")
        return self._coarse_tiled.submit(
            np.asarray(precise_query), np.asarray(nearest_centroid_idx)
        ).result()

    def coarse_search_topk(self, precise_query, nearest_centroid_idx, k):
        k = int(k)
        svc = self._coarse_topk.get(k)
        if svc is None:
            with self._coarse_topk_lock:
                svc = self._coarse_topk.get(k)
                if svc is None:
                    mb, mw, gr = self._batch_args
                    svc = _Service(
                        lambda q, p, _k=k: self.engine.coarse_search_topk(
                            q, p, _k
                        ),
                        _split_row_tuple, mb, mw, gr,
                    )
                    self._coarse_topk[k] = svc
        return svc.submit(
            np.asarray(precise_query), np.asarray(nearest_centroid_idx)
        ).result()

    def search_fused(self, precise_query, nearest_centroid_idx, k):
        k = int(k)
        svc = self._search_svc.get(k)
        if svc is None:
            with self._coarse_topk_lock:
                svc = self._search_svc.get(k)
                if svc is None:
                    mb, mw, gr = self._batch_args
                    svc = _Service(
                        lambda q, p, _k=k: self.engine.search_fused(
                            q, p, _k
                        ),
                        _split_row_tuple, mb, mw, gr,
                    )
                    self._search_svc[k] = svc
        return svc.submit(
            np.asarray(precise_query), np.asarray(nearest_centroid_idx)
        ).result()

    def precise_search(self, precise_query, nearest_coarse_vector_idx):
        return self._precise.submit(
            np.asarray(precise_query), np.asarray(nearest_coarse_vector_idx)
        ).result()

    def precise_vector_pir(self, ids):
        return self._fetch.submit(np.asarray(ids)).result()

    def stats(self) -> dict:
        return {
            name: {"batches": s.batches_run, "rows": s.rows_run}
            for name, s in [
                ("coarse", self._coarse),
                ("coarse_tiled", self._coarse_tiled),
                ("precise", self._precise),
                ("fetch", self._fetch),
            ]
            if s is not None
        }
