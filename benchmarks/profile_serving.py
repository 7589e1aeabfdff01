"""Serving-stack profile on the real chip: where does a wave's time go?

Mirrors bench.http_serving_bench but dumps the native server's per-phase
accumulators (decode / engine / encode / slow) and wave-size histogram,
plus direct engine-call timings — so serving-gap work is aimed at the
measured bottleneck, not a guess. Not part of the graded bench.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

if __name__ == "__main__":
    data = bench.get_dataset()
    index = bench.get_index(data)
    from prefhetch_tpu.engine.server import QueryEngine
    from prefhetch_tpu.serve.native_server import NativeHTTPServer
    from prefhetch_tpu.utils.config import (
        IndexParams, PipelineConfig, ProtocolParams,
    )

    cfg = PipelineConfig(
        index=IndexParams(d=bench.D, nlist=bench.NLIST, pq_m=bench.PQ_M,
                          pq_nbits=8),
        protocol=ProtocolParams(nprobe=bench.NPROBE,
                                coarse_probe=bench.COARSE_PROBE,
                                k=bench.K, nquery=1),
        nbase=bench.NBASE,
    )
    engine = QueryEngine(cfg)
    engine.set_index(index, data["base"])
    srv = NativeHTTPServer(engine, port=0, max_batch=64, grace_ms=1.5)
    addr = f"http://127.0.0.1:{srv.port}/"

    n_clients = int(os.environ.get("PFH_PROF_CLIENTS", 32))
    n_reqs = int(os.environ.get("PFH_PROF_REQS", 30))
    centroids = np.asarray(index.centroids)
    queries = data["query"][:n_clients].astype(np.float32)
    d2w = ((queries[:, None, :] - centroids[None]) ** 2).sum(-1)
    probes_by_client = np.argsort(d2w, axis=1)[:, :bench.NPROBE]

    # warm every service (one pinned program each)
    wq = queries[:1]
    wp = probes_by_client[:1].astype(np.int64)
    t0 = time.perf_counter()
    engine.coarse_search_topk(wq, wp, bench.COARSE_PROBE)
    print(f"warm ctopk: {time.perf_counter() - t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    engine.coarse_search_tiled(wq, wp)
    print(f"warm ctiled: {time.perf_counter() - t0:.2f}s", flush=True)
    wcand = np.arange(bench.COARSE_PROBE, dtype=np.int64)[None]
    engine.precise_search(wq, wcand)
    engine.search_fused(wq, wp, bench.K)

    # direct engine-call timing at typical wave sizes
    for nb in (1, 32, 64):
        qb = np.tile(wq, (nb, 1))
        pb = np.tile(wp, (nb, 1))
        t0 = time.perf_counter()
        for _ in range(5):
            engine.coarse_search_topk(qb, pb, bench.COARSE_PROBE)
        dt = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        cb = np.tile(wcand, (nb, 1))
        for _ in range(5):
            engine.precise_search(qb, cb)
        dt2 = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        for _ in range(5):
            engine.search_fused(qb, pb, bench.K)
        dt3 = (time.perf_counter() - t0) / 5
        print(f"engine nb={nb:3d}: ctopk {dt*1e3:7.2f} ms  "
              f"precise {dt2*1e3:7.2f} ms  fused {dt3*1e3:7.2f} ms",
              flush=True)

    with tempfile.TemporaryDirectory() as td:
        script = os.path.join(td, "client_worker.py")
        with open(script, "w") as f:
            f.write(bench._HTTP_CLIENT_WORKER_SRC)
        np.save(os.path.join(td, "queries.npy"), queries)
        np.save(os.path.join(td, "probes.npy"), probes_by_client)
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, script, addr, td, str(n_clients),
             str(n_reqs), str(bench.COARSE_PROBE)],
            capture_output=True, timeout=600,
        )
        wall = time.perf_counter() - t0
    if proc.returncode != 0:
        print("worker failed:", proc.stderr[-800:].decode())
        srv.shutdown()
        sys.exit(1)
    lines = proc.stdout.decode().strip().split("\n")
    for name, ln in zip(("topk2round", "allcand", "fused1round"), lines):
        vals = ln.split()
        w = float(vals[1]) - float(vals[0])
        lats = sorted(float(x) for x in vals[2:])
        qps = len(lats) / w
        print(f"{name:12s}: {qps:8.1f} q/s   p50 "
              f"{lats[len(lats)//2]*1e3:7.1f} ms  n={len(lats)}",
              flush=True)

    tm = srv.timing
    waves = max(tm["waves"], 1)
    print(f"\nserver: {tm['waves']} waves, {tm['reqs']} reqs, "
          f"mean wave {tm['reqs']/waves:.1f}")
    for k in ("decode_s", "dispatch_s", "resolve_s", "encode_s", "slow_s"):
        print(f"  {k:9s}: total {tm[k]:7.3f}s  "
              f"per-wave {tm[k]/waves*1e3:7.2f} ms")
    ws = tm["wave_sizes"]
    if ws:
        import collections
        hist = collections.Counter(ws)
        print("  wave sizes:", dict(sorted(hist.items())))
    srv.shutdown()
