"""Stage-level profile of the triage pipeline on the real chip.

Times each device program of the bench pipeline separately (sustained
loops — one-shot timings lie through the relay) so optimization effort
lands on the true bottleneck. Not part of the graded bench.

Usage: python benchmarks/profile_stages.py  (env: PFH_BENCH_* as bench.py)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def timeit(fn, n=30):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    data = bench.get_dataset()
    index = bench.get_index(data)
    base_j = jnp.asarray(data["base"], jnp.float32)
    dev_batch = int(os.environ.get("PFH_BENCH_BATCH", 256))
    pool = data["query"].astype(np.float32)
    reps = -(-dev_batch // len(pool))
    q_j = jnp.asarray(np.tile(pool, (reps, 1))[:dev_batch])

    from prefhetch_tpu.index.tiling import build_tiled_view
    from prefhetch_tpu.ops.distances import rank_centroids
    from prefhetch_tpu.ops.topk import topk_select_segmented
    from prefhetch_tpu.ops.union_scan import (
        union_probe_tiles,
        union_scan_distances,
        union_scan_pruned,
    )

    tile = int(os.environ.get("PFH_BENCH_TILE", 1024))
    view = build_tiled_view(index, tile=tile)
    T = view.tile
    _, probes = rank_centroids(q_j, index.centroids, bench.NPROBE)
    probes = np.asarray(probes)
    tiles_np, _ = view.expand_probes(probes)
    tiles_j = jnp.asarray(tiles_np)
    max_t = tiles_np.shape[1]
    union_np, pos_np = union_probe_tiles(tiles_np, view.empty_tile)
    union_j, pos_j = jnp.asarray(union_np), jnp.asarray(pos_np)
    print(f"batch={dev_batch} T={T} max_t={max_t} |U|={len(union_np)} "
          f"payload={view.payload.dtype}", flush=True)

    args = (view.payload, view.norms, view.sizes, q_j, union_j, pos_j)

    ms = timeit(lambda: union_scan_distances(*args))
    print(f"scan (unpruned)           : {ms:8.2f} ms", flush=True)

    dist_full = union_scan_distances(*args)
    ms = timeit(lambda: topk_select_segmented(
        dist_full, bench.COARSE_PROBE, max_t, level1_bf16=True))
    print(f"topk seg max_t={max_t:3d}       : {ms:8.2f} ms", flush=True)

    for j in (8, 16, 24):
        ms = timeit(lambda: union_scan_pruned(*args, j))
        print(f"scan pruned j={j:<3d}         : {ms:8.2f} ms", flush=True)
        dist_p, sel = union_scan_pruned(*args, j)
        ms = timeit(lambda: topk_select_segmented(
            dist_p, bench.COARSE_PROBE, j, level1_bf16=True))
        print(f"topk seg j={j:<3d}            : {ms:8.2f} ms", flush=True)

    from prefhetch_tpu.ops.union_scan import union_scan_pruned_fused

    for j in (8, 16, 24):
        ms = timeit(lambda: union_scan_pruned_fused(*args, j))
        print(f"scan pruned FUSED j={j:<3d}   : {ms:8.2f} ms", flush=True)

    # tail: gather + exact rerank + final topk
    _, pos = topk_select_segmented(
        dist_full, bench.COARSE_PROBE, max_t, level1_bf16=True)

    @jax.jit
    def prog_tail(tile_ids, tiles, pos, base, q):
        from prefhetch_tpu.ops.topk import PAD_DISTANCE
        tile_sel = jnp.take_along_axis(tiles, pos // T, axis=1)
        cand = tile_ids[tile_sel, pos % T]
        pad = cand < 0
        safe = jnp.where(pad, 0, cand)
        vec = base[safe]
        pd = jnp.sum((vec - q[:, None, :]) ** 2, axis=-1)
        pd = jnp.where(pad, PAD_DISTANCE, pd)
        neg, order = jax.lax.top_k(-pd, bench.K)
        return -neg, jnp.take_along_axis(cand, order, axis=1)

    ms = timeit(lambda: prog_tail(view.ids, tiles_j, pos, base_j, q_j))
    print(f"tail (gather+rerank+topk) : {ms:8.2f} ms", flush=True)
