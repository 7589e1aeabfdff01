"""Profile headline-scan formulations on the real chip.

The r04 warm run's stage breakdown (scan 5.23 / topk 3.96 / tail 3.91 ms
at [256 q, ~2.6K union tiles, T=128]) puts the fused Pallas scan at ~33
GB/s effective — 4% of v5e HBM. The per-grid-step overhead (~2 µs x ~2.6K
single-tile steps) is the suspect, not the HBM traffic. Candidates:

  A. current: pallas_union_scan_min (1 union tile per grid step)
  B. pre-gather payload[union] with XLA, then a blocked Pallas kernel
     (BU consecutive tiles per step - the index map becomes trivial)
  C. pure XLA: gather + one dense bf16 matmul + masked min reshape
     (no Pallas; XLA fuses the epilogue)

Also times top-k variants at the post-prune width (segmented level-1 is
a no-op when seg <= k: kk = min(k, seg) = seg) and the tail split.

Run: python benchmarks/profile_scan_variants.py [--quick]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import prefhetch_tpu  # noqa: F401  (THP + compilation cache config)
import jax
import jax.numpy as jnp


def _sync(out):
    """Force REAL completion: device_get a tiny slice of the last output.

    block_until_ready through this sandbox's relay can return before
    execution (measured: 20 chained 8K matmuls 'complete' in 0.04 ms).
    TPU executes programs in dispatch order, so materializing any part of
    the final output on the host proves every prior dispatch finished."""
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(jax.device_get(leaf[tuple(slice(0, 1) for _ in leaf.shape)]))


def bench(fn, n=50):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from prefhetch_tpu.ops.pallas_scan import pallas_union_scan_min
    from prefhetch_tpu.ops.topk import (
        topk_select, topk_select_segmented,
    )
    from prefhetch_tpu.ops.union_scan import union_scan_pruned_fused

    rng = np.random.default_rng(0)
    T, D, NQ, J = 128, 128, 256, 24
    NT = 8448          # ~1M/128 with per-list padding
    U = 2560           # measured serving/bench union size at nprobe=16
    MT = 136           # tiles per query (max_t)
    K_WIDE = 256       # COARSE_PROBE

    payload = jnp.asarray(rng.normal(size=(NT + 1, T, D)), jnp.bfloat16)
    norms = jnp.asarray(rng.normal(size=(NT + 1, T)) ** 2, jnp.float32)
    sizes = jnp.full((NT + 1,), T, jnp.int32)
    q = jnp.asarray(rng.normal(size=(NQ, D)), jnp.float32)
    union = jnp.asarray(
        np.sort(rng.choice(NT, size=U, replace=False)), jnp.int32
    )
    pos = jnp.asarray(rng.integers(0, U, size=(NQ, MT)), jnp.int32)

    # --- A: current fused kernel ---------------------------------------
    tA = bench(lambda: pallas_union_scan_min(payload, norms, sizes, q, union))
    print(f"A pallas_union_scan_min       {tA:7.2f} ms", flush=True)

    # --- C: pure XLA gather + matmul + min ------------------------------
    @jax.jit
    def xla_scan(payload, norms, sizes, q, union):
        slab = payload[union]                       # [U, T, d] bf16
        n = norms[union]                            # [U, T]
        sz = sizes[union]
        qc = q.astype(jnp.bfloat16)
        cross = jax.lax.dot_general(
            qc, slab.reshape(U * T, D),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # [nq, U*T] f32
        qsq = jnp.sum(q * q, axis=-1)
        d2 = qsq[:, None] + n.reshape(1, U * T) - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        lane = jnp.arange(T, dtype=jnp.int32)
        valid = (lane[None, :] < sz[:, None]).reshape(1, U * T)
        d2 = jnp.where(valid, d2, jnp.float32(3.4e38)).astype(jnp.bfloat16)
        dmin = d2.reshape(NQ, U, T).min(axis=2)     # [nq, U]
        return d2, dmin

    tC = bench(lambda: xla_scan(payload, norms, sizes, q, union))
    print(f"C xla gather+matmul+min       {tC:7.2f} ms", flush=True)

    # --- full pruned fused (current production step 1) -------------------
    tF = bench(lambda: union_scan_pruned_fused(
        payload, norms, sizes, q, union, pos, J))
    print(f"F union_scan_pruned_fused     {tF:7.2f} ms", flush=True)

    # --- P: pruned XLA oracle (same contract as F, no Pallas) ------------
    from prefhetch_tpu.ops.union_scan import union_scan_pruned

    tP = bench(lambda: union_scan_pruned(
        payload, norms, sizes, q, union, pos, J))
    print(f"P union_scan_pruned (XLA)     {tP:7.2f} ms", flush=True)

    # --- P2: query-major + bf16 write, no transpose ----------------------
    from prefhetch_tpu.ops.union_scan import union_scan_pruned_qm

    tP2 = bench(lambda: union_scan_pruned_qm(
        payload, norms, sizes, q, union, pos, J))
    print(f"P2 union_scan_pruned_qm       {tP2:7.2f} ms", flush=True)

    # --- top-k variants at the post-prune width -------------------------
    dist = jnp.asarray(
        rng.normal(size=(NQ, J * T)) ** 2, jnp.float32
    )
    tseg = bench(lambda: topk_select_segmented(
        dist, K_WIDE, J, level1_bf16=True))
    print(f"topk segmented J={J}           {tseg:7.2f} ms", flush=True)
    tbare = bench(lambda: topk_select(dist, K_WIDE))
    print(f"topk bare [256,{J * T}]        {tbare:7.2f} ms", flush=True)
    distb = dist.astype(jnp.bfloat16)
    tbareb = bench(lambda: topk_select(distb, K_WIDE))
    print(f"topk bare bf16                {tbareb:7.2f} ms", flush=True)

    # --- tail split ------------------------------------------------------
    from prefhetch_tpu.ops.rerank import exact_rerank

    base = jnp.asarray(rng.normal(size=(1_000_000, D)), jnp.float32)
    cand = jnp.asarray(
        rng.integers(0, 1_000_000, size=(NQ, K_WIDE)), jnp.int32
    )

    trr = bench(lambda: exact_rerank(base, q, cand))
    print(f"tail exact_rerank only        {trr:7.2f} ms", flush=True)

    pd = exact_rerank(base, q, cand)

    @jax.jit
    def final_topk_only(pd, cand):
        neg, order = jax.lax.top_k(-pd, 100)
        return -neg, jnp.take_along_axis(cand, order, axis=1)

    tft = bench(lambda: final_topk_only(pd, cand))
    print(f"tail final top-100 of 256     {tft:7.2f} ms", flush=True)

    @jax.jit
    def rerank_fused_topk(base, q, cand):
        pd = exact_rerank(base, q, cand)
        neg, order = jax.lax.top_k(-pd, 100)
        return -neg, jnp.take_along_axis(cand, order, axis=1)

    trf = bench(lambda: rerank_fused_topk(base, q, cand))
    print(f"tail rerank+topk one program  {trf:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
