"""Union-tile batched scan vs the Pallas slab kernel: identical ragged
candidate distances (same PAD lanes, same ordering), tile dedupe logic."""

import numpy as np
import pytest

import jax.numpy as jnp

from prefhetch_tpu.data.synthetic import make_clustered_dataset
from prefhetch_tpu.index.build import build_ivf_index
from prefhetch_tpu.index.tiling import build_tiled_view
from prefhetch_tpu.ops.pallas_scan import pallas_slab_distances
from prefhetch_tpu.ops.topk import PAD_DISTANCE
from prefhetch_tpu.ops.union_scan import (
    union_probe_tiles, union_scan_distances,
)
from prefhetch_tpu.utils.config import IndexParams


@pytest.fixture(scope="module")
def view_and_queries():
    data = make_clustered_dataset(
        nbase=3000, ntrain=3000, nquery=8, d=32, n_clusters=24,
        gt_k=10, seed=3,
    )
    params = IndexParams(d=32, nlist=16, pq_m=8, pq_nbits=8,
                         kmeans_iters=6, pq_kmeans_iters=6)
    index = build_ivf_index(data["train"], data["base"], params)
    view = build_tiled_view(index, tile=64)
    q = jnp.asarray(data["query"][:8].astype(np.float32))
    cent = np.asarray(index.centroids)
    d2 = ((data["query"][:8, None, :] - cent[None]) ** 2).sum(-1)
    probes = np.argsort(d2, axis=1)[:, :4]
    tile_idx, counts = view.expand_probes(probes)
    return view, q, tile_idx, counts


def test_union_positions_roundtrip(view_and_queries):
    view, q, tile_idx, _ = view_and_queries
    union, pos = union_probe_tiles(tile_idx, view.empty_tile)
    assert len(union) % 128 == 0
    np.testing.assert_array_equal(union[pos], tile_idx)
    # pad area of the union is the empty tile
    uniq = np.unique(tile_idx)
    assert (union[len(uniq):] == view.empty_tile).all()


def test_union_scan_matches_pallas(view_and_queries):
    view, q, tile_idx, _ = view_and_queries
    ref = np.asarray(
        pallas_slab_distances(
            view.payload, view.norms, view.sizes, q,
            jnp.asarray(tile_idx), interpret=True,
        )
    )
    union, pos = union_probe_tiles(tile_idx, view.empty_tile)
    got = np.asarray(
        union_scan_distances(
            view.payload, view.norms, view.sizes, q,
            jnp.asarray(union), jnp.asarray(pos),
        )
    )
    assert got.shape == ref.shape
    pad_ref = ref >= PAD_DISTANCE / 2
    pad_got = got >= PAD_DISTANCE / 2
    np.testing.assert_array_equal(pad_got, pad_ref)
    np.testing.assert_allclose(
        got[~pad_got], ref[~pad_ref], rtol=2e-2, atol=0.5
    )


def test_union_dedupes_shared_tiles(view_and_queries):
    view, q, tile_idx, _ = view_and_queries
    union, _ = union_probe_tiles(tile_idx, view.empty_tile)
    n_unique = len(np.unique(tile_idx))
    assert n_unique <= tile_idx.size   # sharing exists on clustered queries
    assert len(union) == -(-n_unique // 128) * 128 or (
        union[-1] == view.empty_tile
    )


def test_union_scan_pruned_matches_unpruned(view_and_queries):
    """Pruned scan contract: the kept slots' distance rows are exactly the
    unpruned rows at those slots, kept slots rank by ascending per-tile min,
    and the global top-k after pruning equals the unpruned top-k whenever
    every top-k member's tile survives (guaranteed at j = max_t)."""
    view, q, tile_idx, _ = view_and_queries
    from prefhetch_tpu.ops.union_scan import union_scan_pruned

    union, pos = union_probe_tiles(tile_idx, view.empty_tile)
    T = view.tile
    full = np.asarray(
        union_scan_distances(
            view.payload, view.norms, view.sizes, q,
            jnp.asarray(union), jnp.asarray(pos),
        )
    )                                       # [nq, max_t*T]
    nq, mt = pos.shape
    for j in (2, mt):
        dist, sel = union_scan_pruned(
            view.payload, view.norms, view.sizes, q,
            jnp.asarray(union), jnp.asarray(pos), j,
        )
        dist, sel = np.asarray(dist), np.asarray(sel)
        assert dist.shape == (nq, j * T) and sel.shape == (nq, j)
        full3 = full.reshape(nq, mt, T)
        for qi in range(nq):
            # compaction is exact: row qi, kept slot s → unpruned slot sel
            np.testing.assert_allclose(
                dist[qi].reshape(j, T), full3[qi, sel[qi]],
                rtol=1e-5, atol=1e-3,
            )
            # kept slots are the j best by per-tile min
            mins = full3[qi].min(axis=1)
            got_best = np.sort(mins[sel[qi]])
            np.testing.assert_allclose(
                got_best, np.sort(mins)[:j], rtol=1e-5, atol=1e-3
            )
        if j == mt:
            # full-width pruning is a pure permutation: same top-k set
            k = 32
            for qi in range(nq):
                top_full = np.sort(np.sort(full[qi])[:k])
                top_prun = np.sort(np.sort(dist[qi])[:k])
                np.testing.assert_allclose(
                    top_prun, top_full, rtol=1e-5, atol=1e-3
                )


def test_union_scan_pruned_fused_matches_xla(view_and_queries):
    """The Pallas-fused pruned scan must agree with the XLA formulation:
    same kept slots, same distances within bf16-store tolerance, same PAD
    structure (bf16 PAD lanes round to +inf)."""
    view, q, tile_idx, _ = view_and_queries
    from prefhetch_tpu.ops.union_scan import (
        union_scan_pruned, union_scan_pruned_fused,
    )

    union, pos = union_probe_tiles(tile_idx, view.empty_tile)
    args = (
        view.payload, view.norms, view.sizes, q,
        jnp.asarray(union), jnp.asarray(pos),
    )
    for j in (2, pos.shape[1]):
        ref_d, ref_sel = union_scan_pruned(*args, j)
        got_d, got_sel = union_scan_pruned_fused(*args, j, interpret=True)
        ref_d, ref_sel = np.asarray(ref_d), np.asarray(ref_sel)
        got_d = np.asarray(got_d, np.float32)
        np.testing.assert_array_equal(np.asarray(got_sel), ref_sel)
        pad_ref = ref_d >= PAD_DISTANCE / 2
        np.testing.assert_array_equal(~np.isfinite(got_d) | (
            got_d >= PAD_DISTANCE / 2), pad_ref)
        np.testing.assert_allclose(
            got_d[~pad_ref], ref_d[~pad_ref], rtol=1e-2, atol=0.5
        )


def test_union_scan_pruned_qm_matches_xla(view_and_queries):
    """The query-major bf16 pruned scan (the r04 production TPU scan) must
    agree with the f32 XLA oracle on the CONTRACT, not tie order: the kept
    tiles form a valid top-j under bf16 tile mins (qm reduces mins in bf16
    — keeping the reduce f32 measured 2.4× slower), and each kept tile's
    distance block equals the oracle's block for that tile within
    bf16-store tolerance (PAD lanes round to bf16-max/inf, sorting last)."""
    view, q, tile_idx, _ = view_and_queries
    from prefhetch_tpu.ops.union_scan import (
        union_scan_pruned, union_scan_pruned_qm,
    )

    union, pos = union_probe_tiles(tile_idx, view.empty_tile)
    args = (
        view.payload, view.norms, view.sizes, q,
        jnp.asarray(union), jnp.asarray(pos),
    )
    max_t = pos.shape[1]
    T = view.payload.shape[1]
    # full-width oracle run gives every tile's f32 block, keyed by pos slot
    ref_d, ref_sel = union_scan_pruned(*args, max_t)
    ref_d = np.asarray(ref_d).reshape(q.shape[0], max_t, T)
    ref_sel = np.asarray(ref_sel)
    nq = q.shape[0]
    blocks = np.empty_like(ref_d)          # [nq, slot, T] in pos-slot order
    for qi in range(nq):
        blocks[qi, ref_sel[qi]] = ref_d[qi]
    # bf16 per-slot mins — what qm's selection actually ranks
    mins_bf16 = np.asarray(
        jnp.min(jnp.asarray(blocks).astype(jnp.bfloat16), axis=2),
        np.float32,
    )                                       # [nq, max_t]

    for j in (2, max_t):
        got_d, got_sel = union_scan_pruned_qm(*args, j)
        got_d = np.asarray(got_d, np.float32).reshape(nq, j, T)
        got_sel = np.asarray(got_sel)
        for qi in range(nq):
            slots = got_sel[qi]
            assert len(set(slots.tolist())) == j  # no duplicate tiles
            # kept set is a valid top-j of the bf16 mins (multiset match)
            kept = np.sort(mins_bf16[qi][slots])
            best = np.sort(mins_bf16[qi])[:j]
            np.testing.assert_array_equal(kept, best)
            # per-tile distance blocks match the oracle's f32 values
            ref_blk = blocks[qi][slots]     # [j, T] f32
            pad_ref = ref_blk >= PAD_DISTANCE / 2
            got_blk = got_d[qi]
            np.testing.assert_array_equal(
                ~np.isfinite(got_blk) | (got_blk >= PAD_DISTANCE / 2),
                pad_ref,
            )
            np.testing.assert_allclose(
                got_blk[~pad_ref], ref_blk[~pad_ref], rtol=1e-2, atol=0.5
            )


def test_union_pq_onehot_matches_lut_scan():
    """The one-hot ADC scan must reproduce coarse_scan_pq's residual ADC
    distances (same LUT math, matmul formulation) candidate-for-candidate."""
    import jax.numpy as jnp

    from prefhetch_tpu.ops.scan import coarse_scan_pq
    from prefhetch_tpu.ops.union_scan import union_pq_scan_distances

    data = make_clustered_dataset(
        nbase=3000, ntrain=3000, nquery=6, d=32, n_clusters=24,
        gt_k=10, seed=3,
    )
    params = IndexParams(d=32, nlist=16, pq_m=8, pq_nbits=8,
                         kmeans_iters=6, pq_kmeans_iters=6)
    index = build_ivf_index(data["train"], data["base"], params)
    view = build_tiled_view(index, tile=64, quant="pq")
    q = jnp.asarray(data["query"][:6].astype(np.float32))
    cent = np.asarray(index.centroids)
    d2c = ((data["query"][:6, None, :] - cent[None]) ** 2).sum(-1)
    probes = np.argsort(d2c, axis=1)[:, :4]
    tile_idx, counts = view.expand_probes(probes)
    union, pos = union_probe_tiles(tile_idx, view.empty_tile)

    got = np.asarray(union_pq_scan_distances(
        view.payload, view.sizes, jnp.asarray(view.tile_list_np),
        index.centroids, index.codebooks, q,
        jnp.asarray(union), jnp.asarray(pos),
        by_residual=index.params.by_residual,
    ))

    ref_res = coarse_scan_pq(
        index.centroids, index.list_codes, index.list_ids,
        index.list_sizes, index.codebooks, q, jnp.asarray(probes),
        by_residual=index.params.by_residual,
    )
    # compare per-candidate: build {id: dist} from both layouts
    rd = np.asarray(ref_res.distances)
    rid = np.asarray(ref_res.ids)
    rm = np.asarray(ref_res.mask)
    ids_np = view.tile_ids_np[tile_idx]            # [nq, mt, T]
    for qi in range(6):
        ref_map = {
            int(i): float(dv)
            for i, dv, m in zip(rid[qi], rd[qi], rm[qi]) if m
        }
        got_row = got[qi]
        ids_row = ids_np[qi].reshape(-1)
        valid = ids_row >= 0
        assert set(ids_row[valid].tolist()) == set(ref_map.keys())
        for i, dv in zip(ids_row[valid], got_row[valid]):
            assert abs(dv - ref_map[int(i)]) < 1e-2 * max(ref_map[int(i)], 1.0)


def test_union_pq_pallas_close_to_xla():
    """The Pallas (VMEM one-hot, bf16 LUT) ADC must agree with the f32 XLA
    formulation within bf16-LUT tolerance, with identical PAD structure."""
    import jax.numpy as jnp

    from prefhetch_tpu.ops.union_scan import (
        union_pq_scan_distances, union_pq_scan_distances_pallas,
    )

    data = make_clustered_dataset(
        nbase=3000, ntrain=3000, nquery=8, d=32, n_clusters=24,
        gt_k=10, seed=3,
    )
    params = IndexParams(d=32, nlist=16, pq_m=8, pq_nbits=8,
                         kmeans_iters=6, pq_kmeans_iters=6)
    index = build_ivf_index(data["train"], data["base"], params)
    view = build_tiled_view(index, tile=64, quant="pq")
    q = jnp.asarray(data["query"][:8].astype(np.float32))
    cent = np.asarray(index.centroids)
    d2c = ((data["query"][:8, None, :] - cent[None]) ** 2).sum(-1)
    probes = np.argsort(d2c, axis=1)[:, :4]
    tile_idx, _ = view.expand_probes(probes)
    union, pos = union_probe_tiles(tile_idx, view.empty_tile)
    args = (
        view.payload, view.sizes, jnp.asarray(view.tile_list_np),
        index.centroids, index.codebooks, q,
        jnp.asarray(union), jnp.asarray(pos),
    )
    ref = np.asarray(union_pq_scan_distances(*args, by_residual=True))
    got = np.asarray(union_pq_scan_distances_pallas(
        *args, by_residual=True, nqb=8, interpret=True
    ))
    pad_ref = ref >= PAD_DISTANCE / 2
    np.testing.assert_array_equal(got >= PAD_DISTANCE / 2, pad_ref)
    # bf16 LUT contract: bulk agreement tight; the smallest distances can
    # deviate more (cancellation between large ±⟨r, cb⟩ LUT terms), which
    # is the same precision class as the default bf16-recon dense scan —
    # so the meaningful contract is coarse SELECTION agreement
    rel = np.abs(got[~pad_ref] - ref[~pad_ref]) / np.maximum(
        ref[~pad_ref], 1.0
    )
    assert np.median(rel) < 0.01, np.median(rel)
    k = 40
    for qi in range(got.shape[0]):
        sel_ref = set(np.argsort(ref[qi], kind="stable")[:k].tolist())
        sel_got = set(np.argsort(got[qi], kind="stable")[:k].tolist())
        assert len(sel_ref & sel_got) >= int(0.85 * k), qi
