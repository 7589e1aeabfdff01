"""Sharded index services via shard_map over a device mesh.

Sharding layout (the EP/DP analog for an ANN index — SURVEY.md §2.4, §5.8):

- inverted lists sharded along the ``nlist`` axis (each device owns
  nlist/ndev contiguous lists and their codes/vectors/ids),
- the raw base matrix sharded along the ``nbase`` axis (for exact re-rank
  and retrieval),
- centroids, codebooks and queries replicated (small),
- combination via XLA collectives riding ICI: all_gather for the coarse
  candidate scan, psum for the masked re-rank/fetch partials.

Exact-semantics guarantee: each probed list is owned by exactly one device,
so a masked all_gather + ownership-select reproduces the single-device
candidate ordering (probe-major, storage order within a list) bit-for-bit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prefhetch_tpu.index.types import IVFIndex
from prefhetch_tpu.ops.scan import ScanResult, coarse_scan_flat, coarse_scan_pq
from prefhetch_tpu.parallel.mesh import AXIS


def shard_index(index: IVFIndex, mesh: Mesh) -> IVFIndex:
    """Place index arrays with list-sharded / replicated layout.

    nlist must divide evenly by mesh size (presets use powers of two).
    """
    ndev = mesh.devices.size
    if index.nlist % ndev != 0:
        raise ValueError(f"nlist={index.nlist} not divisible by {ndev} devices")
    row = NamedSharding(mesh, P(AXIS))
    rep = NamedSharding(mesh, P())
    kw = {}
    if index.list_vectors is not None:
        kw["list_vectors"] = jax.device_put(index.list_vectors, row)
    if index.list_codes is not None:
        kw["list_codes"] = jax.device_put(index.list_codes, row)
        kw["codebooks"] = jax.device_put(index.codebooks, rep)
    if index.list_recon is not None:
        kw["list_recon"] = jax.device_put(index.list_recon, row)
    if index.list_norms is not None:
        kw["list_norms"] = jax.device_put(index.list_norms, row)
    return IVFIndex(
        centroids=jax.device_put(index.centroids, rep),
        list_ids=jax.device_put(index.list_ids, row),
        list_sizes=jax.device_put(index.list_sizes, row),
        params=index.params,
        ntotal_host=index.ntotal_host,
        **kw,
    )


def _combine_shards(dist_g, ids_g, mask_g, nq):
    """[ndev, nq, nprobe·lmax] masked shards → single-device-identical
    [nq, nprobe·lmax]. Exactly one shard is valid per candidate slot.
    Invalid slots get PAD_DISTANCE (the ScanResult contract)."""
    from prefhetch_tpu.ops.topk import PAD_DISTANCE

    dist = jnp.sum(jnp.where(mask_g, dist_g, 0.0), axis=0)
    ids = jnp.max(jnp.where(mask_g, ids_g, -1), axis=0)
    mask = jnp.any(mask_g, axis=0)
    return jnp.where(mask, dist, PAD_DISTANCE), ids, mask


def _localize_probes(probe_ids, nlist_local):
    """Map global probe/list ids to local shard coordinates + ownership."""
    me = jax.lax.axis_index(AXIS)
    offset = me * nlist_local
    local = probe_ids - offset
    owned = (local >= 0) & (local < nlist_local)
    return jnp.clip(local, 0, nlist_local - 1), owned


def sharded_coarse_scan(
    mesh: Mesh, index: IVFIndex, queries: jax.Array, probe_ids: jax.Array
) -> ScanResult:
    """Multi-device all-candidate scan, order-identical to the single-device
    scan (ops/scan.py)."""
    # prefer the dense MXU payload (recon for PQ, raw vectors for flat)
    uses_pq = index.uses_pq and index.list_recon is None
    nlist_local = index.nlist // mesh.devices.size
    by_residual = index.params.by_residual

    def shard_fn(centroids, list_payload, list_ids, list_sizes, codebooks,
                 list_norms, queries, probe_ids):
        local, owned = _localize_probes(probe_ids, nlist_local)
        if uses_pq:
            res = coarse_scan_pq(
                centroids, list_payload, list_ids, list_sizes, codebooks,
                queries, local, by_residual=by_residual,
            )
        else:
            res = coarse_scan_flat(
                list_payload, list_ids, list_sizes, queries, local,
                list_norms,
            )
        nq, nprobe = probe_ids.shape
        lmax = list_ids.shape[1]
        # zero out probes this shard does not own
        own3 = jnp.repeat(owned[:, :, None], lmax, axis=2).reshape(nq, -1)
        mask = res.mask & own3
        counts = jnp.sum(
            jnp.where(owned, list_sizes[jnp.clip(local, 0, nlist_local - 1)], 0),
            axis=1,
        ).astype(jnp.int32)
        # gather shards and reduce to exact single-device result
        dist_g = jax.lax.all_gather(jnp.where(mask, res.distances, 0.0), AXIS)
        ids_g = jax.lax.all_gather(jnp.where(mask, res.ids, -1), AXIS)
        mask_g = jax.lax.all_gather(mask, AXIS)
        dist, ids, m = _combine_shards(dist_g, ids_g, mask_g, nq)
        total = jax.lax.psum(counts, AXIS)
        return dist, ids, m, total

    # centroids ride in list-sharded (P(AXIS)) so that LOCAL list ids index
    # the right centroid rows for the by-residual LUT inside each shard.
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(AXIS), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    if uses_pq:
        payload = index.list_codes
    elif index.list_recon is not None:
        payload = index.list_recon
    else:
        payload = index.list_vectors
    codebooks = index.codebooks if uses_pq else jnp.zeros((1, 1, 1), jnp.float32)
    norms = index.list_norms
    if norms is None:
        norms = jnp.sum(payload.astype(jnp.float32) ** 2, axis=-1) if not uses_pq \
            else jnp.zeros(index.list_ids.shape, jnp.float32)
    d, i, m, c = jax.jit(fn)(
        index.centroids, payload, index.list_ids, index.list_sizes,
        codebooks, norms, jnp.asarray(queries, jnp.float32),
        jnp.asarray(probe_ids, jnp.int32),
    )
    return ScanResult(d, i, m, c)


def sharded_rerank(
    mesh: Mesh, base_sharded: jax.Array, queries: jax.Array, cand_ids: jax.Array
) -> jax.Array:
    """Exact re-rank with the base matrix row-sharded: each device scores the
    candidates it owns; a psum of masked partials assembles [nq, P]."""

    def shard_fn(base_local, queries, cand_ids):
        nb_local = base_local.shape[0]
        local, owned = _localize_probes(cand_ids, nb_local)
        vecs = base_local[local]                              # [nq, P, d]
        qsq = jnp.sum(queries * queries, axis=-1)
        vsq = jnp.sum(vecs * vecs, axis=-1)
        cross = jnp.einsum(
            "qd,qpd->qp", queries, vecs, preferred_element_type=jnp.float32
        )
        d2 = jnp.maximum(qsq[:, None] + vsq - 2.0 * cross, 0.0)
        return jax.lax.psum(jnp.where(owned, d2, 0.0), AXIS)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS), P(), P()), out_specs=P(), check_vma=False,
    )
    return jax.jit(fn)(
        base_sharded,
        jnp.asarray(queries, jnp.float32),
        jnp.asarray(cand_ids, jnp.int32),
    )


def sharded_fetch(
    mesh: Mesh, base_sharded: jax.Array, ids: jax.Array
) -> jax.Array:
    """Vector retrieval with row-sharded base (PIR-placeholder endpoint)."""

    def shard_fn(base_local, ids):
        nb_local = base_local.shape[0]
        local, owned = _localize_probes(ids, nb_local)
        vecs = base_local[local]                              # [nq, K, d]
        return jax.lax.psum(
            jnp.where(owned[..., None], vecs, 0.0), AXIS
        )

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS), P()), out_specs=P(), check_vma=False,
    )
    return jax.jit(fn)(base_sharded, jnp.asarray(ids, jnp.int32))


def sharded_kmeans_step(
    mesh: Mesh, x_sharded: jax.Array, centroids: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """One data-parallel Lloyd iteration: each device accumulates partial
    (sums, counts) over its rows; psum over ICI; replicated update.

    This is the distributed form of the training step in ops/kmeans.py —
    the index-training analog of a DP gradient step.
    """
    k = centroids.shape[0]

    def shard_fn(x_local, centroids):
        csq = jnp.sum(centroids * centroids, axis=-1)
        cross = jax.lax.dot_general(
            x_local, centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        a = jnp.argmin(csq[None, :] - 2.0 * cross, axis=-1)
        onehot = jax.nn.one_hot(a, k, dtype=jnp.float32)
        sums = jax.lax.psum(
            jax.lax.dot_general(
                onehot, x_local,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            AXIS,
        )
        counts = jax.lax.psum(jnp.sum(onehot, axis=0), AXIS)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        return new_c, counts

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS), P()), out_specs=(P(), P()), check_vma=False,
    )
    return jax.jit(fn)(x_sharded, centroids)


# ---------------------------------------------------------------------------
# Sharded TILED union scan (r04): the production serving formulation
# (ops/union_scan.py — batch-deduped union tiles, one MXU matmul) over a
# tile-sharded payload. Removes the r03 "tiled wire not available in
# sharded mode" restriction (engine/server.py): the fixed-size tile is the
# natural shard unit — each device owns a contiguous tile range of the
# payload/norms/sizes arrays, scores ONLY its share of the batch's union,
# and the per-query extracted rows (NOT the full [nq, |U|·T] distance
# matrix) combine by psum — every (query, slot) has exactly one owner, so
# owner-value + zeros reproduces the single-device result bit-for-bit.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ShardedTiledView:
    """Tile-sharded twin of index.tiling.TiledView's device arrays."""

    payload: jax.Array       # [ntp, T, d] — tile-sharded P(AXIS)
    norms: jax.Array         # [ntp, T] — tile-sharded
    sizes: jax.Array         # [ntp] — tile-sharded
    ids: jax.Array           # [ntiles+1, T] — replicated (tail resolve)
    ntp: int                 # padded tile count (ndev multiple)
    tpl: int                 # tiles per device: ownership = tile // tpl


def shard_tiled_view(view, mesh: Mesh) -> ShardedTiledView:
    """Pad the tile axis to a mesh multiple (pad tiles have size 0 and are
    never referenced by any union) and place the scan arrays row-sharded;
    the id table replicates (int32, ~4 MB at 1M/T=1024 — the tail resolve
    gathers only nq·k elements)."""
    import numpy as np

    ndev = mesh.devices.size
    nt = int(view.payload.shape[0])
    ntp = -(-nt // ndev) * ndev
    payload = np.asarray(view.payload)
    norms = np.asarray(view.norms)
    sizes = np.asarray(view.sizes)
    if ntp != nt:
        pad = ntp - nt
        payload = np.concatenate(
            [payload, np.zeros((pad,) + payload.shape[1:], payload.dtype)]
        )
        norms = np.concatenate(
            [norms, np.zeros((pad, norms.shape[1]), norms.dtype)]
        )
        sizes = np.concatenate([sizes, np.zeros(pad, sizes.dtype)])
    row = NamedSharding(mesh, P(AXIS))
    rep = NamedSharding(mesh, P())
    return ShardedTiledView(
        payload=jax.device_put(jnp.asarray(payload), row),
        norms=jax.device_put(jnp.asarray(norms), row),
        sizes=jax.device_put(jnp.asarray(sizes), row),
        ids=jax.device_put(view.ids, rep),
        ntp=ntp,
        tpl=ntp // ndev,
    )


def partition_union(
    union_np, pos_np, empty_tile: int, tpl: int, ndev: int,
    u_loc: int | None = None,
):
    """Host side: split the batch's union across tile owners.

    Returns (union_dev [ndev, u_loc] i32 — global tile ids, −1 pads;
    pos_dev [nq, mt] i32 — positions into the dev-major concatenated
    layout slot = owner·u_loc + local_slot; u_loc). Duplicate empty-tile
    pad entries of the global union collapse onto its first occurrence so
    they never inflate one shard's share. u_loc may be pinned by the
    caller (serving shape pinning); it is raised if any share would
    truncate."""
    import numpy as np

    union_np = np.asarray(union_np)
    first = int(np.argmax(union_np == empty_tile))
    keep = np.ones(len(union_np), bool)
    tail = union_np[first + 1:] == empty_tile
    keep[first + 1:][tail] = False
    owner = (union_np // tpl).astype(np.int64)
    slot_of = np.empty(len(union_np), np.int64)
    counts = np.zeros(ndev, np.int64)
    kept_idx = np.nonzero(keep)[0]
    for d in range(ndev):
        sel = kept_idx[owner[kept_idx] == d]
        counts[d] = len(sel)
        slot_of[sel] = np.arange(len(sel))
    need = int(counts.max()) if ndev else 1
    if u_loc is None or u_loc < need:
        u_loc = max(1, 1 << (need - 1).bit_length())
    union_dev = np.full((ndev, u_loc), -1, np.int32)
    for d in range(ndev):
        sel = kept_idx[owner[kept_idx] == d]
        union_dev[d, : len(sel)] = union_np[sel]
    slot_of = slot_of + owner * u_loc
    # dropped duplicate empty entries point at the kept one
    slot_of[~keep] = slot_of[first]
    pos_dev = slot_of[np.asarray(pos_np)].astype(np.int32)
    return union_dev, pos_dev, u_loc


@functools.lru_cache(maxsize=None)
def _tiled_scan_fn(mesh: Mesh, q16: bool):
    """Jitted shard_map: tile-sharded union scan → replicated
    [nq, mt·T] distances (or the u16-quantized wire triple)."""
    from prefhetch_tpu.ops.topk import PAD_DISTANCE

    def shard_fn(payload_l, norms_l, sizes_l, queries, union_l, pos):
        me = jax.lax.axis_index(AXIS)
        ntl = payload_l.shape[0]
        uid = union_l[0]                       # [u_loc] global ids, −1 pads
        u_loc = uid.shape[0]
        owned = uid >= 0
        loc = jnp.clip(uid - me * ntl, 0, ntl - 1)
        slab = payload_l[loc]                  # [u_loc, T, d]
        n = norms_l[loc]
        sz = jnp.where(owned, sizes_l[loc], 0)
        T = slab.shape[1]
        nq = queries.shape[0]
        q = queries.astype(jnp.float32)
        qc = q.astype(slab.dtype) if slab.dtype == jnp.bfloat16 else q
        cross = jax.lax.dot_general(
            slab.reshape(u_loc * T, -1), qc,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                      # [u_loc·T, nq]
        qsq = jnp.sum(q * q, axis=-1)
        d2 = qsq[None, :] + n.reshape(u_loc * T, 1) - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        lane = jnp.arange(T, dtype=jnp.int32)
        valid = (lane[None, :] < sz[:, None]).reshape(u_loc * T)
        d2 = jnp.where(valid[:, None], d2, PAD_DISTANCE)
        d2m = d2.reshape(u_loc, T, nq).transpose(2, 0, 1)   # [nq, u_loc, T]
        # per-query extraction of MY slots only, then psum: each slot has
        # exactly one owner, so owner-value + (ndev−1) exact zeros is the
        # single-device value bit-for-bit (all values ≥ 0, finite)
        mine = (pos // u_loc) == me
        ls = jnp.where(mine, pos % u_loc, 0)
        ext = jnp.take_along_axis(d2m, ls[:, :, None], axis=1)
        ext = jnp.where(mine[:, :, None], ext, 0.0)
        dist = jax.lax.psum(ext, AXIS).reshape(nq, -1)      # [nq, mt·T]
        if not q16:
            return dist
        # u16 range quantization — replicated elementwise math, identical
        # on every device (ops/union_scan.union_scan_distances_q16)
        vmask = dist < PAD_DISTANCE
        dmin = jnp.min(dist, axis=1)
        dmax = jnp.max(jnp.where(vmask, dist, -jnp.inf), axis=1)
        dstep = jnp.maximum(dmax - dmin, 1e-20) / 65534.0
        qd = jnp.clip(
            jnp.round((dist - dmin[:, None]) / dstep[:, None]), 0, 65534
        ).astype(jnp.uint16)
        qd = jnp.where(vmask, qd, jnp.uint16(65535))
        return qd, dmin, dstep

    out_specs = (P(), P(), P()) if q16 else P()
    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P(AXIS), P()),
        out_specs=out_specs,
        check_vma=False,
    ))


def sharded_union_scan(
    mesh: Mesh, st: ShardedTiledView, queries: jax.Array,
    union_dev, pos_dev,
) -> jax.Array:
    """[nq, mt·T] distances, replicated — sharded twin of
    ops/union_scan.union_scan_distances."""
    return _tiled_scan_fn(mesh, False)(
        st.payload, st.norms, st.sizes,
        jnp.asarray(queries, jnp.float32),
        jnp.asarray(union_dev), jnp.asarray(pos_dev),
    )


def sharded_union_scan_q16(
    mesh: Mesh, st: ShardedTiledView, queries: jax.Array,
    union_dev, pos_dev,
):
    """(qd u16 [nq, mt·T], dmin, dstep) — sharded twin of
    union_scan_distances_q16 (the tiled binary coarse wire)."""
    return _tiled_scan_fn(mesh, True)(
        st.payload, st.norms, st.sizes,
        jnp.asarray(queries, jnp.float32),
        jnp.asarray(union_dev), jnp.asarray(pos_dev),
    )


@functools.lru_cache(maxsize=None)
def _fused_tail_fn(mesh: Mesh, k: int):
    """Jitted shard_map: exact re-rank of replicated candidate ids against
    the row-sharded base (masked psum partials — sharded_rerank) + the
    final top-k, mirroring ops/rerank.final_topk bit-for-bit."""

    def shard_fn(base_l, queries, cand):
        nb_local = base_l.shape[0]
        local, owned = _localize_probes(cand, nb_local)
        vecs = base_l[local]                              # [nq, P, d]
        q = queries.astype(jnp.float32)
        qsq = jnp.sum(q * q, axis=-1)
        vsq = jnp.sum(vecs * vecs, axis=-1)
        cross = jnp.einsum(
            "qd,qpd->qp", q, vecs, preferred_element_type=jnp.float32
        )
        d2 = jnp.maximum(qsq[:, None] + vsq - 2.0 * cross, 0.0)
        scores = jax.lax.psum(jnp.where(owned, d2, 0.0), AXIS)
        neg, order = jax.lax.top_k(-scores, k)
        return jnp.take_along_axis(cand, order, axis=1), -neg

    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS), P(), P()), out_specs=(P(), P()),
        check_vma=False,
    ))


def sharded_fused_tail(
    mesh: Mesh, base_sharded: jax.Array, queries: jax.Array,
    cand_ids: jax.Array, k: int,
):
    """(ids [nq, k], dists [nq, k]) ascending — the fused route's re-rank +
    final select with the base row-sharded."""
    return _fused_tail_fn(mesh, int(k))(
        base_sharded, jnp.asarray(queries, jnp.float32),
        jnp.asarray(cand_ids, jnp.int32),
    )


@functools.lru_cache(maxsize=None)
def _tiled_scan_pruned_fn(mesh: Mesh, j_keep: int):
    """Jitted shard_map twin of ops/union_scan.union_scan_pruned:
    tile-sharded scan → per-tile min lower bounds (psum) → top-j_keep
    tile select (replicated) → kept-tiles-only extraction (psum).
    Returns (dist f32 [nq, j·T], sel [nq, j]) — bit-identical to the
    single-device XLA formulation (same per-tile math, owner-value +
    exact zeros through both psums)."""
    from prefhetch_tpu.ops.topk import PAD_DISTANCE

    def shard_fn(payload_l, norms_l, sizes_l, queries, union_l, pos):
        me = jax.lax.axis_index(AXIS)
        ntl = payload_l.shape[0]
        uid = union_l[0]
        u_loc = uid.shape[0]
        owned = uid >= 0
        loc = jnp.clip(uid - me * ntl, 0, ntl - 1)
        slab = payload_l[loc]
        n = norms_l[loc]
        sz = jnp.where(owned, sizes_l[loc], 0)
        T = slab.shape[1]
        nq = queries.shape[0]
        q = queries.astype(jnp.float32)
        qc = q.astype(slab.dtype) if slab.dtype == jnp.bfloat16 else q
        cross = jax.lax.dot_general(
            slab.reshape(u_loc * T, -1), qc,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qsq = jnp.sum(q * q, axis=-1)
        d2 = qsq[None, :] + n.reshape(u_loc * T, 1) - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        lane = jnp.arange(T, dtype=jnp.int32)
        valid = (lane[None, :] < sz[:, None]).reshape(u_loc * T)
        d2 = jnp.where(valid[:, None], d2, PAD_DISTANCE)
        d3 = d2.reshape(u_loc, T, nq)
        dmin_u = jnp.min(d3, axis=1)                     # [u_loc, nq]
        mine = (pos // u_loc) == me                      # [nq, mt]
        ls = jnp.where(mine, pos % u_loc, 0)
        tm = jnp.take_along_axis(dmin_u.T, ls, axis=1)   # [nq, mt]
        tm = jax.lax.psum(jnp.where(mine, tm, 0.0), AXIS)
        _, sel = jax.lax.top_k(-tm, j_keep)              # [nq, j] replicated
        upos = jnp.take_along_axis(pos, sel, axis=1)     # [nq, j]
        mine_j = (upos // u_loc) == me
        ls_j = jnp.where(mine_j, upos % u_loc, 0)
        d2m = d3.transpose(2, 0, 1)                      # [nq, u_loc, T]
        ext = jnp.take_along_axis(d2m, ls_j[:, :, None], axis=1)
        ext = jnp.where(mine_j[:, :, None], ext, 0.0)
        out = jax.lax.psum(ext, AXIS).reshape(nq, -1)    # [nq, j·T]
        return out, sel

    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P(AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    ))


def sharded_union_scan_pruned(
    mesh: Mesh, st: ShardedTiledView, queries: jax.Array,
    union_dev, pos_dev, j_keep: int,
):
    """(dist [nq, j·T], sel [nq, j]) — sharded twin of
    ops/union_scan.union_scan_pruned (segment-level pruning)."""
    return _tiled_scan_pruned_fn(mesh, int(j_keep))(
        st.payload, st.norms, st.sizes,
        jnp.asarray(queries, jnp.float32),
        jnp.asarray(union_dev), jnp.asarray(pos_dev),
    )


# ---------------------------------------------------------------------------
# Encrypted services sharded (VERDICT r04 next #4): the north star is
# encrypted q/s on a v5e-8, so the BFV truncated-MAC and the PIR DB fold
# must ride the mesh too, not just the plaintext triage.
# ---------------------------------------------------------------------------

def pad_rows_for_mesh(base_pad, ndev: int):
    """Pad a [rows, d] int32 matrix with zero rows to a multiple of ndev
    (the appended rows can never be indexed: callers clamp idx to the
    original padding row, and zero rows MAC to zero anyway)."""
    import numpy as np

    rows = base_pad.shape[0]
    want = -(-rows // ndev) * ndev
    if want == rows:
        return base_pad
    return np.concatenate(
        [base_pad, np.zeros((want - rows, base_pad.shape[1]),
                            base_pad.dtype)]
    )


def sharded_trunc_mac_q1(
    mesh: Mesh, base_sharded: jax.Array, ctq: jax.Array, idx: jax.Array,
    params,
):
    """Row/query-sharded BFV truncated MAC (q1 wire) — the encrypted
    re-rank service (engine/hecompute.encrypted_scores_trunc_q1) over a
    device mesh, BIT-equal to the single-device kernel.

    Layout: the candidate base is row-sharded (each device owns
    rows/ndev contiguous rows); candidate rows are assembled EP-style —
    each device contributes the rows it owns, a psum materializes the
    gather (exact: every idx hits exactly one shard, int32 adds) — then
    the expensive per-(query, block) NTT/MAC work is QUERY-sharded so
    each device transforms nq/ndev queries, and an all_gather reassembles
    the bundled wire. nq and rows must divide by the mesh size (callers
    bucket nq to powers of two already — engine/server.py coarse_search).

    Bit-equality holds by construction: the MAC core
    (hecompute.build_trunc_mac_q1) is exact integer modular arithmetic,
    so per-query results cannot depend on which device computed them."""
    from prefhetch_tpu.engine.hecompute import build_trunc_mac_q1

    core = build_trunc_mac_q1(params)
    ndev = mesh.devices.size
    nq = idx.shape[0]
    assert nq % ndev == 0, (nq, ndev)
    nq_l = nq // ndev

    def shard_fn(base_l, ctq, idx):
        rows_l = base_l.shape[0]
        me = jax.lax.axis_index(AXIS)
        rel = idx - me * rows_l
        owned = (rel >= 0) & (rel < rows_l)
        local = jnp.where(
            owned[..., None],
            base_l[jnp.clip(rel, 0, rows_l - 1)],
            0,
        )                                           # [nq, npad, d] i32
        rows = jax.lax.psum(local, AXIS)
        myrows = jax.lax.dynamic_slice_in_dim(rows, me * nq_l, nq_l, 0)
        myct = jax.lax.dynamic_slice_in_dim(ctq, me * nq_l, nq_l, 0)
        out = core(myrows, myct)
        return jax.lax.all_gather(out, AXIS, axis=0, tiled=True)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS), P(), P()), out_specs=P(), check_vma=False,
    )
    return jax.jit(fn)(
        base_sharded, jnp.asarray(ctq), jnp.asarray(idx, jnp.int32)
    )
