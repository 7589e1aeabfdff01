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
