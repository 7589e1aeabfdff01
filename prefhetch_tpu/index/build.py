"""IVF(-PQ) index training + building.

Replaces the reference's FAISS-fork ``train`` + ``add`` calls
(reference: src/server/server_lib.cpp:71,80) and its index (de)serialization
(``faiss::write_index``/``read_index``, src/server/server_lib.cpp:82,91):

- coarse quantizer: k-means on TPU (ops/kmeans.py),
- PQ codebooks: per-subspace k-means on residuals (FAISS IndexIVFPQ default
  ``by_residual=true``), vmapped over the M subspaces,
- ``add``: batched assignment matmul + host-side bucketing into the dense
  padded inverted-list layout (index/types.py),
- save/load: npz with a parameter-encoding filename
  (parity with src/server/server_lib.cpp:38-42).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from prefhetch_tpu.index.types import HostArrays, IVFIndex, pad_to_lane
from prefhetch_tpu.ops.kmeans import train_kmeans, train_kmeans_batched
from prefhetch_tpu.utils.config import IndexParams


@functools.partial(jax.jit, static_argnames=())
def _assign_chunk(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """argmin_c ‖x−c‖² for a chunk of vectors — one MXU matmul."""
    csq = jnp.sum(centroids * centroids, axis=-1)
    cross = jax.lax.dot_general(
        x, centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.argmin(csq[None, :] - 2.0 * cross, axis=-1)


def assign_to_lists(
    x: np.ndarray, centroids: np.ndarray, chunk: int = 65536
) -> np.ndarray:
    """Coarse-quantizer assignment of all base vectors → list id [n]."""
    out = np.empty(x.shape[0], np.int32)
    cj = jnp.asarray(centroids, jnp.float32)
    for s in range(0, x.shape[0], chunk):
        out[s : s + chunk] = np.asarray(
            _assign_chunk(jnp.asarray(x[s : s + chunk], jnp.float32), cj)
        )
    return out


def _topk_assign_chunk(x: jax.Array, centroids: jax.Array, k: int):
    csq = jnp.sum(centroids * centroids, axis=-1)
    cross = jax.lax.dot_general(
        x, centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    neg, idx = jax.lax.top_k(-(csq[None, :] - 2.0 * cross), k)
    return -neg, idx


def assign_to_lists_balanced(
    x: np.ndarray,
    centroids: np.ndarray,
    cap_factor: float = 1.25,
    n_cand: int = 4,
    chunk: int = 65536,
) -> np.ndarray:
    """Capacity-bounded coarse assignment: list sizes ≤ cap_factor·(n/nlist).

    Natural k-means clusters on real data are heavily imbalanced — at
    SIFT1M-like scale the largest inverted list padded the device layout
    ~3.5× past the mean, and the dense scan pays HBM bandwidth for every
    padded lane. Greedy rounds: each point claims its r-th nearest centroid
    (r = 0..n_cand−1); every list accepts its closest claimants up to
    remaining capacity; spill-overs retry with their next candidate.
    Points that exhaust all candidates (rare) go to the least-filled lists.

    Spilled points live one centroid away from their Voronoi cell, so a
    query probing nprobe ≫ 1 lists still finds them — recall at the bench
    operating point is asserted unchanged (tests/test_index.py)."""
    n = x.shape[0]
    nlist = centroids.shape[0]
    cap = int(np.ceil(cap_factor * n / nlist))
    top_d = np.empty((n, n_cand), np.float32)
    top_i = np.empty((n, n_cand), np.int32)
    cj = jnp.asarray(centroids, jnp.float32)
    for s in range(0, n, chunk):
        dd, ii = _topk_assign_chunk(
            jnp.asarray(x[s : s + chunk], jnp.float32), cj, n_cand
        )
        top_d[s : s + chunk] = np.asarray(dd)
        top_i[s : s + chunk] = np.asarray(ii)

    assign = np.full(n, -1, np.int64)
    remaining = np.full(nlist, cap, np.int64)
    pending = np.arange(n)
    for r in range(n_cand):
        if pending.size == 0:
            break
        lists_r = top_i[pending, r].astype(np.int64)
        d_r = top_d[pending, r]
        order = np.lexsort((d_r, lists_r))
        sl = lists_r[order]
        # rank of each claimant within its list group (groups contiguous)
        starts = np.searchsorted(sl, np.arange(nlist))
        rank = np.arange(order.size) - starts[sl]
        accept = rank < remaining[sl]
        chosen = order[accept]
        assign[pending[chosen]] = sl[accept]
        remaining -= np.bincount(sl[accept], minlength=nlist)
        pending = pending[order[~accept]]
    if pending.size:
        # exhausted all candidates: fill least-loaded lists
        fill_order = np.argsort(-remaining, kind="stable")
        slots = np.repeat(fill_order, np.maximum(remaining[fill_order], 0))
        assign[pending] = slots[: pending.size]
    return assign.astype(np.int32)


def train_pq_codebooks(
    train: np.ndarray,            # [nt, d] training vectors
    centroids: np.ndarray,        # [nlist, d] trained coarse quantizer
    params: IndexParams,
) -> np.ndarray:
    """Train PQ codebooks [M, ksub, dsub].

    FAISS IndexIVFPQ trains the PQ on *residuals* r = x − centroid(x)
    (by_residual default). Each of the M subspaces is an independent k-means
    problem, run vmapped on device.
    """
    M, dsub, ksub = params.pq_m, params.dsub, params.ksub
    xt = np.asarray(train, np.float32)
    if params.by_residual:
        assign = assign_to_lists(xt, centroids)
        xt = xt - centroids[assign]
    sub = xt.reshape(xt.shape[0], M, dsub).transpose(1, 0, 2)  # [M, nt, dsub]
    return train_kmeans_batched(
        sub, k=ksub, iters=params.pq_kmeans_iters, seed=params.seed
    ).astype(np.float32)


@jax.jit
def _encode_chunk(res: jax.Array, codebooks: jax.Array) -> jax.Array:
    """PQ-encode residual chunk [c, M, dsub] against codebooks [M, ksub, dsub]
    → codes [c, M] int32 (argmin codeword per subspace)."""
    # d2[c, M, ksub] = ‖r − cb‖² ; xsq term argmin-invariant
    cbsq = jnp.sum(codebooks * codebooks, axis=-1)          # [M, ksub]
    cross = jnp.einsum(
        "cmd,mkd->cmk", res, codebooks, preferred_element_type=jnp.float32
    )
    return jnp.argmin(cbsq[None] - 2.0 * cross, axis=-1).astype(jnp.int32)


def encode_pq(
    x: np.ndarray,
    assign: np.ndarray,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    params: IndexParams,
    chunk: int = 65536,
) -> np.ndarray:
    """PQ-encode all vectors → codes [n, M] uint8."""
    n = x.shape[0]
    M = params.pq_m
    codes = np.empty((n, M), np.uint8)
    cb = jnp.asarray(codebooks)
    for s in range(0, n, chunk):
        xs = np.asarray(x[s : s + chunk], np.float32)
        if params.by_residual:
            xs = xs - centroids[assign[s : s + chunk]]
        res = jnp.asarray(xs.reshape(xs.shape[0], M, params.dsub))
        codes[s : s + chunk] = np.asarray(_encode_chunk(res, cb)).astype(np.uint8)
    return codes


def build_ivf_index(
    train: np.ndarray,
    base: np.ndarray,
    params: IndexParams,
) -> IVFIndex:
    """Full index build: train coarse quantizer (+PQ), add all base vectors.

    The reference equivalent is Server::init_index's cold path
    (src/server/server_lib.cpp:55-84).
    """
    base = np.asarray(base, np.float32)
    if base.shape[1] != params.d:
        raise ValueError(
            "dataset does not have same dimension as configured d"
        )
    if params.metric == "cosine":
        # angular search = L2 over unit vectors (see data.synthetic
        # .normalize_rows); normalize once at build time
        from prefhetch_tpu.data.synthetic import normalize_rows

        base = normalize_rows(base)
        train = normalize_rows(train)
    centroids = train_kmeans(
        np.asarray(train, np.float32),
        k=params.nlist,
        iters=params.kmeans_iters,
        seed=params.seed,
        spherical=(params.metric == "cosine"),
    )
    if params.balance > 0:
        assign = assign_to_lists_balanced(
            base, centroids, cap_factor=params.balance
        )
    else:
        assign = assign_to_lists(base, centroids)

    codebooks = codes = None
    if params.uses_pq:
        codebooks = train_pq_codebooks(train, centroids, params)
        codes = encode_pq(base, assign, centroids, codebooks, params)

    # Bucket into dense padded lists (host side, one pass).
    nlist = params.nlist
    order = np.argsort(assign, kind="stable")     # stable: preserves add order
    sorted_assign = assign[order]
    sizes = np.bincount(assign, minlength=nlist).astype(np.int32)
    lmax = pad_to_lane(int(sizes.max()) if sizes.size else 1)
    offsets = np.zeros(nlist + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])

    list_ids = np.full((nlist, lmax), -1, np.int32)
    rank_in_list = np.arange(base.shape[0]) - offsets[sorted_assign]
    list_ids[sorted_assign, rank_in_list] = order.astype(np.int32)

    kwargs = {}
    if params.uses_sq8:
        # per-dimension 8-bit scalar quantizer (faiss IndexIVFScalarQuantizer
        # QT_8bit analog): train min/scale on the training set
        train_f = np.asarray(train, np.float32)
        vmin = train_f.min(axis=0)
        vmax = train_f.max(axis=0)
        scale = np.maximum((vmax - vmin) / 255.0, 1e-12).astype(np.float32)
        codes8 = np.clip(
            np.round((base - vmin) / scale), 0, 255
        ).astype(np.uint8)
        list_sq = np.zeros((nlist, lmax, params.d), np.uint8)
        list_sq[sorted_assign, rank_in_list] = codes8[order]
        kwargs["list_sq"] = jnp.asarray(list_sq)
        kwargs["sq_vmin"] = jnp.asarray(vmin)
        kwargs["sq_scale"] = jnp.asarray(scale)
    elif params.uses_pq:
        list_codes = np.zeros((nlist, lmax, params.pq_m), np.uint8)
        list_codes[sorted_assign, rank_in_list] = codes[order]
        kwargs["list_codes"] = jnp.asarray(list_codes.astype(np.int32))
        kwargs["codebooks"] = jnp.asarray(codebooks)
        # MXU fast path: precompute z = centroid + decode(code) per stored
        # vector so the ADC scan is a dense matmul (see IVFIndex.list_recon).
        decoded = codebooks[
            np.arange(params.pq_m)[None, :], codes
        ].reshape(base.shape[0], params.d)                  # [n, d]
        recon = decoded + (centroids[assign] if params.by_residual else 0.0)
        import ml_dtypes

        list_recon = np.zeros((nlist, lmax, params.d), np.float32)
        list_recon[sorted_assign, rank_in_list] = recon[order]
        recon_bf16 = list_recon.astype(ml_dtypes.bfloat16)
        kwargs["list_recon"] = jnp.asarray(recon_bf16)
        # norms of the bf16-rounded payload (what the scan actually sees)
        norms_np = (recon_bf16.astype(np.float32) ** 2).sum(-1).astype(
            np.float32
        )
        kwargs["list_norms"] = jnp.asarray(norms_np)
        kwargs["host_arrays"] = HostArrays({
            "payload": recon_bf16, "norms": norms_np, "codes": list_codes,
            "ids": list_ids, "sizes": sizes,
        })
    else:
        list_vectors = np.zeros((nlist, lmax, params.d), np.float32)
        list_vectors[sorted_assign, rank_in_list] = base[order]
        kwargs["list_vectors"] = jnp.asarray(list_vectors)
        norms_np = (
            (list_vectors.astype(np.float64) ** 2).sum(-1)
        ).astype(np.float32)
        kwargs["list_norms"] = jnp.asarray(norms_np)
        kwargs["host_arrays"] = HostArrays({
            "payload": list_vectors, "norms": norms_np,
            "ids": list_ids, "sizes": sizes,
        })

    return IVFIndex(
        centroids=jnp.asarray(centroids, jnp.float32),
        list_ids=jnp.asarray(list_ids),
        list_sizes=jnp.asarray(sizes),
        params=params,
        ntotal_host=int(base.shape[0]),
        **kwargs,
    )


def save_index(index: IVFIndex, directory: str) -> str:
    """Serialize to npz under a parameter-encoding filename.

    Checkpoint parity with faiss::write_index to ``NBASE…_IVF…_PQ….faiss``
    (reference: src/server/server_lib.cpp:38-42,82). PQ codes are stored
    uint8 on disk (index-memory parity with FAISS's 8-bit codes).
    """
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, index.params.artifact_name())
    arrays = {
        "centroids": np.asarray(index.centroids),
        "list_ids": np.asarray(index.list_ids),
        "list_sizes": np.asarray(index.list_sizes),
    }
    if index.list_norms is not None:
        arrays["list_norms"] = np.asarray(index.list_norms)
    if index.list_sq is not None:
        arrays["list_sq"] = np.asarray(index.list_sq)
        arrays["sq_vmin"] = np.asarray(index.sq_vmin)
        arrays["sq_scale"] = np.asarray(index.sq_scale)
    elif index.uses_pq:
        arrays["list_codes"] = np.asarray(index.list_codes).astype(np.uint8)
        arrays["codebooks"] = np.asarray(index.codebooks)
        if index.list_recon is not None:
            # bf16 stored as raw uint16 bit pattern (npz has no bf16 dtype)
            arrays["list_recon_bf16"] = np.asarray(
                index.list_recon
            ).view(np.uint16)
    else:
        arrays["list_vectors"] = np.asarray(index.list_vectors)
    import dataclasses
    import json

    arrays["params_json"] = np.frombuffer(
        json.dumps(dataclasses.asdict(index.params)).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)
    return path


def load_index(path: str) -> IVFIndex:
    """Deserialize an index saved by save_index (warm-start path parity with
    faiss::read_index + downcast, reference: src/server/server_lib.cpp:85-98)."""
    import json

    with np.load(path) as z:
        params = IndexParams(**json.loads(bytes(z["params_json"]).decode()))
        kwargs = {}
        # host copies of everything the tiled-view re-pack reads — d2h
        # fetches through the relay are slow AND stall-prone (HostArrays)
        host = {"ids": z["list_ids"], "sizes": z["list_sizes"]}
        # big payload-class fields stay HOST-side (np): the tiled view
        # re-packs and re-uploads them anyway, and eagerly device-putting
        # ~3 GB at load queued the relay so deep that the process's first
        # tiny d2h stalled 441 s (r05 build-phase attribution). np leaves
        # are valid jax inputs for the rare non-tiled consumers (oracles,
        # small-scale tests), which pay a per-use upload instead.
        if "list_norms" in z:
            host["norms"] = z["list_norms"]
            kwargs["list_norms"] = host["norms"]
        if "list_sq" in z:
            kwargs["list_sq"] = z["list_sq"]
            kwargs["sq_vmin"] = jnp.asarray(z["sq_vmin"])
            kwargs["sq_scale"] = jnp.asarray(z["sq_scale"])
        elif "list_codes" in z:
            host["codes"] = z["list_codes"]
            kwargs["list_codes"] = host["codes"].astype(np.int32)
            kwargs["codebooks"] = jnp.asarray(z["codebooks"])
            if "list_recon_bf16" in z:
                import ml_dtypes

                recon_host = z["list_recon_bf16"].view(ml_dtypes.bfloat16)
                kwargs["list_recon"] = recon_host
                host["payload"] = recon_host
        else:
            vecs_host = z["list_vectors"]
            kwargs["list_vectors"] = vecs_host
            host["payload"] = vecs_host
        return IVFIndex(
            centroids=jnp.asarray(z["centroids"]),
            list_ids=host["ids"],
            list_sizes=jnp.asarray(host["sizes"]),
            params=params,
            ntotal_host=int(host["sizes"].sum()),
            host_arrays=HostArrays(host),
            **kwargs,
        )
