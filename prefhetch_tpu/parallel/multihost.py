"""Multi-host distributed serving: a global mesh spanning processes.

The single-host path (parallel/mesh.py + parallel/sharded.py) shards the
index over the chips one process owns, with collectives riding ICI. This
module extends the same layout across HOSTS: every serving process joins a
jax.distributed cluster, the mesh covers all processes' devices, and the
identical shard_map kernels run unchanged — XLA routes the all_gather/psum
legs over ICI within a host and DCN (or gloo on CPU) between hosts.

Serving topology: every host runs the same engine + HTTP frontend and can
accept any request (queries are replicated; only index shards are local).
A fronting load balancer replaces nothing in the protocol — the privacy
boundary stays the client↔cluster HTTP hop.

Reference baseline: none — the reference is a single process
(SURVEY.md §2.4); this is net-new capability mandated by the north star.

Testable without hardware: tests/test_multihost.py runs a 2-process
jax.distributed cluster on the CPU backend (4 virtual devices per process,
gloo collectives) and asserts the sharded services match a numpy oracle.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def init_multihost(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[Sequence[int]] = None,
):
    """Join the jax.distributed cluster and return the GLOBAL 1-D mesh.

    Call once per process before any other jax backend touch. Coordinator
    is "host:port" of process 0. After this, jax.devices() is global and
    the returned mesh spans every host's devices."""
    import jax

    from prefhetch_tpu.parallel.mesh import make_mesh

    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(
        coordinator, num_processes=num_processes, process_id=process_id,
        **kwargs,
    )
    return make_mesh()


def shard_array_global(x: np.ndarray, mesh, spec) -> "object":
    """Host numpy → global sharded jax.Array in a multi-process runtime.

    Every process calls this with the SAME full array (each keeps only its
    addressable shards). make_array_from_callback slices per shard, so no
    process materializes remote shards on device."""
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        x.shape, sharding, lambda idx: np.ascontiguousarray(x[idx])
    )


def shard_index_multihost(index, mesh):
    """Multi-host twin of parallel.sharded.shard_index: index arrays are
    list-sharded / replicated across the GLOBAL mesh via per-shard
    callbacks (device_put of a host array to a cross-process sharding is
    not portable; the callback form is)."""
    from jax.sharding import PartitionSpec as P

    from prefhetch_tpu.index.types import IVFIndex
    from prefhetch_tpu.parallel.mesh import AXIS

    ndev = mesh.devices.size
    if index.nlist % ndev != 0:
        raise ValueError(
            f"nlist={index.nlist} not divisible by {ndev} devices"
        )
    row = P(AXIS)
    rep = P()

    def put(x, spec):
        return shard_array_global(np.asarray(x), mesh, spec)

    kw = {}
    if index.list_vectors is not None:
        kw["list_vectors"] = put(index.list_vectors, row)
    if index.list_codes is not None:
        kw["list_codes"] = put(index.list_codes, row)
        kw["codebooks"] = put(index.codebooks, rep)
    if index.list_recon is not None:
        kw["list_recon"] = put(index.list_recon, row)
    if index.list_norms is not None:
        kw["list_norms"] = put(index.list_norms, row)
    return IVFIndex(
        centroids=put(index.centroids, rep),
        list_ids=put(index.list_ids, row),
        list_sizes=put(index.list_sizes, row),
        params=index.params,
        **kw,
    )
