"""Multi-host sharded serving: a REAL 2-process jax.distributed cluster.

Two subprocesses each own 4 virtual CPU devices; the global 8-device mesh
spans both, and the sharded coarse scan + exact re-rank run with gloo
cross-process collectives. Results are asserted against a numpy oracle in
every process. This is the closest multi-host evidence obtainable without
multi-host hardware (SURVEY.md §5.8; parallel/multihost.py)."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r'''
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
port = sys.argv[2]
import numpy as np
from prefhetch_tpu.parallel.multihost import (
    init_multihost, shard_array_global, shard_index_multihost,
)

mesh = init_multihost(f"localhost:{port}", 2, pid)
assert mesh.devices.size == 8, mesh.devices.size

from jax.sharding import PartitionSpec as P
from prefhetch_tpu.data.synthetic import make_clustered_dataset
from prefhetch_tpu.index.build import build_ivf_index
from prefhetch_tpu.parallel.sharded import sharded_coarse_scan, sharded_rerank
from prefhetch_tpu.utils.config import IndexParams

# identical deterministic build in every process
data = make_clustered_dataset(
    nbase=1600, ntrain=1600, nquery=4, d=32, n_clusters=16, gt_k=10, seed=5
)
params = IndexParams(d=32, nlist=16, pq_m=0, kmeans_iters=5)
index = build_ivf_index(data["train"], data["base"], params)
sharded = shard_index_multihost(index, mesh)

q = data["query"][:4].astype(np.float32)
cent = np.asarray(index.centroids)
d2c = ((q[:, None, :] - cent[None]) ** 2).sum(-1)
probes = np.argsort(d2c, axis=1)[:, :4]

import jax.numpy as jnp
res = sharded_coarse_scan(
    mesh, sharded,
    shard_array_global(q, mesh, P()),
    shard_array_global(probes.astype(np.int32), mesh, P()),
)
dist = np.asarray(res.distances)
ids = np.asarray(res.ids)
mask = np.asarray(res.mask)

# numpy oracle: every candidate in the probed lists, exact L2
list_ids = np.asarray(index.list_ids)
list_sizes = np.asarray(index.list_sizes)
base = data["base"]
for qi in range(4):
    got = {
        int(i): float(dv)
        for i, dv, m in zip(ids[qi], dist[qi], mask[qi]) if m
    }
    want_ids = []
    for pr in probes[qi]:
        want_ids.extend(list_ids[pr, : list_sizes[pr]].tolist())
    assert set(got.keys()) == set(int(v) for v in want_ids), qi
    for i in got:
        ref = float(((base[i] - q[qi]) ** 2).sum())
        assert abs(got[i] - ref) < 1e-2 * max(ref, 1.0), (qi, i)

# sharded exact re-rank over the row-sharded base
nb = base.shape[0]
base_g = shard_array_global(base.astype(np.float32), mesh, P("lists"))
cand = np.argsort(d2c, axis=1)[:, :1]  # placeholder shape
cand = np.tile(np.arange(32)[None], (4, 1)).astype(np.int32)
pd = np.asarray(sharded_rerank(
    mesh, base_g,
    shard_array_global(q, mesh, P()),
    shard_array_global(cand, mesh, P()),
))
ref = ((base[cand[0]][None] - q[:, None, :]) ** 2).sum(-1)
assert np.allclose(pd, ref, rtol=1e-3, atol=0.5)

print(f"pid{pid}: MULTIHOST_OK", flush=True)
'''


@pytest.mark.skipif(
    os.environ.get("PFH_SKIP_MULTIHOST") == "1",
    reason="multi-process cluster test disabled",
)
def test_two_process_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=repo_root,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid{pid} failed:\n{out[-3000:]}"
        assert f"pid{pid}: MULTIHOST_OK" in out, out[-3000:]
