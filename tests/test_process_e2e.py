"""Real-process e2e at the reference's file layout (VERDICT r02 item 10).

The reference's only validation mode is two OS processes over localhost
against on-disk fvecs/ivecs files (README.md:36-52, dataset.sh:4-10). This
test automates exactly that: a reference-layout dataset is written to disk,
the server (`python -m prefhetch_tpu.serve.main`) and the client driver
(`python -m prefhetch_tpu.client.driver`) run as separate subprocesses, and
the driver's printed recall/MRR block must match the in-process pipeline's
numbers bit-for-bit.
"""

import json
import os
import re
import signal
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _sub_env():
    env = dict(os.environ)
    # subprocesses must run on CPU: the sandbox sitecustomize forces the
    # TPU platform, which PFH_PLATFORM overrides post-import
    env["PFH_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO_ROOT
    return env


@pytest.fixture(scope="module")
def disk_layout(tmp_path_factory):
    from prefhetch_tpu.data.synthetic import write_sift_style_dataset

    ds = tmp_path_factory.mktemp("refds")
    # reference file layout: {prefix}_{learn,base,query}.fvecs +
    # {prefix}_groundtruth.ivecs (dataset.sh:4-10)
    write_sift_style_dataset(
        str(ds), prefix="siftsyn", nbase=3000, ntrain=4000, nquery=16,
        d=24, n_clusters=24, gt_k=100, seed=31,
    )
    idx_dir = tmp_path_factory.mktemp("idx")
    cfg = {
        "index": {"d": 24, "nlist": 12, "pq_m": 6, "pq_nbits": 8,
                  "kmeans_iters": 5, "pq_kmeans_iters": 5},
        "protocol": {"nprobe": 4, "coarse_probe": 120, "k": 100,
                     "nquery": 5},
        "nbase": 3000,
        "train_path": os.path.join(str(ds), "siftsyn_learn.fvecs"),
        "base_path": os.path.join(str(ds), "siftsyn_base.fvecs"),
        "query_path": os.path.join(str(ds), "siftsyn_query.fvecs"),
        "groundtruth_path": os.path.join(
            str(ds), "siftsyn_groundtruth.ivecs"
        ),
    }
    cfg_path = os.path.join(str(ds), "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return cfg, cfg_path, str(idx_dir)


def _expected_report(cfg, cfg_path, addr):
    """In-process pipeline against the same live server — the oracle the
    subprocess driver's printed block must match."""
    from prefhetch_tpu.client.pipeline import ClientPipeline
    from prefhetch_tpu.data.io import read_ivecs
    from prefhetch_tpu.metrics import benchmark_results
    from prefhetch_tpu.utils.config import PipelineConfig

    with open(cfg_path) as f:
        pcfg = PipelineConfig.from_json(f.read())
    client = ClientPipeline(pcfg, server_addr=addr)
    _, top_ids = client.run()
    gt = read_ivecs(cfg["groundtruth_path"])
    return benchmark_results(top_ids, gt, k=pcfg.protocol.k)


_BLOCK_RE = {
    "recall": re.compile(
        r"Recall@1 = ([\d.eE+-]+), Recall@10 = ([\d.eE+-]+), "
        r"Recall@100 = ([\d.eE+-]+)"
    ),
    "mrr": re.compile(
        r"MRR@1 = ([\d.eE+-]+), MRR@10 = ([\d.eE+-]+), "
        r"MRR@100 = ([\d.eE+-]+)"
    ),
}


@pytest.mark.parametrize("frontend", ["threaded", "native"])
def test_two_process_e2e_matches_in_process(disk_layout, frontend):
    if frontend == "native":
        from prefhetch_tpu import native

        if native.get_http_lib() is None:
            pytest.skip("native http frontend unavailable")
    cfg, cfg_path, idx_dir = disk_layout
    port = _free_port()
    env = _sub_env()
    srv = subprocess.Popen(
        [sys.executable, "-m", "prefhetch_tpu.serve.main",
         "--config", cfg_path, "--port", str(port),
         "--index-dir", idx_dir, "--frontend", frontend],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=REPO_ROOT,
    )
    try:
        deadline = time.time() + 180
        up = False
        while time.time() < deadline:
            if srv.poll() is not None:
                out = srv.stdout.read().decode(errors="replace")
                raise AssertionError(f"server died:\n{out[-2000:]}")
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=2
                ) as r:
                    if r.status == 200:
                        up = True
                        break
            except OSError:
                time.sleep(0.5)
        assert up, "server did not come up in 180s"

        addr = f"http://127.0.0.1:{port}/"
        exp = _expected_report(cfg, cfg_path, addr)

        cli = subprocess.run(
            [sys.executable, "-m", "prefhetch_tpu.client.driver",
             "--config", cfg_path, "--server", addr],
            capture_output=True, env=env, cwd=REPO_ROOT, timeout=300,
        )
        out = (cli.stdout + cli.stderr).decode(errors="replace")
        assert cli.returncode == 0, out[-2000:]
        # the reference's latency print is part of the contract
        assert "Time taken for client queries" in out
        m_r = _BLOCK_RE["recall"].search(out)
        m_m = _BLOCK_RE["mrr"].search(out)
        assert m_r and m_m, f"no recall/MRR block in driver output:\n{out}"
        got_r = [float(x) for x in m_r.groups()]
        got_m = [float(x) for x in m_m.groups()]
        np.testing.assert_allclose(
            got_r, [exp.recall_1, exp.recall_10, exp.recall_100], atol=1e-9
        )
        np.testing.assert_allclose(
            got_m, [exp.mrr_1, exp.mrr_10, exp.mrr_100], atol=1e-9
        )
    finally:
        srv.send_signal(signal.SIGTERM)
        try:
            srv.wait(timeout=10)
        except subprocess.TimeoutExpired:
            srv.kill()
