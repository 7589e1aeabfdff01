"""Mesh-sharded encrypted services (VERDICT r04 next #4).

The plaintext triage shards since r02 (tests/test_parallel.py); the north
star is encrypted q/s on a v5e-8, so the BFV truncated-MAC re-rank and the
PIR DB fold must produce BIT-equal wires over the mesh. Both kernels are
exact integer modular arithmetic, so "allclose" would hide real bugs —
every assertion here is exact equality against the single-device path.

Reference context: the upstream snapshot reserves the encrypted precise
path (include/client/client_lib.h:28-30) and serves cleartext "PIR"
(src/server/server_lib.cpp:169-196); these services are the TPU-native
realization, here proven mesh-shardable.
"""

import numpy as np
import pytest

from prefhetch_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_trunc_mac_q1_bit_equal(mesh):
    """Row-sharded base + query-sharded MAC == single-device q1 wire,
    bit-for-bit, and the client decrypts exact scores."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from prefhetch_tpu.client.he import HEClient
    from prefhetch_tpu.engine.hecompute import HEComputeService
    from prefhetch_tpu.parallel.mesh import AXIS
    from prefhetch_tpu.parallel.sharded import (
        pad_rows_for_mesh, sharded_trunc_mac_q1,
    )
    from prefhetch_tpu.utils.config import HEParams

    rng = np.random.default_rng(11)
    nbase, d, nq, Pc = 400, 32, 8, 32
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    queries = rng.integers(0, 256, (nq, d)).astype(np.float32)
    idx = np.stack([rng.permutation(nbase)[:Pc] for _ in range(nq)])
    ref = ((base[idx].astype(np.float64) - queries[:, None, :]) ** 2).sum(-1)

    hc = HEClient(HEParams(n=256, sparse_h=48, resp_mod="q1"), seed=5)
    svc = HEComputeService(hc.params, backend="numpy")
    svc.set_base(base)
    cts = [svc.ctx.ct_from_wire(w) for w in hc.encrypt_query_batch(queries)]

    # single-device bundled wire (host oracle path)
    p = svc.params
    B = p.n // d
    nb = -(-Pc // B)
    pad_idx = np.full((nq, nb * B), svc._base_host.shape[0] - 1, np.int32)
    pad_idx[:, :Pc] = idx
    cts_ntt = [svc.ctx.to_ntt(c) if not c.is_ntt else c for c in cts]
    ctq = np.stack(
        [np.stack([c.c0 for c in cts_ntt]),
         np.stack([c.c1 for c in cts_ntt])], axis=1,
    ).astype(np.int32)
    want = np.asarray(svc._trunc_mac_q1_numpy(ctq[:, 0], ctq[:, 1], pad_idx))

    base_pad = pad_rows_for_mesh(svc._base_host, mesh.devices.size)
    base_sh = jax.device_put(
        np.asarray(base_pad), NamedSharding(mesh, P(AXIS))
    )
    got = np.asarray(sharded_trunc_mac_q1(mesh, base_sh, ctq, pad_idx, p))
    np.testing.assert_array_equal(got, want)

    # the sharded wire decrypts to the exact squared distances
    c1w, c0w, norms = svc.trunc_unbundle_q1(
        got, (base[idx].astype(np.int64) ** 2).sum(-1)
    )
    out = hc.decrypt_scores_trunc_q1(c1w, c0w, norms, queries)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_sharded_pir_answer_bit_equal(mesh):
    """DB-sharded dim-1 fold == single-device answer_2d, wire-exact, and
    the client decodes the exact row."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import PIRClient, grid_dims
    from prefhetch_tpu.engine.pir_device import DevicePIR2

    p = pir_params_for(256, 257, 2)
    rng = np.random.default_rng(7)
    nbase, d = 512, 32           # R=8 → G=64, g1=8: divisible by the mesh
    assert grid_dims(p, nbase, d)[1] % mesh.devices.size == 0
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    client = PIRClient(p, seed=9)
    dev = DevicePIR2(base, p)
    dev.register_galois_keys(
        client.key_id, client.galois_keys_wire_2d(nbase, d)
    )
    w, r = client.build_query_2d(301, nbase, d)
    want = dev.answer_2d(w, client.key_id)
    got = dev.answer_2d_sharded(w, client.key_id, mesh)
    assert want.keys() == got.keys()
    for cw, cg in zip(want["cts"], got["cts"]):
        np.testing.assert_array_equal(
            np.asarray(cw["c0"]["b64"]), np.asarray(cg["c0"]["b64"])
        )
        np.testing.assert_array_equal(
            np.asarray(cw["c1"]["b64"]), np.asarray(cg["c1"]["b64"])
        )
    out = client.decode_response_2d(got, d, r)
    np.testing.assert_array_equal(out, np.round(base[301]).astype(np.int64))


def test_sharded_pir_rejects_indivisible_grid(mesh):
    """g1 not divisible by the mesh must fail loudly at dispatch, not
    silently mis-fold."""
    from prefhetch_tpu.crypto.params import pir_params_for
    from prefhetch_tpu.crypto.pir import PIRClient
    from prefhetch_tpu.engine.pir_device import DevicePIR2

    p = pir_params_for(256, 257, 2)
    rng = np.random.default_rng(8)
    nbase, d = 300, 32           # G=38 → g1=7
    base = rng.integers(0, 256, (nbase, d)).astype(np.float32)
    client = PIRClient(p, seed=3)
    dev = DevicePIR2(base, p)
    dev.register_galois_keys(
        client.key_id, client.galois_keys_wire_2d(nbase, d)
    )
    w, _ = client.build_query_2d(5, nbase, d)
    with pytest.raises(ValueError, match="not divisible"):
        dev.answer_2d_sharded(w, client.key_id, mesh)
