"""Device CKKS scoring (engine/ckks_device.py) vs the host CKKSContext.

All CKKS arithmetic is exact integer RNS work — the device pipeline must
reproduce the host service BIT-FOR-BIT, not approximately. Small N keeps
the O(N²) MXU-formulation NTT fast on the CPU test backend."""

import numpy as np
import pytest

from prefhetch_tpu.crypto.ckks import CKKSContext
from prefhetch_tpu.crypto.params import CKKSParams, find_ntt_primes
from numpy.random import default_rng as insecure_rng
from prefhetch_tpu.engine.ckks_device import DeviceCKKS
from prefhetch_tpu.engine.hecompute import CKKSComputeService

N = 256
D = 32           # candidate dimension (slots/D = 4 per block)
LIMBS = 3


@pytest.fixture(scope="module")
def setup():
    params = CKKSParams(
        n=N, scale_bits=20, qs=tuple(find_ntt_primes(N, 30, LIMBS))
    )
    rng = insecure_rng(7)
    ctx = CKKSContext(params)
    sk, pk = ctx.keygen(rng)
    steps = []
    r = D // 2
    while r >= 1:
        steps.append(r)
        r //= 2
    gks = ctx.galois_keygen(sk, steps, rng)
    gks_wire = {str(s): k.to_wire() for s, k in gks.items()}
    return params, ctx, sk, pk, gks_wire, rng


def _encrypt_query(ctx, pk, q, rng):
    slots = ctx.params.n // 2
    rep = np.tile(q, slots // len(q))
    return ctx.encrypt(pk, ctx.encode(rep), rng)


def test_device_matches_host_service_bitexact(setup):
    params, ctx, sk, pk, gks_wire, rng = setup
    q = insecure_rng(1).integers(0, 30, size=D).astype(np.float64)
    cands = insecure_rng(2).integers(0, 30, size=(10, D)).astype(np.float64)
    ct = _encrypt_query(ctx, pk, q, rng)

    host = CKKSComputeService(params)
    host.register_keys("k", gks_wire)
    host_cts, host_norms = host.encrypted_scores(ct, cands, "k")

    dev = DeviceCKKS(params)
    dev.register_keys("k", gks_wire)
    dev_cts, dev_norms = dev.encrypted_scores(ct, cands, "k")

    assert len(dev_cts) == len(host_cts)
    np.testing.assert_array_equal(dev_norms, host_norms)
    for hc, dc in zip(host_cts, dev_cts):
        assert dc.level == hc.level
        assert abs(dc.scale - hc.scale) < 1e-6 * hc.scale
        np.testing.assert_array_equal(dc.c0, hc.c0)
        np.testing.assert_array_equal(dc.c1, hc.c1)


def test_device_scores_decrypt_to_inner_products(setup):
    params, ctx, sk, pk, gks_wire, rng = setup
    q = insecure_rng(3).integers(0, 30, size=D).astype(np.float64)
    cands = insecure_rng(4).integers(0, 30, size=(7, D)).astype(np.float64)
    ct = _encrypt_query(ctx, pk, q, rng)

    dev = DeviceCKKS(params)
    dev.register_keys("k", gks_wire)
    out_cts, _ = dev.encrypted_scores(ct, cands, "k")

    slots = params.n // 2
    per_ct = slots // D
    got = []
    for c in out_cts:
        vals = np.real(ctx.decrypt(sk, c))
        for j in range(per_ct):
            got.append(vals[j * D])     # rotate-left sum lands at slot j·d
    got = np.array(got[: len(cands)])
    ref = cands @ q
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=0.5)


def test_device_batch_matches_per_query(setup):
    """encrypted_scores_batch(nq=3) must equal three independent
    single-query calls limb-for-limb."""
    params, ctx, sk, pk, gks_wire, rng = setup
    dev = DeviceCKKS(params)
    dev.register_keys("k", gks_wire)
    qs = insecure_rng(5).integers(0, 30, size=(3, D)).astype(np.float64)
    cands = insecure_rng(6).integers(0, 30, size=(3, 6, D)).astype(np.float64)
    cts = [_encrypt_query(ctx, pk, q, rng) for q in qs]

    batch_res, batch_norms = dev.encrypted_scores_batch(cts, cands, "k")
    for i in range(3):
        solo_cts, solo_norms = dev.encrypted_scores(cts[i], cands[i], "k")
        np.testing.assert_array_equal(batch_norms[i], solo_norms)
        for bc, sc in zip(batch_res[i], solo_cts):
            np.testing.assert_array_equal(bc.c0, sc.c0)
            np.testing.assert_array_equal(bc.c1, sc.c1)


def test_device_missing_key_raises(setup):
    params, ctx, sk, pk, gks_wire, rng = setup
    dev = DeviceCKKS(params)
    partial = {k: v for k, v in gks_wire.items() if int(k) != 1}
    dev.register_keys("k", partial)
    q = np.ones(D)
    ct = _encrypt_query(ctx, pk, q, rng)
    with pytest.raises(ValueError, match="missing Galois key"):
        dev.encrypted_scores(ct, np.ones((3, D)), "k")


def test_combined_single_ct_device_matches_host_and_decodes():
    """Combined single-ct response: device program == host oracle
    bit-for-bit, and the one level-1 ct decodes to the inner products at
    the combined slot layout (j·d + b).

    Own params at the PRODUCTION scale (2^26): the combined path's final
    effective scale is ct·ctx·mask/(q2·q1·cand) = 2^(3·26+29-2·30-16); at
    the module's 2^20 that is 2^-7 (noise amplified 128× at decode), at
    2^26 it is 2^5 — the operating regime the feature ships at."""
    from prefhetch_tpu.crypto.ckks import extract_combined_ips

    params = CKKSParams(
        n=N, scale_bits=26, qs=tuple(find_ntt_primes(N, 30, LIMBS))
    )
    rng = insecure_rng(7)
    ctx = CKKSContext(params)
    sk, pk = ctx.keygen(rng)
    steps = []
    r = D // 2
    while r >= 1:
        steps.append(r)
        r //= 2
    # combine-tree keys on top of the IP-tree keys
    n_blocks = 4                      # P=10, per_ct=4 → padded to 4 blocks
    tree_steps = ctx.combine_tree_steps(n_blocks, D)
    gks = ctx.galois_keygen(sk, steps + tree_steps, rng)
    gks_all = {str(s): k.to_wire() for s, k in gks.items()}

    q = insecure_rng(5).integers(0, 30, size=D).astype(np.float64)
    cands = insecure_rng(6).integers(0, 30, size=(10, D)).astype(np.float64)
    ct = _encrypt_query(ctx, pk, q, rng)

    host = CKKSComputeService(params)
    host.register_keys("k", gks_all)
    h_ct, h_norms = host.encrypted_scores_combined(ct, cands, "k")

    dev = DeviceCKKS(params)
    dev.register_keys("k", gks_all)
    d_cts, d_norms = dev.encrypted_scores_combined_batch(
        [ct], cands[None], "k"
    )
    d_ct = d_cts[0]

    assert d_ct.level == 1 and h_ct.level == 1
    assert abs(d_ct.scale - h_ct.scale) < 1e-6 * abs(h_ct.scale)
    np.testing.assert_array_equal(d_ct.c0, h_ct.c0)
    np.testing.assert_array_equal(d_ct.c1, h_ct.c1)
    np.testing.assert_array_equal(d_norms[0], h_norms)

    ips = extract_combined_ips(ctx.decrypt(sk, d_ct), 10, D)
    ref = cands @ q
    # small-N/small-Δ test config: scoring-grade accuracy only (the bench
    # measures the production-scale error)
    assert np.abs(ips - ref).max() <= max(2e-2 * np.abs(ref).max(), 1.0)

    # seedTf wire: c1 regenerated INSIDE the device program from the
    # 8-byte threefry key must give the SAME result ct as the expanded
    # form of the same wire
    slots = params.n // 2
    w = ctx.encrypt_symmetric_tf(
        sk, ctx.encode(np.tile(q, slots // D)), rng
    )
    e_cts, e_norms = dev.encrypted_scores_combined_batch(
        [ctx.ct_from_wire(w)], cands[None], "k"
    )
    s_cts, s_norms = dev.encrypted_scores_combined_batch(
        [w], cands[None], "k"
    )
    np.testing.assert_array_equal(e_cts[0].c0, s_cts[0].c0)
    np.testing.assert_array_equal(e_cts[0].c1, s_cts[0].c1)
    np.testing.assert_array_equal(e_norms, s_norms)

    # parked-base gather mode (set_base + [nq, P] int32 ids): gather,
    # norms, and encode all move into the device program — must equal the
    # row-upload dev-encode path BIT-FOR-BIT (same f32 slot_rows: the
    # power-of-two cand_scale multiply is exact in both)
    import os as _os

    _os.environ["PFH_CKKS_DEV_ENCODE"] = "1"
    try:
        r_cts, r_norms = dev.encrypted_scores_combined_batch(
            [w], cands[None], "k"
        )
        dev.set_base(cands.astype(np.float32))
        g_cts, g_norms = dev.encrypted_scores_combined_batch(
            [w], np.arange(10, dtype=np.int32)[None], "k"
        )
    finally:
        del _os.environ["PFH_CKKS_DEV_ENCODE"]
    np.testing.assert_array_equal(g_cts[0].c0, r_cts[0].c0)
    np.testing.assert_array_equal(g_cts[0].c1, r_cts[0].c1)
    np.testing.assert_array_equal(g_norms, r_norms)


def test_digit_bits_negotiated_from_key_wire(setup, monkeypatch):
    """A client whose Galois keys were generated at 30-bit key-switch
    digits must be served correctly by a server running the default
    15-bit config: the digit width travels in the key wire
    (GaloisKey.digitBits, like BFV's RelinKey) — NOT via the
    PFH_CKKS_DIGIT_BITS env, which used to silently desynchronize the
    parties (VERDICT r03 weak #6)."""
    import prefhetch_tpu.crypto.ckks as ckks_mod

    params, ctx, sk, pk, _, rng = setup
    steps = []
    r = D // 2
    while r >= 1:
        steps.append(r)
        r //= 2
    # client side: keygen at 30-bit digits
    monkeypatch.setattr(ckks_mod, "DIGIT_BITS", 30)
    gks30 = ctx.galois_keygen(sk, steps, insecure_rng(11))
    monkeypatch.undo()                      # server back at default 15
    wire30 = {str(s): k.to_wire() for s, k in gks30.items()}
    assert all(w["digitBits"] == 30 for w in wire30.values())

    q = insecure_rng(12).integers(0, 30, size=D).astype(np.float64)
    cands = insecure_rng(13).integers(0, 30, size=(6, D)).astype(np.float64)
    ct = _encrypt_query(ctx, pk, q, rng)

    host = CKKSComputeService(params)
    host.register_keys("k30", wire30)
    host_cts, _ = host.encrypted_scores(ct, cands, "k30")

    dev = DeviceCKKS(params)
    dev.register_keys("k30", wire30)
    assert dev._key_digits["k30"] == 30
    dev_cts, _ = dev.encrypted_scores(ct, cands, "k30")
    for hc, dc in zip(host_cts, dev_cts):
        np.testing.assert_array_equal(dc.c0, hc.c0)
        np.testing.assert_array_equal(dc.c1, hc.c1)

    # and the scores decrypt to the true inner products
    slots = params.n // 2
    per_ct = slots // D
    out = np.real(ctx.decrypt(sk, host_cts[0]))
    want = cands[: per_ct] @ q
    got = out[np.arange(min(per_ct, len(cands))) * D]
    np.testing.assert_allclose(got, want[: len(got)], rtol=0.02, atol=0.5)


def test_mismatched_digit_bits_key_rejected(setup):
    """Keys whose component count disagrees with their declared digitBits
    must be rejected at registration (shape validation)."""
    params, ctx, sk, pk, gks_wire, rng = setup
    bad = {k: dict(v) for k, v in gks_wire.items()}
    for v in bad.values():
        v["digitBits"] = 30          # shape says 15-bit components
    dev = DeviceCKKS(params)
    with pytest.raises(ValueError, match="digitBits"):
        dev.register_keys("bad", bad)


def test_encode_matrix_real_matches_encode(setup):
    """crypto/ckks.encode_matrix_real: the [N/2, N] linear form must
    reproduce encode() BIT-EXACTLY for real slot vectors at f64 (the
    device path then evaluates it in f32 on the MXU — covered by the
    dev-encode parity test below)."""
    params, ctx, sk, pk, gks_wire, rng = setup
    M = ctx.encode_matrix_real().astype(np.float64)
    z = insecure_rng(11).normal(size=(4, params.n // 2)) * 4e-3
    ref = ctx.encode(z)
    got = np.round((z @ M) * ctx.scale).astype(np.int64)
    np.testing.assert_array_equal(ref, got)


def test_combined_dev_encode_matches_host_encode(setup, monkeypatch):
    """PFH_CKKS_DEV_ENCODE=1 (the TPU default): candidates travel as raw
    f32 slots and the encode runs as a device matmul — the result ct must
    match the host-encoded path at this scale (small coeffs: the f32
    matmul rounds to the same integers; at production scale the bench
    reports the residual error instead)."""
    params, ctx, sk, pk, gks_wire, rng = setup
    q = insecure_rng(21).integers(0, 30, size=D).astype(np.float64)
    cands = insecure_rng(22).integers(0, 30, size=(10, D)).astype(np.float64)
    ct = _encrypt_query(ctx, pk, q, rng)
    steps = []
    r = D // 2
    while r >= 1:
        steps.append(r)
        r //= 2
    n_blocks = 4
    tree_steps = ctx.combine_tree_steps(n_blocks, D)
    gks = ctx.galois_keygen(sk, steps + tree_steps, rng)
    gks_all = {str(s): k.to_wire() for s, k in gks.items()}

    dev = DeviceCKKS(params)
    dev.register_keys("k", gks_all)
    monkeypatch.setenv("PFH_CKKS_DEV_ENCODE", "0")
    h_cts, h_norms = dev.encrypted_scores_combined_batch(
        [ct], cands[None], "k"
    )
    monkeypatch.setenv("PFH_CKKS_DEV_ENCODE", "1")
    d_cts, d_norms = dev.encrypted_scores_combined_batch(
        [ct], cands[None], "k"
    )
    np.testing.assert_array_equal(d_cts[0].c0, h_cts[0].c0)
    np.testing.assert_array_equal(d_cts[0].c1, h_cts[0].c1)
    np.testing.assert_array_equal(d_norms, h_norms)
