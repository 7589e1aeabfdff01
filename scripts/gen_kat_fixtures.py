"""Generate the committed crypto known-answer fixtures (tests/kat/*.npz).

Run once (python scripts/gen_kat_fixtures.py); the output npz files are
checked in so the test suite validates prefhetch_tpu.crypto against values
computed by the INDEPENDENT textbook implementation
(tests/kat/reference_impl.py) — big-int schoolbook arithmetic, no
RNS/NTT — closing the internal-oracle loop of SURVEY §7.5 without network
access to SEAL/OpenFHE. Every random draw is stored explicitly, so the
fixtures are exact and reproducible.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from kat.reference_impl import TextbookBFV, TextbookCKKS, to_rns  # noqa: E402

from prefhetch_tpu.crypto.params import find_ntt_primes  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "kat")

N = 64            # small ring: schoolbook big-int mult stays instant
T_BITS = 16


def _ternary(rng, n):
    return rng.integers(-1, 2, size=n).astype(np.int64)


def _gauss(rng, n, sigma=3.2):
    return np.round(rng.normal(0, sigma, size=n)).astype(np.int64)


def gen_bfv(rng) -> None:
    qs = find_ntt_primes(N, 30, 2)
    t = 1 << T_BITS
    tb = TextbookBFV(N, t, qs)
    s = _ternary(rng, N)
    a = [int(rng.integers(0, 1 << 62)) % tb.q for _ in range(N)]
    e_pk = _gauss(rng, N)
    b = tb.make_pk([int(x) for x in s], a, [int(x) for x in e_pk])

    m1 = rng.integers(0, t, size=N).astype(np.int64)
    m2 = rng.integers(0, t, size=N).astype(np.int64)
    pt = rng.integers(-8, 9, size=N).astype(np.int64)   # small ct×pt operand

    def enc(m):
        u = _ternary(rng, N)
        e1 = _gauss(rng, N)
        e2 = _gauss(rng, N)
        return tb.encrypt(
            b, a, [int(x) for x in m], [int(x) for x in u],
            [int(x) for x in e1], [int(x) for x in e2],
        )

    c0_1, c1_1 = enc(m1)
    c0_2, c1_2 = enc(m2)
    # homomorphic expectations per the textbook impl
    add_c0 = [(x + y) % tb.q for x, y in zip(c0_1, c0_2)]
    add_c1 = [(x + y) % tb.q for x, y in zip(c1_1, c1_2)]
    m_add = tb.decrypt([int(x) for x in s], add_c0, add_c1)
    mp_c0, mp_c1 = tb.mul_plain(c0_1, c1_1, [int(x) for x in pt])
    m_mulpt = tb.decrypt([int(x) for x in s], mp_c0, mp_c1)

    np.savez(
        os.path.join(OUT, "bfv_kat.npz"),
        n=N, t=t, qs=np.array(qs, np.int64),
        s=s,
        c0_1=to_rns(c0_1, qs), c1_1=to_rns(c1_1, qs),
        c0_2=to_rns(c0_2, qs), c1_2=to_rns(c1_2, qs),
        m1=m1, m2=m2,
        m_add=np.array(m_add, np.int64),
        pt=pt, m_mulpt=np.array(m_mulpt, np.int64),
    )
    print("bfv_kat.npz written:", qs)


def gen_ckks(rng) -> None:
    from prefhetch_tpu.crypto.ckks import CKKSContext
    from prefhetch_tpu.crypto.params import ckks_params_for

    scale_bits = 20
    params = ckks_params_for(N, scale_bits, 2)
    ctx = CKKSContext(params)            # used ONLY for the encoding step
    tb = TextbookCKKS(N, params.qs)

    values = rng.normal(0, 1, size=N // 2)
    pt_coeffs = ctx.encode(values)       # signed ints at scale 2^20

    s = _ternary(rng, N)
    a = [int(rng.integers(0, 1 << 62)) % tb.q for _ in range(N)]
    e_pk = _gauss(rng, N)
    bpk = tb.make_pk([int(x) for x in s], a, [int(x) for x in e_pk])
    u = _ternary(rng, N)
    e1 = _gauss(rng, N)
    e2 = _gauss(rng, N)
    c0, c1 = tb.encrypt(
        bpk, a, [int(x) for x in pt_coeffs], [int(x) for x in u],
        [int(x) for x in e1], [int(x) for x in e2],
    )
    np.savez(
        os.path.join(OUT, "ckks_kat.npz"),
        n=N, scale_bits=scale_bits, qs=np.array(params.qs, np.int64),
        s=s, c0=to_rns(c0, params.qs), c1=to_rns(c1, params.qs),
        values=values,
    )
    print("ckks_kat.npz written:", params.qs)


if __name__ == "__main__":
    rng = np.random.default_rng(20260817)
    gen_bfv(rng)
    gen_ckks(rng)
