"""Independent textbook RLWE implementation for known-answer tests.

SURVEY §7.5 calls for NTT/modmul cross-checks against an external
SEAL/OpenFHE run; this sandbox has neither, so the external oracle is this
deliberately-different implementation: pure Python big integers, schoolbook
negacyclic polynomial multiplication, a single composite modulus q = Π qs
(no RNS), no NTT anywhere. It shares NOTHING with prefhetch_tpu.crypto
except the parameter values — an agreement between the two is evidence the
production RNS/NTT arithmetic is right, not merely self-consistent.

Used two ways (tests/test_crypto_kat.py):
- the committed fixtures (tests/kat/*.npz) were generated ONCE with this
  implementation (scripts/gen_kat_fixtures.py) and pin the expected values;
- the test also runs this implementation live in the reverse direction
  (production encrypt → textbook decrypt).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def negacyclic_mul(a: Sequence[int], b: Sequence[int], q: int) -> List[int]:
    """Schoolbook product in Z_q[x]/(x^n + 1) — big ints, O(n²)."""
    n = len(a)
    out = [0] * n
    for i, ai in enumerate(a):
        if ai == 0:
            continue
        for j, bj in enumerate(b):
            k = i + j
            p = ai * bj
            if k < n:
                out[k] += p
            else:
                out[k - n] -= p
    return [c % q for c in out]


def poly_add(a: Sequence[int], b: Sequence[int], q: int) -> List[int]:
    return [(x + y) % q for x, y in zip(a, b)]


def to_rns(coeffs: Sequence[int], qs: Sequence[int]) -> np.ndarray:
    """Big-int coefficients → [L, N] int64 residues (the production ct
    layout, crypto/bfv.py Ciphertext)."""
    return np.array(
        [[int(c) % qi for c in coeffs] for qi in qs], np.int64
    )


def from_rns(rns: np.ndarray, qs: Sequence[int]) -> List[int]:
    """[L, N] residues → big-int coefficients in [0, q) by CRT."""
    q = 1
    for qi in qs:
        q *= int(qi)
    out = [0] * rns.shape[1]
    for i, qi in enumerate(qs):
        qi = int(qi)
        hat = q // qi
        inv = pow(hat % qi, -1, qi)
        for j in range(rns.shape[1]):
            out[j] = (out[j] + int(rns[i, j]) * hat * inv) % q
    return out


def centered(c: int, q: int) -> int:
    return c - q if c > q // 2 else c


class TextbookBFV:
    """Textbook RNS-free BFV over q = Π qs: keygen inputs are explicit
    (the caller supplies every random draw, so fixtures are exact)."""

    def __init__(self, n: int, t: int, qs: Sequence[int]):
        self.n, self.t, self.qs = n, t, [int(x) for x in qs]
        self.q = 1
        for qi in self.qs:
            self.q *= qi
        self.delta = self.q // t

    def make_pk(self, s: Sequence[int], a: Sequence[int], e: Sequence[int]):
        """b = -(a·s + e) mod q."""
        q = self.q
        as_ = negacyclic_mul(a, [x % q for x in s], q)
        b = [(-(x + y)) % q for x, y in zip(as_, [x % q for x in e])]
        return b

    def encrypt(self, b, a, m, u, e1, e2):
        """c0 = b·u + e1 + Δ·m ; c1 = a·u + e2 (all mod q)."""
        q = self.q
        u = [x % q for x in u]
        c0 = negacyclic_mul(b, u, q)
        c0 = [
            (x + (e % q) + self.delta * (mm % self.t)) % q
            for x, e, mm in zip(c0, e1, m)
        ]
        c1 = negacyclic_mul(a, u, q)
        c1 = [(x + (e % q)) % q for x, e in zip(c1, e2)]
        return c0, c1

    def decrypt(self, s, c0, c1) -> List[int]:
        """m = round(t/q · [c0 + c1·s]_q) mod t."""
        q = self.q
        v = poly_add(c0, negacyclic_mul(c1, [x % q for x in s], q), q)
        out = []
        for x in v:
            # round(t·x/q) with exact integer arithmetic
            out.append(((self.t * x + q // 2) // q) % self.t)
        return out

    def mul_plain(self, c0, c1, pt):
        """ct × plaintext poly (no scaling — pt holds small ints)."""
        q = self.q
        ptq = [x % q for x in pt]
        return (
            negacyclic_mul(c0, ptq, q),
            negacyclic_mul(c1, ptq, q),
        )


class TextbookCKKS:
    """Textbook CKKS over q = Π qs: encrypt at full level, no rescaling."""

    def __init__(self, n: int, qs: Sequence[int]):
        self.n, self.qs = n, [int(x) for x in qs]
        self.q = 1
        for qi in self.qs:
            self.q *= qi

    def make_pk(self, s, a, e):
        q = self.q
        as_ = negacyclic_mul(a, [x % q for x in s], q)
        return [(-(x + y)) % q for x, y in zip(as_, [x % q for x in e])]

    def encrypt(self, b, a, pt_coeffs, u, e1, e2):
        """pt_coeffs: signed ints (already scaled by the CKKS scale)."""
        q = self.q
        u = [x % q for x in u]
        c0 = negacyclic_mul(b, u, q)
        c0 = [(x + (e % q) + (p % q)) % q for x, e, p in zip(c0, e1, pt_coeffs)]
        c1 = negacyclic_mul(a, u, q)
        c1 = [(x + (e % q)) % q for x, e in zip(c1, e2)]
        return c0, c1

    def decrypt(self, s, c0, c1) -> List[int]:
        """→ signed coefficients (centered mod q)."""
        q = self.q
        v = poly_add(c0, negacyclic_mul(c1, [x % q for x in s], q), q)
        return [centered(x, q) for x in v]
