"""RNS-BFV homomorphic encryption.

Implements the scheme the reference linked SEAL for but never wired up
(reference: CMakeLists.txt:33-38, include/client/client_lib.h:14,28-30):
keygen / encrypt / decrypt on the client side, additions and
ciphertext×plaintext products (the encrypted-distance MACs) on the server
side. Ciphertexts are (c0, c1) pairs of RNS limb tensors [L, N] int64; the
server-side hot path operates entirely in the NTT domain so one candidate
block costs one pointwise modular multiply per limb.

Security note: parameters follow the standard HE security tables
(N=4096, log q ≈ 60 → >128-bit classical security); error σ=3.2 centered
binomial; ternary secrets.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from prefhetch_tpu.crypto.ntt import NTTTables, build_tables, intt, ntt
from prefhetch_tpu.crypto.params import BFVParams


@dataclasses.dataclass
class SecretKey:
    s_rns: np.ndarray        # [L, N] int64 — s mod q_i


@dataclasses.dataclass
class PublicKey:
    b_rns: np.ndarray        # [L, N] — b = -(a·s + e) mod q_i
    a_rns: np.ndarray        # [L, N]


@dataclasses.dataclass
class Ciphertext:
    """BFV ciphertext (c0, c1); is_ntt marks NTT-domain representation."""

    c0: np.ndarray           # [L, N] int64
    c1: np.ndarray           # [L, N] int64
    is_ntt: bool = False

    def to_wire(self) -> dict:
        """JSON-serializable form for the HTTP protocol.

        Residues are < 2^30, so limbs travel as base64 little-endian uint32 —
        ~43KB per N=4096 2-limb ciphertext instead of ~1MB of JSON digits.
        """
        import base64

        def enc(x):
            return base64.b64encode(
                np.ascontiguousarray(x.astype("<u4")).tobytes()
            ).decode()

        return {
            "c0": enc(self.c0),
            "c1": enc(self.c1),
            "shape": list(self.c0.shape),
            "isNtt": self.is_ntt,
        }

    @staticmethod
    def from_wire(obj: dict) -> "Ciphertext":
        import base64

        shape = tuple(obj["shape"])

        def dec(s):
            return np.frombuffer(
                base64.b64decode(s), dtype="<u4"
            ).astype(np.int64).reshape(shape)

        return Ciphertext(
            c0=dec(obj["c0"]), c1=dec(obj["c1"]),
            is_ntt=bool(obj.get("isNtt", False)),
        )


def _sample_ternary(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(-1, 2, size=n).astype(np.int64)


def _sample_error(rng: np.random.Generator, n: int, sigma: float = 3.2) -> np.ndarray:
    """Centered binomial approximation of a discrete gaussian (σ≈3.2)."""
    k = 21  # CB(21) has σ = sqrt(21/2) ≈ 3.24
    bits = rng.integers(0, 2, size=(n, 2, k))
    return (bits[:, 0].sum(-1) - bits[:, 1].sum(-1)).astype(np.int64)


class BFVContext:
    """Parameter-bound operations. Host (numpy) implementation — the client
    side and the correctness oracle; engine/hecompute.py holds the batched
    jitted TPU path for the server's ct×pt MACs."""

    def __init__(self, params: BFVParams):
        self.params = params
        self.tables: List[NTTTables] = [
            build_tables(q, params.n) for q in params.qs
        ]
        self._delta = np.array(params.delta_rns(), np.int64)  # [L]

    # -- helpers --------------------------------------------------------
    def _to_rns(self, coeffs: Sequence[int]) -> np.ndarray:
        """Signed/big-int coefficient vector → [L, N] residues."""
        out = np.empty((len(self.params.qs), self.params.n), np.int64)
        arr = np.asarray(coeffs, dtype=object)
        for i, q in enumerate(self.params.qs):
            out[i] = np.array([int(c) % q for c in arr], np.int64)
        return out

    def _rns_small(self, small: np.ndarray) -> np.ndarray:
        """Small signed int64 vector → [L, N] residues (no big ints)."""
        qs = np.array(self.params.qs, np.int64)[:, None]
        return np.mod(small[None, :].astype(np.int64), qs)

    def _polymul(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """[L, N] ⊙ [L, N] negacyclic product, per limb (pure numpy —
        client-party code never touches an accelerator)."""
        out = np.empty_like(a)
        for i, tb in enumerate(self.tables):
            out[i] = intt(ntt(a[i], tb) * ntt(b[i], tb) % tb.q, tb)
        return out

    def ntt_fwd(self, x: np.ndarray) -> np.ndarray:
        return np.stack([ntt(x[i], tb) for i, tb in enumerate(self.tables)])

    def ntt_inv(self, x: np.ndarray) -> np.ndarray:
        return np.stack([intt(x[i], tb) for i, tb in enumerate(self.tables)])

    # -- keygen ---------------------------------------------------------
    def keygen(self, rng: np.random.Generator) -> Tuple[SecretKey, PublicKey]:
        p = self.params
        s = _sample_ternary(rng, p.n)
        e = _sample_error(rng, p.n)
        # 'a' must be one ring element mod q = Π q_i: sample big-int coeffs
        a_int = [int(rng.integers(0, 1 << 62)) % p.q for _ in range(p.n)]
        a_rns = self._to_rns(a_int)
        s_rns = self._rns_small(s)
        e_rns = self._rns_small(e)
        qs = np.array(p.qs, np.int64)[:, None]
        b_rns = np.mod(-(self._polymul(a_rns, s_rns) + e_rns), qs)
        return SecretKey(s_rns=s_rns), PublicKey(b_rns=b_rns, a_rns=a_rns)

    # -- encrypt / decrypt ----------------------------------------------
    def encrypt(
        self, pk: PublicKey, m: np.ndarray, rng: np.random.Generator
    ) -> Ciphertext:
        """m: [N] ints in [0, t)."""
        p = self.params
        assert m.shape == (p.n,)
        u = self._rns_small(_sample_ternary(rng, p.n))
        e1 = self._rns_small(_sample_error(rng, p.n))
        e2 = self._rns_small(_sample_error(rng, p.n))
        qs = np.array(p.qs, np.int64)[:, None]
        dm = self._delta[:, None] * np.mod(
            m[None, :].astype(np.int64), p.t
        ) % qs
        c0 = np.mod(self._polymul(pk.b_rns, u) + e1 + dm, qs)
        c1 = np.mod(self._polymul(pk.a_rns, u) + e2, qs)
        return Ciphertext(c0=c0, c1=c1)

    def encrypt_batch(
        self, pk: PublicKey, ms: np.ndarray, rng: np.random.Generator
    ) -> List[Ciphertext]:
        """Encrypt B plaintexts [B, N] at once (batched NTTs)."""
        p = self.params
        B = ms.shape[0]
        qs = np.array(p.qs, np.int64)[:, None, None]          # [L,1,1]
        u = np.stack([_sample_ternary(rng, p.n) for _ in range(B)])
        e1 = np.stack([_sample_error(rng, p.n) for _ in range(B)])
        e2 = np.stack([_sample_error(rng, p.n) for _ in range(B)])
        u_rns = np.mod(u[None], qs)                           # [L, B, N]
        e1_rns = np.mod(e1[None], qs)
        e2_rns = np.mod(e2[None], qs)
        dm = self._delta[:, None, None] * np.mod(
            ms[None].astype(np.int64), p.t
        ) % qs
        c0 = np.empty((B, len(p.qs), p.n), np.int64)
        c1 = np.empty_like(c0)
        for i, tb in enumerate(self.tables):
            qi = tb.q
            b_ntt = ntt(pk.b_rns[i], tb)
            a_ntt = ntt(pk.a_rns[i], tb)
            u_ntt = ntt(u_rns[i], tb)                         # [B, N]
            c0[:, i] = (intt(b_ntt[None] * u_ntt % qi, tb) + e1_rns[i] + dm[i]) % qi
            c1[:, i] = (intt(a_ntt[None] * u_ntt % qi, tb) + e2_rns[i]) % qi
        return [Ciphertext(c0=c0[b], c1=c1[b]) for b in range(B)]

    def decrypt(self, sk: SecretKey, ct: Ciphertext) -> np.ndarray:
        """Returns plaintext [N] ints in [0, t).

        Rounding m = round(t·v/q) is done via the CRT fraction identity
        v/q ≡ Σ_i (v_i·[q̂_i⁻¹]_{q_i} mod q_i)/q_i (mod 1) — fully
        vectorized float64, no big-int loop. float64 carries 53 bits ≫
        log2(t)+margin, so the rounding is exact whenever the noise is not
        within ~2^-28·q of a boundary (far beyond decryption failure)."""
        ct = self.from_ntt(ct) if ct.is_ntt else ct
        p = self.params
        qs = np.array(p.qs, np.int64)[:, None]
        v = np.mod(ct.c0 + self._polymul(ct.c1, sk.s_rns), qs)  # [L, N]
        q = p.q
        t = p.t
        frac = np.zeros(p.n, np.float64)
        for i, qi in enumerate(p.qs):
            qhat = q // qi
            inv = pow(qhat % qi, -1, qi)
            r = (v[i] * inv) % qi            # int64 product < 2^60, safe
            frac += r.astype(np.float64) / qi
        frac -= np.floor(frac)               # mod 1
        return np.round(t * frac).astype(np.int64) % t

    def decrypt_batch(self, sk: SecretKey, cts: List["Ciphertext"]) -> np.ndarray:
        """Decrypt B ciphertexts at once → [B, N] ints in [0, t).

        Batches the inverse NTTs across ciphertexts and precomputes NTT(s)
        once — ~10× faster than per-ct decrypt for the multi-block encrypted
        re-rank responses."""
        p = self.params
        B = len(cts)
        is_ntt = cts[0].is_ntt
        c0 = np.stack([c.c0 for c in cts])        # [B, L, N]
        c1 = np.stack([c.c1 for c in cts])
        frac = np.zeros((B, p.n), np.float64)
        q, t = p.q, p.t
        for i, tb in enumerate(self.tables):
            qi = tb.q
            if is_ntt:
                c0i_ntt = c0[:, i]
                c1i_ntt = c1[:, i]
            else:
                c0i_ntt = ntt(c0[:, i], tb)
                c1i_ntt = ntt(c1[:, i], tb)
            s_ntt = ntt(sk.s_rns[i], tb)          # [N] (cached cheap)
            v = intt((c0i_ntt + c1i_ntt * s_ntt % qi) % qi, tb)  # [B, N]
            qhat = q // qi
            inv = pow(qhat % qi, -1, qi)
            frac += ((v * inv) % qi).astype(np.float64) / qi
        frac -= np.floor(frac)
        return np.round(t * frac).astype(np.int64) % t

    def _crt_compose(self, v: np.ndarray) -> List[int]:
        """[L, N] residues → list of N big ints in [0, q)."""
        p = self.params
        q = p.q
        comps = []
        for i, qi in enumerate(p.qs):
            qhat = q // qi
            inv = pow(qhat % qi, -1, qi)
            comps.append((qhat, inv, qi))
        out = []
        for j in range(p.n):
            acc = 0
            for i, (qhat, inv, qi) in enumerate(comps):
                acc += qhat * ((int(v[i, j]) * inv) % qi)
            out.append(acc % q)
        return out

    def noise_budget_bits(self, sk: SecretKey, ct: Ciphertext, m: np.ndarray) -> int:
        """Remaining noise budget log2(q/(2t)) − log2(noise∞)."""
        ct = self.from_ntt(ct) if ct.is_ntt else ct
        p = self.params
        qs = np.array(p.qs, np.int64)[:, None]
        v = np.mod(ct.c0 + self._polymul(ct.c1, sk.s_rns), qs)
        big = self._crt_compose(v)
        q, t = p.q, p.t
        delta = p.delta
        worst = 0
        for j, x in enumerate(big):
            noise = (x - delta * int(m[j])) % q
            noise = min(noise, q - noise)
            worst = max(worst, noise)
        budget = (q // (2 * t)).bit_length() - max(worst, 1).bit_length()
        return budget

    # -- homomorphic ops -------------------------------------------------
    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        assert a.is_ntt == b.is_ntt
        qs = np.array(self.params.qs, np.int64)[:, None]
        return Ciphertext(
            c0=np.mod(a.c0 + b.c0, qs), c1=np.mod(a.c1 + b.c1, qs),
            is_ntt=a.is_ntt,
        )

    def to_ntt(self, ct: Ciphertext) -> Ciphertext:
        assert not ct.is_ntt
        return Ciphertext(
            c0=self.ntt_fwd(ct.c0), c1=self.ntt_fwd(ct.c1), is_ntt=True
        )

    def from_ntt(self, ct: Ciphertext) -> Ciphertext:
        assert ct.is_ntt
        return Ciphertext(
            c0=self.ntt_inv(ct.c0), c1=self.ntt_inv(ct.c1), is_ntt=False
        )

    def plain_to_ntt(self, p_coeffs: np.ndarray) -> np.ndarray:
        """Plaintext poly [N] small non-negative ints → NTT-domain [L, N]."""
        return self.ntt_fwd(self._rns_small(p_coeffs.astype(np.int64)))

    def mul_plain_ntt(self, ct: Ciphertext, pt_ntt: np.ndarray) -> Ciphertext:
        """ct × plaintext, both in NTT domain: one pointwise modmul per limb.

        This is the server-side encrypted-distance MAC primitive."""
        assert ct.is_ntt
        qs = np.array(self.params.qs, np.int64)[:, None]
        return Ciphertext(
            c0=ct.c0 * pt_ntt % qs, c1=ct.c1 * pt_ntt % qs, is_ntt=True
        )
