"""Single-server computational PIR for the vector-retrieval stage.

The reference's ``/precise-vector-pir`` is PIR in name only — the client
sends indices in cleartext and the server gathers raw rows (reference:
src/server/server_lib.cpp:169-196; SURVEY.md §2.2 note). This module makes
the retrieval genuinely private: the server returns the requested row
without learning which row it was.

Construction (basic XPIR-style, no query expansion):

- The database [nbase, d] is packed into G plaintext polynomials; block b
  holds rows [b·R, (b+1)·R), R = N/d rows per block, row j reversed inside
  its d-aligned coefficient window (the crypto/packing.py layout).
- To fetch row i = (b*, r), the client sends G ciphertexts: Enc(X^{s}) with
  s = N − d·(r+1) at position b*, Enc(0) elsewhere. The server computes
  ONE response ct: Σ_b ct_b ⊗ p_b (NTT-domain MACs + additions). The
  monomial shifts row r's window onto coefficients [N−d, N−1]; every other
  row of the block lands outside that window (wraps stay below N−d), and
  all other blocks contribute Enc(0)·p = Enc(0).
- The client decrypts one ct and reads the window.

Cost model: upload G ciphertexts per retrieved row (G = nbase·d/N) — the
communication-inefficient but genuinely private baseline. SealPIR-style
oblivious query expansion (1 ct expanded into G selectors via substitution
automorphisms — the Galois machinery in crypto/ckks.py) is the planned
upgrade (ROADMAP.md).

Noise: the response is a sum of G ct×pt products with ‖p‖₁ ≤ N·255, so the
plaintext modulus must stay small (t = 2^9 covers byte-valued vectors) to
keep Σ noise ≪ q/2t. Checked by tests at the production prime sizes.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from prefhetch_tpu.crypto.bfv import BFVContext, Ciphertext
from prefhetch_tpu.crypto.params import BFVParams


def rows_per_block(params: BFVParams, d: int) -> int:
    assert params.n % d == 0
    return params.n // d


def pack_database(base: np.ndarray, params: BFVParams) -> np.ndarray:
    """[nbase, d] byte-valued rows → packed plaintext polys [G, N]."""
    nbase, d = base.shape
    R = rows_per_block(params, d)
    G = -(-nbase // R)
    padded = np.zeros((G * R, d), np.int64)
    rounded = np.round(base).astype(np.int64)
    if not np.allclose(np.asarray(base, np.float64), rounded, atol=1e-6):
        raise ValueError(
            "PIR database rows must be integer-valued (fixed-point "
            "quantize float/cosine datasets before enabling pir_mode='he')"
        )
    if rounded.min() < 0 or rounded.max() >= params.t:
        raise ValueError(
            f"PIR database values must lie in [0, t={params.t}); "
            f"got [{rounded.min()}, {rounded.max()}] — rescale or raise "
            "pir_plain_modulus"
        )
    padded[:nbase] = rounded
    polys = np.zeros((G, params.n), np.int64)
    rev = padded[:, ::-1].reshape(G, R * d)
    polys[:, : R * d] = rev
    return polys


class PIRClient:
    """Holds the PIR keypair; builds queries and decodes responses."""

    def __init__(self, params: BFVParams, seed=None):
        import uuid

        from prefhetch_tpu.crypto.rng import secure_rng

        self.params = params
        self.ctx = BFVContext(params)
        # seed=None (production): OS-entropy CSPRNG; integer seeds test-only
        self._rng = secure_rng(seed)
        self.sk, self.pk = self.ctx.keygen(self._rng)
        self.key_id = uuid.uuid4().hex

    def build_query(self, row: int, nbase: int, d: int) -> List[dict]:
        """Selector ciphertexts for one row → list of G ct wire dicts."""
        p = self.params
        R = rows_per_block(p, d)
        G = -(-nbase // R)
        b_star, r = divmod(row, R)
        s = p.n - d * (r + 1)
        polys = np.zeros((G, p.n), np.int64)
        polys[b_star, s] = 1
        cts = self.ctx.encrypt_batch(self.pk, polys, self._rng)
        return [self.ctx.to_ntt(ct).to_wire() for ct in cts]

    def decode_response(self, wire: dict, d: int) -> np.ndarray:
        """Response ct → the retrieved row [d].

        The window coefficient N−d+k carries x[d−1−k] (rows are stored
        reversed in their block windows), so the read is flipped."""
        ct = Ciphertext.from_wire(wire)
        coeffs = self.ctx.decrypt(self.sk, ct)
        return coeffs[self.params.n - d :][::-1].astype(np.float32)

    # -- packed (oblivious-expansion) variant ---------------------------
    def build_query_packed(self, row: int, nbase: int, d: int) -> Tuple[dict, int]:
        """One ciphertext Enc(X^{b*}) selecting the block; returns
        (ct wire, row-within-block r for local decode)."""
        p = self.params
        R = rows_per_block(p, d)
        b_star, r = divmod(row, R)
        poly = np.zeros(p.n, np.int64)
        poly[b_star] = 1
        ct = self.ctx.encrypt(self.pk, poly, self._rng)
        return ct.to_wire(), r

    def galois_keys_wire(self, nbase: int, d: int) -> dict:
        """Public expansion keys (one-time registration)."""
        from prefhetch_tpu.crypto.pir import expansion_galois_elements

        p = self.params
        R = rows_per_block(p, d)
        G = -(-nbase // R)
        elts = expansion_galois_elements(p.n, G)
        if not hasattr(self, "_gks"):
            self._gks = {}
        missing = [g for g in elts if g not in self._gks]
        if missing:
            self._gks.update(
                self.ctx.galois_keygen(self.sk, missing, self._rng)
            )
        return {str(g): self._gks[g].to_wire() for g in elts}

    def decode_block_response(
        self, wire: dict, d: int, r: int, n_blocks: int
    ) -> np.ndarray:
        """Packed response ct → the retrieved row [d].

        The response encrypts 2^⌈log₂G⌉·p_{b*}; undo the expansion scale
        with its inverse mod t, then read row r's reversed window."""
        p = self.params
        ct = Ciphertext.from_wire(wire)
        coeffs = self.ctx.decrypt(self.sk, ct)
        logm = max(1, (n_blocks - 1).bit_length())
        inv = pow(1 << logm, -1, p.t)
        coeffs = (coeffs * inv) % p.t
        return coeffs[r * d : (r + 1) * d][::-1].astype(np.float32)


def expand_query(
    ctx: BFVContext, ct: Ciphertext, m: int, gks: dict
) -> List[Ciphertext]:
    """SealPIR-style oblivious expansion: one ct encrypting Σ_b a_b·X^b →
    m ciphertexts, the b-th encrypting 2^⌈log₂m⌉ · a_b.

    Each of ⌈log₂ m⌉ rounds substitutes X → X^{N/2^j + 1} (Galois key
    switch) to split even/odd coefficient trees. Round j splits on bit j of
    the coefficient index but prepends the choice to the output index, so
    coefficient b emerges at the bit-reversed position — undone here so
    the returned list is in natural coefficient order. The 2^logm scale
    factor is undone at decode with its inverse mod t (t must be odd)."""
    n = ctx.params.n
    logm = max(1, (m - 1).bit_length())
    cts = [ct]
    for j in range(logm):
        g = (n >> j) + 1
        gk = gks[g]
        new = []
        for c in cts:
            c_g = ctx.apply_galois(c, g, gk)
            even = ctx.add(c, c_g)
            c_sh = ctx.mul_monomial(c, -(1 << j))
            c_sh_g = ctx.apply_galois(c_sh, g, gk)
            odd = ctx.add(c_sh, c_sh_g)
            new += [even, odd]
        cts = new

    def bitrev(x: int) -> int:
        r = 0
        for _ in range(logm):
            r = (r << 1) | (x & 1)
            x >>= 1
        return r

    return [cts[bitrev(b)] for b in range(m)]


def expansion_galois_elements(n: int, m: int) -> List[int]:
    """Galois elements needed by expand_query for m selectors."""
    logm = max(1, (m - 1).bit_length())
    return [(n >> j) + 1 for j in range(logm)]


class PIRServer:
    """Precomputes NTT(p_b) for the packed database; answers queries with
    Σ_b ct_b ⊗ p_b. Holds no keys; never sees the requested index."""

    def __init__(self, base: np.ndarray, params: BFVParams):
        self.params = params
        self.ctx = BFVContext(params)
        self.d = base.shape[1]
        self.nbase = base.shape[0]
        polys = pack_database(base, params)
        self.db_ntt = np.stack(
            [self.ctx.plain_to_ntt(p) for p in polys]
        )                                     # [G, L, N]

    @property
    def n_blocks(self) -> int:
        return self.db_ntt.shape[0]

    def register_galois_keys(self, key_id: str, gks_wire: dict) -> None:
        from prefhetch_tpu.crypto.bfv import RelinKey

        if not hasattr(self, "_galois"):
            self._galois = {}
        self._galois[key_id] = {
            int(g): RelinKey.from_wire(w) for g, w in gks_wire.items()
        }

    def has_keys(self, key_id: str) -> bool:
        return hasattr(self, "_galois") and key_id in self._galois

    def answer_packed(self, query_wire: dict, key_id: str) -> dict:
        """Oblivious-expansion path: ONE uploaded ct → ONE response ct."""
        gks = self._galois[key_id]
        ct = Ciphertext.from_wire(query_wire)
        selectors = expand_query(self.ctx, ct, self.n_blocks, gks)
        p = self.params
        qs = np.array(p.qs, np.int64)[:, None]
        acc0 = np.zeros((len(p.qs), p.n), np.int64)
        acc1 = np.zeros_like(acc0)
        for b, sel in enumerate(selectors):
            sel = self.ctx.to_ntt(sel)
            acc0 = (acc0 + sel.c0 * self.db_ntt[b]) % qs
            acc1 = (acc1 + sel.c1 * self.db_ntt[b]) % qs
        return Ciphertext(c0=acc0, c1=acc1, is_ntt=True).to_wire()

    def answer(self, query_wires: List[dict]) -> dict:
        p = self.params
        G = self.db_ntt.shape[0]
        if len(query_wires) != G:
            raise ValueError(
                f"PIR query must carry {G} ciphertexts, got {len(query_wires)}"
            )
        qs = np.array(p.qs, np.int64)[:, None]
        acc0 = np.zeros((len(p.qs), p.n), np.int64)
        acc1 = np.zeros_like(acc0)
        for b, w in enumerate(query_wires):
            ct = Ciphertext.from_wire(w)
            if not ct.is_ntt:
                # untrusted wire input: convert rather than assume
                ct = self.ctx.to_ntt(ct)
            acc0 = (acc0 + ct.c0 * self.db_ntt[b]) % qs
            acc1 = (acc1 + ct.c1 * self.db_ntt[b]) % qs
        return Ciphertext(c0=acc0, c1=acc1, is_ntt=True).to_wire()
