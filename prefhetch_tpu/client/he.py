"""Client-side homomorphic encryption: keygen, query encryption, score
decryption.

Fills the reference's empty client_utils slot (reference:
src/client/client_utils.cpp is an empty placeholder "reserved for future
client helpers", SURVEY.md C3) — these are exactly the encryption helpers it
was reserved for. All key material lives here; the server never sees it.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from prefhetch_tpu.crypto.bfv import BFVContext, Ciphertext
from prefhetch_tpu.crypto.packing import (
    distances_from_inner_products,
    encode_query_poly,
    extract_inner_products,
)
from prefhetch_tpu.crypto.params import BFVParams, bfv_params_for
from prefhetch_tpu.utils.config import HEParams


class HEClient:
    """Holds the client's BFV keys and drives encrypt/decrypt."""

    def __init__(self, he: HEParams, seed: int = 0):
        if he.scheme != "bfv":
            raise NotImplementedError(f"scheme {he.scheme}")
        self.params: BFVParams = bfv_params_for(he.n, he.t_bits, he.n_limbs)
        self.ctx = BFVContext(self.params)
        self._rng = np.random.default_rng(seed)
        self.sk, self.pk = self.ctx.keygen(self._rng)

    def encrypt_query(self, q: np.ndarray) -> dict:
        """Query vector [d] → NTT-domain ciphertext wire dict.

        (The ct ships in NTT form so the server does zero transforms on the
        critical path for the ciphertext itself.)"""
        poly = encode_query_poly(q, self.params)
        ct = self.ctx.to_ntt(self.ctx.encrypt(self.pk, poly, self._rng))
        return ct.to_wire()

    def decrypt_scores(
        self,
        score_ct_wires: List[dict],     # per-block result ciphertexts
        norms: np.ndarray,              # [P] candidate squared norms
        q: np.ndarray,                  # [d] the plaintext query (local)
    ) -> np.ndarray:
        """Decrypt Enc(⟨q,x⟩) blocks → exact squared-L2 distances [P]."""
        d = q.shape[0]
        P = norms.shape[0]
        prods = np.stack(
            [
                self.ctx.decrypt(self.sk, Ciphertext.from_wire(w))
                for w in score_ct_wires
            ]
        )
        ips = extract_inner_products(prods, d, P)
        return distances_from_inner_products(
            q, ips, np.asarray(norms)
        ).astype(np.float32)
