"""Coefficient packing: batched encrypted inner products via one ct×pt.

The encrypted L2 re-rank (the protocol role the reference reserved for SEAL
— "will be sending coarse vector in a future implementation",
reference: include/client/client_lib.h:34-36) reduces to inner products:
        ‖q − x‖² = ‖q‖² − 2⟨q, x⟩ + ‖x‖²
where only ⟨q, x⟩ involves the secret query.

Packing trick (negacyclic convolution): encode the query as
q(X) = Σ_k q_k X^k. Pack B = N/d candidates into one plaintext poly with
candidate j's vector REVERSED in its d-aligned block:
        p(X) = Σ_j Σ_k x_j[d−1−k] · X^{j·d + k}.
Then coefficient j·d + (d−1) of q(X)·p(X) mod (X^N+1) equals ⟨q, x_j⟩
exactly (no wraparound: all contributing index sums stay below N, and
cross-candidate products land on other coefficients).

One ciphertext×plaintext product therefore scores N/d candidates
(N=4096, d=128 → 32 per MAC). All values stay < t (SIFT inner products
≤ 128·255² < 2^23 < t=2^24), so BFV decrypts them exactly.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from prefhetch_tpu.crypto.params import BFVParams


def candidates_per_block(params: BFVParams, d: int) -> int:
    assert params.n % d == 0
    return params.n // d


def encode_query_poly(q: np.ndarray, params: BFVParams) -> np.ndarray:
    """Query vector [d] (non-negative ints) → plaintext poly [N]."""
    d = q.shape[0]
    out = np.zeros(params.n, np.int64)
    out[:d] = np.round(q).astype(np.int64)
    return out


def pack_candidate_block(x_block: np.ndarray, params: BFVParams) -> np.ndarray:
    """Candidate matrix [B, d] (B ≤ N/d) → packed plaintext poly [N].

    Candidate j occupies coefficients [j·d, (j+1)·d) with reversed order."""
    B, d = x_block.shape
    assert B * d <= params.n
    out = np.zeros(params.n, np.int64)
    rev = np.round(x_block[:, ::-1]).astype(np.int64)     # [B, d]
    out[: B * d] = rev.reshape(-1)
    return out


def pack_candidates(
    x: np.ndarray, params: BFVParams
) -> Tuple[np.ndarray, int]:
    """[P, d] candidates → ([n_blocks, N] packed polys, B per block).

    P is padded with zero vectors to a multiple of N/d."""
    P, d = x.shape
    B = candidates_per_block(params, d)
    n_blocks = -(-P // B)
    padded = np.zeros((n_blocks * B, d), x.dtype)
    padded[:P] = x
    polys = np.stack(
        [pack_candidate_block(padded[i * B : (i + 1) * B], params)
         for i in range(n_blocks)]
    )
    return polys, B


def extract_inner_products(
    product_coeffs: np.ndarray, d: int, n_candidates: int
) -> np.ndarray:
    """Decrypted product polys [n_blocks, N] → inner products [n_candidates].

    Inner product of candidate j in block b sits at coefficient j·d + d−1."""
    n_blocks, n = product_coeffs.shape
    B = n // d
    idx = np.arange(B) * d + (d - 1)
    vals = product_coeffs[:, idx].reshape(-1)             # [n_blocks·B]
    return vals[:n_candidates]


def distances_from_inner_products(
    q: np.ndarray, ips: np.ndarray, x_norms: np.ndarray
) -> np.ndarray:
    """‖q‖² − 2⟨q,x⟩ + ‖x‖² (client-side final assembly)."""
    qsq = float(np.sum(np.round(q).astype(np.int64) ** 2))
    return qsq - 2.0 * ips.astype(np.float64) + x_norms.astype(np.float64)
