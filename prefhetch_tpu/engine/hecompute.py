"""Server-side homomorphic compute: batched encrypted-distance MACs on TPU.

The server receives an encrypted query (BFV ciphertext, NTT domain), packs
the client-named candidate vectors into plaintext polynomials
(crypto/packing.py), forward-NTTs them on device, and performs one pointwise
ciphertext×plaintext modular multiply per candidate block and limb. The
server holds NO keys — ct×pt needs none, so the privacy contract is
unconditional on the server side.

This realizes the reference's reserved encrypted path
(compute_encrypted_precise_query, reference: include/client/client_lib.h:28-30)
as the batched jitted TPU service.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prefhetch_tpu.crypto.bfv import BFVContext, Ciphertext
from prefhetch_tpu.crypto.ntt import ntt
from prefhetch_tpu.crypto.packing import pack_candidates
from prefhetch_tpu.crypto.params import BFVParams


class HEComputeService:
    """Holds a BFV parameter context (no keys) + jitted device kernels."""

    def __init__(self, params: BFVParams):
        self.params = params
        self.ctx = BFVContext(params)
        self._qs = jnp.asarray(np.array(params.qs, np.int64))

    @functools.cached_property
    def _mac_fn(self):
        tables = self.ctx.tables

        @jax.jit
        def mac(c0, c1, pt_polys):
            """c0,c1: [L, N] NTT-domain ct; pt_polys: [B, N] raw coeffs.
            Returns ([B, L, N], [B, L, N]) NTT-domain result cts."""
            outs0, outs1 = [], []
            for i, tb in enumerate(tables):
                q = tb.q
                pt = pt_polys % q                       # small coeffs
                pt_ntt = ntt(pt, tb)                    # [B, N]
                outs0.append(c0[i][None, :] * pt_ntt % q)
                outs1.append(c1[i][None, :] * pt_ntt % q)
            return (
                jnp.stack(outs0, axis=1),               # [B, L, N]
                jnp.stack(outs1, axis=1),
            )

        return mac

    def encrypted_scores(
        self,
        ct: Ciphertext,              # NTT-domain encrypted query poly
        candidates: np.ndarray,      # [P, d] raw candidate vectors
    ) -> Tuple[List[Ciphertext], np.ndarray]:
        """Compute Enc(⟨q, x_j⟩) for every candidate; returns
        (result ciphertexts per block, candidate squared norms [P])."""
        if not ct.is_ntt:
            ct = self.ctx.to_ntt(ct)
        polys, _ = pack_candidates(candidates, self.params)   # [n_blocks, N]
        c0, c1 = self._mac_fn(
            jnp.asarray(ct.c0), jnp.asarray(ct.c1), jnp.asarray(polys)
        )
        c0 = np.asarray(c0)
        c1 = np.asarray(c1)
        out = [
            Ciphertext(c0=c0[b], c1=c1[b], is_ntt=True)
            for b in range(c0.shape[0])
        ]
        norms = (np.round(candidates).astype(np.int64) ** 2).sum(-1)
        return out, norms
