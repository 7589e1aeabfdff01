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


def build_trunc_mac_q1(params: BFVParams):
    """Pure modulus-switched truncated-MAC core (VERDICT r02 item 4):
    fn(rows [nq, npad, d] i32, ctq [nq, 2, L, N] i32 natural-NTT order)
    → bundled [nq, nb, N+B] i32, everything mod q1.

    Same MAC as _trunc_mac_fn, but the result ciphertext is RNS
    mod-switched down to the FIRST limb before it leaves the device —
    the wire shrinks ~2× (c1 in COEFFICIENT domain ‖ c0 inner-product
    coefficients, both mod q1).

    Domain subtlety: RNS mod-down centers the q2-residue per
    coefficient, which is only meaningful in the COEFFICIENT domain —
    mod-switching NTT-domain values would turn the ±1/2 rounding into
    full-magnitude coefficient noise after iNTT. So c1 pays one extra
    device iNTT per limb and ships in coefficient domain; the client
    forward-NTTs it at q1 only (half its former pointwise work).

    Noise budget (deterministic): Δ' = q1/t ≈ 2^6; mod-down error
    ≤ (1+‖s‖₁)/2 + |e⊛pt|/q2 + t/q2 < 25 + 0.02 + 0.01 < Δ'/2 = 32
    for a sparse ternary secret with h = ‖s‖₁ ≤ 48
    (crypto/bfv._sample_sparse_ternary). Dense ternary keys
    (‖s‖₁ ≈ 2N/3) would NOT decrypt — callers opting into resp_mod
    ="q1" must use HEParams.sparse_h.

    Module-level (not a method) so the sharded path
    (parallel/sharded.sharded_trunc_mac_q1) can wrap the identical
    integer arithmetic per query shard — exactness makes the sharded
    result bit-equal by construction."""
    from prefhetch_tpu.ops.ntt_mxu import (
        build_ntt4_tables, intt4, modmul, ntt4, shift_mod_reduce,
    )

    tables = [build_ntt4_tables(q, params.n) for q in params.qs]
    n = params.n
    t0 = tables[0]
    q1, q2 = params.qs
    inv_q2 = pow(q2 % q1, -1, q1)
    j1, j2 = np.meshgrid(
        np.arange(t0.n1), np.arange(t0.n2), indexing="ij"
    )
    perm = (j2 * t0.n1 + j1).reshape(-1)   # natural → four-step
    perm_j = jnp.asarray(perm)

    def mod_down(x1, x2):
        # residues [..,] mod q1 / mod q2 → value mod q1 after exact
        # division by q2 (centered q2-residue)
        r2c = jnp.where(x2 > q2 // 2, x2 - q2, x2)
        diff = shift_mod_reduce(x1 - r2c + 2 * q1, q1, t0.delta, 33)
        return modmul(diff, jnp.int64(inv_q2), q1, t0.delta)

    def trunc_mac_q1(rows, ctq):
        nq, npad, d = rows.shape
        B = n // d
        nb = npad // B
        c0q = ctq[:, 0][..., perm_j]
        c1q = ctq[:, 1][..., perm_j]
        polys = rows[:, :, ::-1].reshape(nq * nb, n)
        c1c, c0ip = [], []
        for i, tb in enumerate(tables):
            q = tb.q
            lifted = jnp.where(polys < 0, polys + q, polys)
            pt = ntt4(lifted, tb).reshape(nq, nb, n)
            o1 = modmul(c1q[:, None, i], pt, q, tb.delta)
            o0 = modmul(c0q[:, None, i], pt, q, tb.delta)
            c0ip.append(intt4(
                o0.reshape(nq * nb, n), tb
            ).reshape(nq, nb, B, d)[..., d - 1])          # [nq, nb, B]
            c1c.append(intt4(
                o1.reshape(nq * nb, n), tb
            ).reshape(nq, nb, n))                          # coeff dom.
        c1_q1 = mod_down(c1c[0], c1c[1])
        c0_q1 = mod_down(c0ip[0], c0ip[1])
        return jnp.concatenate(
            [c1_q1.astype(jnp.int32), c0_q1.astype(jnp.int32)], axis=-1
        )                                                  # [nq,nb,N+B]

    return trunc_mac_q1


class CKKSComputeService:
    """Server-side CKKS slot-packed scoring (BASELINE config 3).

    Slot layout: the query arrives replicated across all N/2 slots; the
    server packs slots/d candidates per plaintext, multiplies slot-wise, and
    rotate-accumulates log2(d) times so slot j·d carries ⟨q, x_j⟩. Rotations
    use client-registered Galois keys (public; registered once per key id —
    the server still holds NO secret material)."""

    def __init__(self, params):
        from prefhetch_tpu.crypto.ckks import CKKSContext

        self.params = params
        self.ctx = CKKSContext(params)
        self._galois: dict = {}          # key_id -> {step: GaloisKey}

    def register_keys(self, key_id: str, gks_wire: dict) -> None:
        from prefhetch_tpu.crypto.ckks import GaloisKey

        self._galois[key_id] = {
            int(step): GaloisKey.from_wire(w) for step, w in gks_wire.items()
        }

    def has_keys(self, key_id: str) -> bool:
        return key_id in self._galois

    def encrypted_scores(self, ct, candidates: np.ndarray, key_id: str):
        """Returns (result ciphertexts per block, candidate norms [P])."""
        gks = self._galois[key_id]
        ctx = self.ctx
        P, d = candidates.shape
        slots = self.params.n // 2
        per_ct = slots // d
        n_blocks = -(-P // per_ct)
        padded = np.zeros((n_blocks * per_ct, d), np.float64)
        padded[:P] = candidates

        steps = []
        r = d // 2
        while r >= 1:
            steps.append(r)
            r //= 2

        out = []
        for b in range(n_blocks):
            block = padded[b * per_ct : (b + 1) * per_ct].reshape(-1)
            prod = ctx.mul_plain(ct, ctx.encode(block), ctx.scale)
            acc = prod
            for s in steps:
                acc = ctx.add(acc, ctx.rotate(acc, s, gks[s]))
            out.append(acc)
        norms = (np.round(candidates).astype(np.int64) ** 2).sum(-1)
        return out, norms

    # candidates scaled 2^-CAND_SCALE_BITS at encode so the inner products
    # fit ONE 30-bit limb after two rescales; the mask plaintext's scale
    # sets the final precision (see encrypted_scores_combined)
    CAND_SCALE_BITS = 16
    # 29 puts the worst-case message (IP=128·255², i.e. 2^7 after the 2^-16
    # candidate scale) at 2^28 against q1/2 ≈ 2^29 — 2× headroom, and each
    # extra scale bit halves the (key-switch-noise-dominated) output error
    MASK_SCALE_BITS = 29

    def encrypted_scores_combined(self, ct, candidates: np.ndarray, key_id: str):
        """ONE single-limb result ciphertext for ALL candidates of a query.

        The per-block path (encrypted_scores) returns n_blocks level-2 cts
        per query — ~1 MB at the config-3 operating point, 32 useful slots
        per 4096-slot ciphertext. This variant:

        1. scales candidates by 2^-16 at encode (server-side, exact in
           float64) so every inner product fits a single 30-bit limb;
        2. runs only the IP rotations with stride ≥ W = d/n_blocks before
           combining (the WINDOWED layout — crypto/ckks.combine_window):
           after those, candidate j's partial sums occupy the W slots
           [j·d, j·d + W);
        3. multiplies by the slot mask (1 at slots with offset < W mod d,
           0 elsewhere — one ct×pt whose rescale drops a level), killing
           out-of-window garbage, and tree-combines the blocks with
           rotations by −W·2^k, placing block b's window at [j·d + W·b);
        4. finishes the inner products with the remaining strides < W on
           the ONE combined ct — n_blocks× less rotate-accumulate work on
           the dominant pre-combine side.

        Response: ONE level-1 ct (~16× smaller). The returned ct's `scale`
        is pre-divided by 2^16 so decode() yields RAW inner products; slot
        j·d + W·b carries ⟨q, x_{b·per_ct + j}⟩ (other slots hold partial
        sums — the client reads only the result offsets). The client needs
        Galois keys for the IP tree steps (d/2 … 1) AND the combine steps
        (−W, −2W, … — crypto/ckks.combine_tree_steps). Returns
        (ct, norms [P])."""
        from prefhetch_tpu.crypto.ckks import combine_window

        gks = self._galois[key_id]
        ctx = self.ctx
        P, d = candidates.shape
        slots = self.params.n // 2
        per_ct = slots // d
        n_blocks = -(-P // per_ct)
        if n_blocks > 1:
            n_blocks = 1 << (n_blocks - 1).bit_length()   # pow2 tree
        if n_blocks > d:
            raise ValueError("combine needs n_blocks <= d distinct offsets")
        if ct.level < 3:
            raise ValueError("combined scoring needs a level-3 query ct")
        padded = np.zeros((n_blocks * per_ct, d), np.float64)
        padded[:P] = candidates
        cand_scale = float(1 << self.CAND_SCALE_BITS)

        window = combine_window(d, n_blocks)
        steps = []
        r = d // 2
        while r >= 1:
            steps.append(r)
            r //= 2
        pre_steps = [s for s in steps if s >= window]
        post_steps = [s for s in steps if s < window]

        mask_slots = np.zeros(slots, np.float64)
        for w in range(window):
            mask_slots[w::d] = 1.0
        mask_scale = float(1 << self.MASK_SCALE_BITS)
        mask_pt = ctx.encode(mask_slots, scale=mask_scale)

        blocks_out = []
        for b in range(n_blocks):
            block = padded[b * per_ct : (b + 1) * per_ct].reshape(-1)
            prod = ctx.mul_plain(
                ct, ctx.encode(block / cand_scale), ctx.scale
            )
            acc = prod
            for s in pre_steps:
                acc = ctx.add(acc, ctx.rotate(acc, s, gks[s]))
            blocks_out.append(ctx.mul_plain(acc, mask_pt, mask_scale))
        k = 0
        cur = blocks_out
        while len(cur) > 1:
            nxt = []
            for i in range(0, len(cur), 2):
                step = -(window << k)
                rot = ctx.rotate(cur[i + 1], step, gks[step])
                nxt.append(ctx.add(cur[i], rot))
            cur = nxt
            k += 1
        out = cur[0]
        for s in post_steps:
            out = ctx.add(out, ctx.rotate(out, s, gks[s]))
        # decode divides by `scale`: report it 2^16 smaller so slot values
        # come back as RAW inner products
        out.scale = out.scale / cand_scale
        norms = (np.round(candidates).astype(np.int64) ** 2).sum(-1)
        return out, norms


class HEComputeService:
    """Holds a BFV parameter context (no keys) + the batched MAC kernel.

    Two backends:
    - "numpy" (default): vectorized host NTT + pointwise modmul. Fast in
      absolute terms (a candidate block costs one [B, N] batched NTT + one
      multiply) and free of device-compile latency.
    - "jax": the same computation jitted for the accelerator. NOTE: in the
      current sandbox the unrolled int64 NTT makes XLA compile times
      pathological; the planned production path is the MXU int8-matmul NTT
      (digit-decomposed DFT matrix — 16 int8 matmuls per transform), tracked
      as ops work.
    """

    def __init__(self, params: BFVParams, backend: str = "numpy"):
        self.params = params
        self.ctx = BFVContext(params)
        self.backend = backend
        self._qs = np.array(params.qs, np.int64)
        self._base_host: np.ndarray | None = None
        self._base_dev = None

    # -- truncated-response device pipeline ------------------------------
    def set_base(self, base: np.ndarray) -> None:
        """Register the integer base matrix so requests upload only
        candidate INDICES; packing/gather runs on-device. A zero row is
        appended at index nbase for block padding."""
        b = np.round(np.asarray(base)).astype(np.int32)
        self._base_host = np.concatenate([b, np.zeros((1, b.shape[1]), np.int32)])
        if self.backend == "tpu":
            self._base_dev = jnp.asarray(self._base_host)

    @functools.cached_property
    def _trunc_mac_fn(self):
        """jit: (c0q, c1q [nq,L,N] i32, idx [nq,npad] i32) →
        (c1_ntt [nq,nb,L,N] i32, c0_ip [nq,nb,L,B] i32).

        Response layout (the truncated wire, ~4× smaller than full cts):
        - c1 of each result ct stays in NTT domain (the client multiplies by
          NTT(s) anyway, so this SAVES it a forward NTT);
        - c0 is inverse-NTT'd on device and only the B inner-product
          coefficients (positions j·d + d−1) are kept.

        Transforms run as four-step NTTs (N·(N1+N2) MACs, kilobyte
        matrices — ops/ntt_mxu.ntt4); the wire stays NATURAL NTT order via
        two device permutations, so clients are unaffected."""
        from prefhetch_tpu.ops.ntt_mxu import (
            build_ntt4_tables, intt4, modmul, ntt4,
        )

        tables = [build_ntt4_tables(q, self.params.n) for q in self.params.qs]
        n = self.params.n
        t0 = tables[0]
        j1, j2 = np.meshgrid(
            np.arange(t0.n1), np.arange(t0.n2), indexing="ij"
        )
        perm = (j2 * t0.n1 + j1).reshape(-1)   # natural → four-step
        inv_perm = np.empty_like(perm)
        inv_perm[perm] = np.arange(n)
        perm_j = jnp.asarray(perm)
        inv_perm_j = jnp.asarray(inv_perm)

        def trunc_mac(base_pad, ctq, idx):
            # ctq: [nq, 2, L, N] i32 (c0, c1 bundled — ONE relay upload);
            # returns ONE bundled [nq, nb, L, N+B] i32 (c1_ntt ‖ c0_ip) so
            # the relay pays a single download round trip.
            nq, npad = idx.shape
            d = base_pad.shape[1]
            B = n // d
            nb = npad // B
            # incoming ct is natural-order NTT; work in four-step order
            c0q = ctq[:, 0][..., perm_j]
            c1q = ctq[:, 1][..., perm_j]
            rows = base_pad[idx]                        # [nq, npad, d] i32
            polys = rows[:, :, ::-1].reshape(nq * nb, n)  # reversed windows
            out = []
            for i, tb in enumerate(tables):
                q = tb.q
                lifted = jnp.where(polys < 0, polys + q, polys)
                pt = ntt4(lifted, tb).reshape(nq, nb, n)
                o1 = modmul(c1q[:, None, i], pt, q, tb.delta)   # [nq,nb,N]
                o0 = modmul(c0q[:, None, i], pt, q, tb.delta)
                o0c = intt4(
                    o0.reshape(nq * nb, n), tb
                ).reshape(nq, nb, B, d)[..., d - 1]      # [nq, nb, B]
                o1_nat = o1[..., inv_perm_j]             # wire: natural order
                out.append(
                    jnp.concatenate(
                        [o1_nat.astype(jnp.int32), o0c.astype(jnp.int32)],
                        axis=-1,
                    )
                )
            return jnp.stack(out, axis=2)                # [nq, nb, L, N+B]

        return jax.jit(trunc_mac)

    @functools.cached_property
    def _trunc_mac_q1_fn(self):
        """jit wrapper: gather candidate rows, then the pure q1 MAC core
        (build_trunc_mac_q1 — shared with parallel/sharded's row/query-
        sharded variant)."""
        core = build_trunc_mac_q1(self.params)

        def trunc_mac_q1(base_pad, ctq, idx):
            return core(base_pad[idx], ctq)

        return jax.jit(trunc_mac_q1)

    def _trunc_mac_q1_numpy(self, c0q, c1q, idx):
        """Host-path equivalent of _trunc_mac_q1_fn."""
        from prefhetch_tpu.crypto.ntt import intt

        p = self.params
        n = p.n
        q1, q2 = p.qs
        inv_q2 = pow(q2 % q1, -1, q1)
        nq, npad = idx.shape
        d = self._base_host.shape[1]
        B = n // d
        nb = npad // B
        rows = self._base_host[idx].astype(np.int64)
        polys = rows[:, :, ::-1].reshape(nq * nb, n)
        c1c = []
        c0ip = []
        for i, tb in enumerate(self.ctx.tables):
            q = tb.q
            pt = ntt(polys % q, tb).reshape(nq, nb, n)
            o1 = c1q[:, None, i].astype(np.int64) * pt % q
            o0 = c0q[:, None, i].astype(np.int64) * pt % q
            c0ip.append(
                intt(o0.reshape(nq * nb, n), tb)
                .reshape(nq, nb, B, d)[..., d - 1]
            )
            c1c.append(intt(o1.reshape(nq * nb, n), tb).reshape(nq, nb, n))

        def mod_down(x1, x2):
            r2c = np.where(x2 > q2 // 2, x2 - q2, x2)
            return (x1 - r2c) * inv_q2 % q1

        return np.concatenate(
            [mod_down(c1c[0], c1c[1]).astype(np.int32),
             mod_down(c0ip[0], c0ip[1]).astype(np.int32)], axis=-1,
        )

    def encrypted_scores_trunc_q1(
        self,
        cts: List[Ciphertext],
        cand_idx: np.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Modulus-switched truncated MACs → (c1_q1 [nq,nb,N] i32 coeff-dom,
        c0_ip [nq,nb,B] i32, norms [nq,P] i64) — all mod q1 only; ~2× less
        wire than encrypted_scores_trunc."""
        bundled, norms = self.encrypted_scores_trunc_q1_async(cts, cand_idx)
        return self.trunc_unbundle_q1(np.asarray(bundled), norms)

    def encrypted_scores_trunc_q1_async(
        self, cts: List[Ciphertext], cand_idx: np.ndarray
    ):
        assert self._base_host is not None, "call set_base() first"
        assert len(self.params.qs) == 2, "q1 wire assumes 2 RNS limbs"
        p = self.params
        nq, P = cand_idx.shape
        d = self._base_host.shape[1]
        B = p.n // d
        nb = -(-P // B)
        pad_idx = np.full((nq, nb * B), self._base_host.shape[0] - 1, np.int32)
        pad_idx[:, :P] = cand_idx
        cts = [self.ctx.to_ntt(c) if not c.is_ntt else c for c in cts]
        ctq = np.stack(
            [np.stack([c.c0 for c in cts]), np.stack([c.c1 for c in cts])],
            axis=1,
        ).astype(np.int32)
        gathered = self._base_host[cand_idx.astype(np.int64)].astype(np.int64)
        norms = (gathered ** 2).sum(-1)
        if self.backend == "tpu":
            bundled = self._trunc_mac_q1_fn(
                self._base_dev, jnp.asarray(ctq), jnp.asarray(pad_idx),
            )
        else:
            bundled = self._trunc_mac_q1_numpy(
                ctq[:, 0], ctq[:, 1], pad_idx
            )
        return bundled, norms

    def trunc_unbundle_q1(self, bundled: np.ndarray, norms: np.ndarray):
        """[nq, nb, N+B] → (c1_q1 [nq,nb,N], c0_ip [nq,nb,B], norms)."""
        n = self.params.n
        return bundled[..., :n], bundled[..., n:], norms

    @functools.cached_property
    def _dev_digit_mats(self):
        """Device-resident NTT matrix digits (args, not jit constants)."""
        from prefhetch_tpu.ops.ntt_mxu import build_mxu_tables

        tables = [build_mxu_tables(q, self.params.n) for q in self.params.qs]
        fdigs = [jnp.asarray(tb.f_digits) for tb in tables]
        gdigs = [jnp.asarray(tb.g_digits) for tb in tables]
        return fdigs, gdigs

    def _trunc_mac_numpy(self, c0q, c1q, idx):
        """Host-path equivalent of _trunc_mac_fn (tests / CPU serving)."""
        from prefhetch_tpu.crypto.ntt import intt

        p = self.params
        n = p.n
        nq, npad = idx.shape
        d = self._base_host.shape[1]
        B = n // d
        nb = npad // B
        rows = self._base_host[idx].astype(np.int64)     # [nq, npad, d]
        polys = rows[:, :, ::-1].reshape(nq * nb, n)
        c1_out = np.empty((nq, nb, len(p.qs), n), np.int32)
        c0ip_out = np.empty((nq, nb, len(p.qs), B), np.int32)
        for i, tb in enumerate(self.ctx.tables):
            q = tb.q
            pt = ntt(polys % q, tb).reshape(nq, nb, n)
            o1 = c1q[:, None, i].astype(np.int64) * pt % q
            o0 = c0q[:, None, i].astype(np.int64) * pt % q
            o0c = intt(o0.reshape(nq * nb, n), tb).reshape(nq, nb, B, d)
            c1_out[:, :, i] = o1
            c0ip_out[:, :, i] = o0c[..., d - 1]
        return c1_out, c0ip_out

    def encrypted_scores_trunc(
        self,
        cts: List[Ciphertext],        # [nq] NTT-domain encrypted queries
        cand_idx: np.ndarray,         # [nq, P] int candidate row indices
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched truncated-response MACs over the registered base matrix.

        Returns (c1_ntt [nq,nb,L,N] i32, c0_ip [nq,nb,L,B] i32,
        norms [nq,P] i64). Uploads only query cts + indices; the candidate
        gather, packing, NTTs, MACs, and c0 truncation all run on-device
        (backend='tpu') or vectorized on host."""
        bundled, norms = self.encrypted_scores_trunc_async(cts, cand_idx)
        return self.trunc_unbundle(np.asarray(bundled), norms)

    def encrypted_scores_trunc_async(
        self, cts: List[Ciphertext], cand_idx: np.ndarray
    ):
        """Launch the truncated MAC; returns (bundled result, norms).

        On the 'tpu' backend the bundled result is an UNFETCHED device array
        ([nq, nb, L, N+B] i32) — callers can overlap the download with the
        next batch's host work, then call trunc_unbundle(np.asarray(r))."""
        assert self._base_host is not None, "call set_base() first"
        p = self.params
        nq, P = cand_idx.shape
        d = self._base_host.shape[1]
        B = p.n // d
        nb = -(-P // B)
        pad_idx = np.full((nq, nb * B), self._base_host.shape[0] - 1, np.int32)
        pad_idx[:, :P] = cand_idx
        cts = [self.ctx.to_ntt(c) if not c.is_ntt else c for c in cts]
        ctq = np.stack(
            [np.stack([c.c0 for c in cts]), np.stack([c.c1 for c in cts])],
            axis=1,
        ).astype(np.int32)                                # [nq, 2, L, N]
        gathered = self._base_host[cand_idx.astype(np.int64)].astype(np.int64)
        norms = (gathered ** 2).sum(-1)                   # [nq, P]
        if self.backend == "tpu":
            bundled = self._trunc_mac_fn(
                self._base_dev, jnp.asarray(ctq), jnp.asarray(pad_idx),
            )
        else:
            c1_ntt, c0_ip = self._trunc_mac_numpy(
                ctq[:, 0], ctq[:, 1], pad_idx
            )
            bundled = np.concatenate([c1_ntt, c0_ip], axis=-1)
        return bundled, norms

    def trunc_unbundle(self, bundled: np.ndarray, norms: np.ndarray):
        """[nq, nb, L, N+B] → (c1_ntt [nq,nb,L,N], c0_ip [nq,nb,L,B], norms)."""
        n = self.params.n
        return bundled[..., :n], bundled[..., n:], norms

    # -- packed single-ct response ----------------------------------------
    # The q1 wire still ships one full c1 poly per (query, block) — 132 KB
    # per query at the config-2 operating point, and the download IS the
    # e2e bottleneck. This mode extracts the inner-product coefficients
    # with the SealPIR automorphisms run in the killing direction
    # (BFVContext.extraction_elts), then monomial-shifts every (query,
    # block) result to a distinct coefficient offset and SUMS d/nb queries'
    # worth of blocks into ONE 2-limb ciphertext: ~2 KB of wire per query,
    # 66× less. Needs client-registered Galois keys (public) and an ODD
    # plaintext modulus (bfv_params_for odd_t) so the ×d extraction factor
    # inverts client-side. Fills the same reference slot as the other
    # response modes (include/client/client_lib.h:28-30).

    def register_galois_keys(self, key_id: str, gks_wire: dict) -> None:
        """Register client-generated extraction keys {g: RelinKey wire}."""
        from prefhetch_tpu.crypto.bfv import RelinKey

        if not hasattr(self, "_galois_bfv"):
            self._galois_bfv = {}
        keys = {int(g): RelinKey.from_wire(w) for g, w in gks_wire.items()}
        L = len(self.params.qs)
        for g, rk in keys.items():
            # the device key-switch derives the digit ladder from the key
            # SHAPE (n_digits = n_comp/L, digit_bits = 30/n_digits) — a
            # wire whose declared width disagrees would silently corrupt
            if 30 % rk.digit_bits or (
                rk.b.shape[0] != L * (30 // rk.digit_bits)
            ):
                raise ValueError(
                    f"galois key {g}: digitBits {rk.digit_bits} / shape "
                    f"{rk.b.shape} inconsistent with {L} limbs"
                )
        self._galois_bfv[key_id] = keys
        self._packed_keys_dev = getattr(self, "_packed_keys_dev", {})
        self._packed_keys_dev.pop(key_id, None)

    def has_galois_keys(self, key_id: str) -> bool:
        return key_id in getattr(self, "_galois_bfv", {})

    def encrypted_scores_packed(
        self,
        cts: List[Ciphertext],        # [nq] NTT-domain encrypted queries
        cand_idx: np.ndarray,         # [nq, P] int candidate row indices
        key_id: str,
    ) -> Tuple[List[Ciphertext], np.ndarray, int]:
        """Batched MAC + coefficient extraction + shift-pack.

        Returns ([n_out] coeff-domain 2-limb Ciphertexts, norms [nq, P],
        G = queries per output ct). Query qi's inner product with candidate
        b·B + j sits at plaintext coefficient j·d + (qi mod G)·nb + b of
        output ct qi//G, scaled by d (client multiplies by d⁻¹ mod t —
        HEClient.decrypt_scores_packed)."""
        return self.encrypted_scores_packed_async(cts, cand_idx, key_id)()

    def encrypted_scores_packed_async(
        self,
        cts: List[Ciphertext],
        cand_idx: np.ndarray,
        key_id: str,
    ):
        """Async form: launches the device program and returns a zero-arg
        resolver → (packed cts, norms, G); the d2h download is deferred so
        callers can overlap it with the next batch's host crypto. The
        resolver exposes .program_repeat (re-dispatch on the same parked
        device args — the bench's pure device-rate probe)."""
        assert self._base_host is not None, "call set_base() first"
        p = self.params
        # NOTE: t never enters the server-side ring ops (Δ-scaling and
        # decrypt are client-side) — the ODD-t requirement for inverting
        # the ×d extraction factor is the CLIENT's (HEClient picks odd t
        # when resp_mod="packed"), so any server serves packed requests
        gks = getattr(self, "_galois_bfv", {}).get(key_id)
        if gks is None:
            raise ValueError("unknown BFV keyId — register Galois keys first")
        n = p.n
        nq, P = cand_idx.shape
        d = self._base_host.shape[1]
        B = n // d
        nb = -(-P // B)
        G = max(1, d // nb)
        assert G * nb <= d, "pack offsets must fit the coefficient stride"
        pad_idx = np.full((nq, nb * B), self._base_host.shape[0] - 1, np.int32)
        pad_idx[:, :P] = cand_idx
        cts = [self.ctx.to_ntt(c) if not c.is_ntt else c for c in cts]
        ctq = np.stack(
            [np.stack([c.c0 for c in cts]), np.stack([c.c1 for c in cts])],
            axis=1,
        ).astype(np.int64)                               # [nq, 2, L, N]
        gathered = self._base_host[cand_idx.astype(np.int64)].astype(np.int64)
        norms = (gathered ** 2).sum(-1)                  # [nq, P]
        for g in self.ctx.extraction_elts(n, d):
            if g not in gks:
                raise ValueError(f"missing Galois key for element {g}")
        if self.backend == "tpu":
            # pad queries to a multiple of G with zero cts (a zero ct is a
            # valid encryption of 0 — contributes nothing to the group sum).
            # Buffers are FRESH per call: jnp.asarray may DMA the host
            # buffer asynchronously, so reuse across pipelined requests
            # could corrupt an in-flight transfer
            nqp = -(-nq // G) * G
            ctq_p = np.zeros((nqp,) + ctq.shape[1:], np.int32)
            ctq_p[:nq] = ctq
            idx_p = np.full(
                (nqp, nb * B), self._base_host.shape[0] - 1, np.int32
            )
            idx_p[:nq] = pad_idx
            mono_pre, shift_tabs = self._packed_shift_tables(d, nb, G)
            fn = self._packed_mac_fns[0]
            dev_args = (
                self._base_dev, jnp.asarray(ctq_p), jnp.asarray(idx_p),
                *self._packed_dev_keys(key_id), mono_pre, shift_tabs,
            )
            dev_out = fn(*dev_args)                     # UNFETCHED

            def resolve():
                packed = np.asarray(dev_out).astype(np.int64)
                out = [
                    Ciphertext(c0=packed[i, 0], c1=packed[i, 1], is_ntt=False)
                    for i in range(packed.shape[0])
                ]
                return out, norms, G

            resolve.dev_out = dev_out
            resolve.program_repeat = lambda: fn(*dev_args)
            return resolve

        def resolve_host():
            packed = self._packed_mac_numpy(ctq, pad_idx, gks)
            out = [
                Ciphertext(c0=packed[i, 0], c1=packed[i, 1], is_ntt=False)
                for i in range(packed.shape[0])
            ]
            return out, norms, G

        return resolve_host

    def encrypted_scores_packed_wire(
        self, wires: List[dict], cand_idx: np.ndarray, key_id: str
    ):
        return self.encrypted_scores_packed_wire_async(
            wires, cand_idx, key_id
        )()

    def encrypted_scores_packed_wire_async(
        self, wires: List[dict], cand_idx: np.ndarray, key_id: str
    ):
        """Packed response straight from ct WIRES. For seedTf wires on the
        device backend, only c0 + the 8-byte threefry keys are uploaded —
        the c1 mask is regenerated inside the jitted program
        (crypto/bfv.tf_uniform_rns), halving the request's h2d bytes.
        Other wire forms fall back to host expansion."""
        import base64

        if self.backend != "tpu" or not all("seedTf" in w for w in wires):
            cts = [self.ctx.ct_from_wire(w) for w in wires]
            return self.encrypted_scores_packed_async(cts, cand_idx, key_id)
        assert self._base_host is not None, "call set_base() first"
        p = self.params
        gks = getattr(self, "_galois_bfv", {}).get(key_id)
        if gks is None:
            raise ValueError("unknown BFV keyId — register Galois keys first")
        n = p.n
        L = len(p.qs)
        nq, P = cand_idx.shape
        d = self._base_host.shape[1]
        B = n // d
        nb = -(-P // B)
        G = max(1, d // nb)
        if G * nb > d:
            raise ValueError(
                "packed response needs ceil(P/B) <= d blocks "
                f"(P={P}, B={B}, d={d})"
            )
        for g in self.ctx.extraction_elts(n, d):
            if g not in gks:
                raise ValueError(f"missing Galois key for element {g}")
        pad_idx = np.full((nq, nb * B), self._base_host.shape[0] - 1, np.int32)
        pad_idx[:, :P] = cand_idx
        gathered = self._base_host[cand_idx.astype(np.int64)].astype(np.int64)
        norms = (gathered ** 2).sum(-1)
        nqp = -(-nq // G) * G
        c0s = np.zeros((nqp, L, n), np.int32)
        seeds = np.zeros((nqp, 2), np.uint32)
        valid = np.zeros(nqp, np.int32)
        for i, w in enumerate(wires):
            c0s[i] = np.frombuffer(
                base64.b64decode(w["c0"]), dtype="<u4"
            ).astype(np.int32).reshape(L, n)
            seeds[i] = np.asarray(w["seedTf"], np.uint32)
            valid[i] = 1
        idx_p = np.full(
            (nqp, nb * B), self._base_host.shape[0] - 1, np.int32
        )
        idx_p[:nq] = pad_idx
        mono_pre, shift_tabs = self._packed_shift_tables(d, nb, G)
        fn = self._packed_mac_fns[1]
        dev_args = (
            self._base_dev, jnp.asarray(c0s), jnp.asarray(seeds),
            jnp.asarray(valid), jnp.asarray(idx_p),
            *self._packed_dev_keys(key_id), mono_pre, shift_tabs,
        )
        dev_out = fn(*dev_args)                         # UNFETCHED

        def resolve():
            packed = np.asarray(dev_out).astype(np.int64)
            out = [
                Ciphertext(c0=packed[i, 0], c1=packed[i, 1], is_ntt=False)
                for i in range(packed.shape[0])
            ]
            return out, norms, G

        resolve.dev_out = dev_out
        resolve.program_repeat = lambda: fn(*dev_args)
        return resolve

    def _packed_mac_numpy(
        self, ctq: np.ndarray, pad_idx: np.ndarray, gks: dict
    ) -> np.ndarray:
        """Host oracle → [n_out, 2, L, N] int64 coeff-domain residues."""
        from prefhetch_tpu.crypto.ntt import intt

        p = self.params
        n = p.n
        qs = np.array(p.qs, np.int64)[None, :, None]
        nq, npad = pad_idx.shape
        d = self._base_host.shape[1]
        B = n // d
        nb = npad // B
        G = max(1, d // nb)
        M = nq * nb
        rows = self._base_host[pad_idx].astype(np.int64)
        polys = rows[:, :, ::-1].reshape(M, n)
        # X^{-(d-1)} pre-shift folded into the MAC: IPs land at coeffs j·d
        e0 = (2 * n - (d - 1)) % (2 * n)
        mono = np.zeros(n, np.int64)
        mono[e0 % n] = 1 if e0 < n else -1
        c0p = np.empty((M, len(p.qs), n), np.int64)
        c1p = np.empty_like(c0p)
        for i, tb in enumerate(self.ctx.tables):
            q = tb.q
            pt = ntt(polys % q, tb).reshape(nq, nb, n)
            mono_ntt = ntt(mono % q, tb)
            o1 = ctq[:, None, 1, i] * pt % q * mono_ntt % q
            o0 = ctq[:, None, 0, i] * pt % q * mono_ntt % q
            c0p[:, i] = intt(o0.reshape(M, n), tb)
            c1p[:, i] = intt(o1.reshape(M, n), tb)
        # kill every coefficient except the j·d inner products (×d factor)
        for g in self.ctx.extraction_elts(n, d):
            c0g, c1g = self.ctx.apply_galois_batch(c0p, c1p, g, gks[g])
            c0p = np.mod(c0p + c0g, qs)
            c1p = np.mod(c1p + c1g, qs)
        # shift row (qi, b) by X^{(qi mod G)·nb + b}, sum groups of G queries
        k = np.arange(n)
        n_out = -(-nq // G)
        out = np.zeros((n_out, 2, len(p.qs), n), np.int64)
        for qi in range(nq):
            for b in range(nb):
                e = (qi % G) * nb + b
                dest = (k + e) % (2 * n)
                sign = np.where(dest < n, 1, -1)
                m = qi * nb + b
                grp = qi // G
                for comp, arr in ((0, c0p), (1, c1p)):
                    shifted = np.zeros((len(p.qs), n), np.int64)
                    shifted[:, dest % n] = arr[m] * sign[None, :]
                    out[grp, comp] = np.mod(
                        out[grp, comp] + shifted, qs[0]
                    )
        return out

    # -- packed response: device pipeline ---------------------------------
    @functools.cached_property
    def _packed_tables(self):
        """Four-step NTT tables over qs + special_p, plus the natural→
        four-step permutation (device NTT domain layout)."""
        from prefhetch_tpu.ops.ntt_mxu import build_ntt4_tables

        sp = self.ctx._special_p
        ext = tuple(self.params.qs) + (sp,)
        tabs = [build_ntt4_tables(q, self.params.n) for q in ext]
        t0 = tabs[0]
        j1, j2 = np.meshgrid(
            np.arange(t0.n1), np.arange(t0.n2), indexing="ij"
        )
        perm = (j2 * t0.n1 + j1).reshape(-1)
        return ext, tabs, perm

    def _packed_shift_tables(self, d: int, nb: int, G: int):
        """Device monomial-NTT tables for the packed program: (mono_pre
        [L, N] i32 = NTT(X^{-(d-1)}), shift_tabs [L, G·nb, N] i32 =
        NTT(X^{g·nb+b})) in four-step order. Cached per layout."""
        cache = getattr(self, "_packed_shift_cache", None)
        if cache is None:
            cache = self._packed_shift_cache = {}
        key = (d, nb, G)
        if key in cache:
            return cache[key]
        from prefhetch_tpu.crypto.ntt import build_tables
        from prefhetch_tpu.crypto.ntt import ntt as host_ntt

        p = self.params
        n = p.n
        _ext, _tabs, four_perm = self._packed_tables
        pre_e = (2 * n - (d - 1)) % (2 * n)
        pack_shifts = [g * nb + b for g in range(G) for b in range(nb)]

        def mono_rows(shifts, q, tb_host):
            rows = np.zeros((len(shifts), n), np.int64)
            for r, e in enumerate(shifts):
                e = e % (2 * n)
                rows[r, e % n] = 1 if e < n else q - 1
            return host_ntt(rows, tb_host)[:, four_perm]

        mono_pre, shift_tabs = [], []
        for q in p.qs:
            tb_host = build_tables(q, n)
            mono_pre.append(mono_rows([pre_e], q, tb_host)[0])
            shift_tabs.append(mono_rows(pack_shifts, q, tb_host))
        out = (
            jnp.asarray(np.stack(mono_pre).astype(np.int32)),
            jnp.asarray(np.stack(shift_tabs).astype(np.int32)),
        )
        cache[key] = out
        return out

    def _packed_dev_keys(self, key_id: str):
        """Stacked device args for the packed program (cached per key_id):
        (kb, ka [n_elts, n_comp, n_ext, N] i32 four-step NTT domain,
        perms, signs [n_elts, N] i32 automorphism maps)."""
        cache = getattr(self, "_packed_keys_dev", None)
        if cache is None:
            cache = self._packed_keys_dev = {}
        if key_id in cache:
            return cache[key_id]
        from prefhetch_tpu.crypto.ntt import build_tables
        from prefhetch_tpu.crypto.ntt import ntt as host_ntt

        p = self.params
        n = p.n
        d = self._base_host.shape[1]
        ext, _tabs, four_perm = self._packed_tables
        ext_tables = [build_tables(q, n) for q in ext]
        gks = self._galois_bfv[key_id]
        elts = self.ctx.extraction_elts(n, d)
        kbs, kas, perms, signs = [], [], [], []
        for g in elts:
            rk = gks[g]
            assert tuple(rk.ext) == ext, "key basis must match params"
            kb = np.empty_like(rk.b)
            ka = np.empty_like(rk.a)
            for e, q in enumerate(ext):
                tb = ext_tables[e]
                kb[:, e] = host_ntt(rk.b[:, e] % q, tb)[:, four_perm]
                ka[:, e] = host_ntt(rk.a[:, e] % q, tb)[:, four_perm]
            kbs.append(kb.astype(np.int32))
            kas.append(ka.astype(np.int32))
            pm, sg = self.ctx._automorphism_map(g)
            perms.append(pm.astype(np.int32))
            signs.append(sg.astype(np.int32))
        out = (
            jnp.asarray(np.stack(kbs)), jnp.asarray(np.stack(kas)),
            jnp.asarray(np.stack(perms)), jnp.asarray(np.stack(signs)),
        )
        cache[key_id] = out
        return out

    @functools.cached_property
    def _packed_mac_fns(self):
        """Two jitted programs → (packed_mac, packed_mac_seeded):
        packed_mac takes the full ctq [nq', 2, L, N] i32 natural-NTT
        domain (nq' padded to a multiple of G with zero cts); the seeded
        twin takes (c0q [nq', L, N], seeds [nq', 2] u32, valid [nq']) and
        regenerates c1 on device. Both: (…, pad_idx [nq', npad],
        kb/ka/perms/signs from _packed_dev_keys, mono/shift tables) →
        [n_out, 2, L, N] i32 coeff-domain packed response cts.

        Device twin of _packed_mac_numpy: MAC with the X^{-(d-1)} shift
        folded in (NTT-domain monomial multiply), log2(d) extraction
        rounds (automorphism + hybrid key-switch, every transform an MXU
        four-step NTT), then the shift-pack as ONE NTT-domain multiply by
        per-row monomial vectors + a segment sum — no lane-axis gathers on
        the pack side."""
        from prefhetch_tpu.ops.ntt_mxu import (
            intt4, modmul, modmul_lazy, ntt4, shift_mod_reduce,
        )

        p = self.params
        n = p.n
        L = len(p.qs)
        ext, tabs, four_perm = self._packed_tables
        sp = ext[-1]
        half_p = sp // 2
        inv_p = [int(pow(sp % q, -1, q)) for q in p.qs]
        perm_j = jnp.asarray(four_perm)

        def keyswitch(c1r, kb, ka):
            """c1r [M, L, N] coeff → (ks0, ks1) [M, L, N] coeff (mod qs).

            Digit structure derives from the KEY's static shape: n_comp =
            kb.shape[0] = L·n_digits (30-bit keys halve the digit NTT
            rows — RelinKey.digit_bits)."""
            M = c1r.shape[0]
            n_comp = kb.shape[0]
            n_digits = n_comp // L
            digit_bits = 30 // n_digits
            dmask = (1 << digit_bits) - 1
            digs = []
            for i in range(L):
                limb = c1r[:, i].astype(jnp.int32)
                for dd in range(n_digits):
                    digs.append((limb >> (dd * digit_bits)) & dmask)
            digits = jnp.stack(digs, axis=1)          # [M, n_comp, N]
            flat = digits.reshape(M * n_comp, n)
            acc0, acc1 = [], []
            for e, q in enumerate(ext):
                tb = tabs[e]
                D = ntt4(flat, tb).reshape(M, n_comp, n)
                s0 = jnp.zeros((M, n), jnp.int64)
                s1 = jnp.zeros((M, n), jnp.int64)
                for c in range(n_comp):
                    s0 = s0 + modmul_lazy(
                        D[:, c], kb[c, e][None], q, tb.delta
                    )
                    s1 = s1 + modmul_lazy(
                        D[:, c], ka[c, e][None], q, tb.delta
                    )
                # n_comp lazy terms < n_comp·2^51 ≤ 2^54 — one reduce
                s0 = shift_mod_reduce(s0, q, tb.delta, 55)
                s1 = shift_mod_reduce(s1, q, tb.delta, 55)
                i01 = intt4(jnp.concatenate([s0, s1], 0), tb)
                acc0.append(i01[:M])
                acc1.append(i01[M:])
            cp0 = acc0[-1]
            cp1 = acc1[-1]
            cp0s = jnp.where(cp0 > half_p, cp0 - sp, cp0)
            cp1s = jnp.where(cp1 > half_p, cp1 - sp, cp1)
            out0, out1 = [], []
            for i, q in enumerate(p.qs):
                tb = tabs[i]
                d0 = acc0[i] - cp0s
                d0 = jnp.where(d0 < 0, d0 + q, d0)
                d0 = jnp.where(d0 >= q, d0 - q, d0)
                d1 = acc1[i] - cp1s
                d1 = jnp.where(d1 < 0, d1 + q, d1)
                d1 = jnp.where(d1 >= q, d1 - q, d1)
                out0.append(modmul(d0, jnp.int64(inv_p[i]), q, tb.delta))
                out1.append(modmul(d1, jnp.int64(inv_p[i]), q, tb.delta))
            return jnp.stack(out0, 1), jnp.stack(out1, 1)

        def madd(a, b, q):
            s = a + b
            return jnp.where(s >= q, s - q, s)

        def packed_body(base_pad, c0q, c1q, pad_idx, kb, ka, perms, signs,
                        mono_pre, shift_tabs):
            # c0q/c1q [nq, L, N] FOUR-STEP NTT domain; mono_pre [L, N] i32:
            # NTT(X^{-(d-1)}) per limb (four-step order); shift_tabs
            # [L, G·nb, N] i32: NTT(X^e) for the pack offsets — device
            # ARGS, not multi-MB jit constants
            nq, npad = pad_idx.shape
            d = base_pad.shape[1]
            B = n // d
            nb = npad // B
            G = max(1, d // nb)
            M = nq * nb
            n_out = nq // G
            elts = self.ctx.extraction_elts(n, d)
            c0p, c1p = [], []
            rows = base_pad[pad_idx]
            polys = rows[:, :, ::-1].reshape(M, n)
            for i in range(L):
                tb = tabs[i]
                q = tb.q
                lifted = jnp.where(polys < 0, polys + q, polys)
                pt = ntt4(lifted, tb)
                pt = modmul(
                    pt, mono_pre[i][None], q, tb.delta
                ).reshape(nq, nb, n)
                o1 = modmul(c1q[:, None, i], pt, q, tb.delta)
                o0 = modmul(c0q[:, None, i], pt, q, tb.delta)
                i01 = intt4(
                    jnp.concatenate([o0, o1], 0).reshape(2 * M, n), tb
                )
                c0p.append(i01[:M])
                c1p.append(i01[M:])
            c0 = jnp.stack(c0p, 1)                    # [M, L, N] coeff
            c1 = jnp.stack(c1p, 1)
            # extraction rounds: ct += σ_g(ct)
            for r in range(len(elts)):
                perm = perms[r]
                sign = signs[r]
                g0l, g1l = [], []
                for i, q in enumerate(p.qs):
                    v0 = c0[:, i, :][:, perm]
                    v1 = c1[:, i, :][:, perm]
                    g0l.append(jnp.where(
                        sign[None, :] > 0, v0,
                        jnp.where(v0 == 0, 0, q - v0),
                    ))
                    g1l.append(jnp.where(
                        sign[None, :] > 0, v1,
                        jnp.where(v1 == 0, 0, q - v1),
                    ))
                c0g = jnp.stack(g0l, 1)
                c1g = jnp.stack(g1l, 1)
                ks0, ks1 = keyswitch(c1g, kb[r], ka[r])
                n0l, n1l = [], []
                for i, q in enumerate(p.qs):
                    n0l.append(madd(c0[:, i], madd(c0g[:, i], ks0[:, i], q), q))
                    n1l.append(madd(c1[:, i], ks1[:, i], q))
                c0 = jnp.stack(n0l, 1)
                c1 = jnp.stack(n1l, 1)
            # shift-pack: NTT-domain multiply by per-row monomials + group sum
            outs = []
            for i in range(L):
                tb = tabs[i]
                q = tb.q
                tiled = jnp.tile(shift_tabs[i], (n_out, 1))   # [M, N]
                nt = ntt4(
                    jnp.concatenate([c0[:, i], c1[:, i]], 0), tb
                )
                sh0 = modmul(nt[:M], tiled, q, tb.delta)
                sh1 = modmul(nt[M:], tiled, q, tb.delta)
                s0 = sh0.reshape(n_out, G * nb, n).sum(1)
                s1 = sh1.reshape(n_out, G * nb, n).sum(1)
                # G·nb reduced terms < 2^30 each: size the reduce to the
                # actual sum bound (40 bits only held for G·nb ≤ 1024)
                sum_bits = 30 + (G * nb).bit_length()
                s01 = shift_mod_reduce(
                    jnp.concatenate([s0, s1], 0), q, tb.delta, sum_bits
                )
                cc = intt4(s01, tb)
                outs.append(
                    jnp.stack([cc[:n_out], cc[n_out:]], 1)
                )                                     # [n_out, 2, N]
            return jnp.stack(outs, 2).astype(jnp.int32)  # [n_out, 2, L, N]

        def packed_mac(base_pad, ctq, pad_idx, kb, ka, perms, signs,
                       mono_pre, shift_tabs):
            c0q = ctq[:, 0][..., perm_j]
            c1q = ctq[:, 1][..., perm_j]
            return packed_body(base_pad, c0q, c1q, pad_idx, kb, ka,
                               perms, signs, mono_pre, shift_tabs)

        def packed_mac_seeded(base_pad, c0q_nat, seeds, valid, pad_idx,
                              kb, ka, perms, signs, mono_pre, shift_tabs):
            # seedTf wire: the c1 mask is regenerated INSIDE the program
            # from the 8-byte threefry key (crypto/bfv.tf_uniform_rns) —
            # the c1 half of the query upload disappears. valid [nq] i32
            # zeroes the expansion for zero-ct pad queries (their seeds
            # are dummies; a zero ct must stay a zero ct in the group sum)
            import jax as _jax

            from prefhetch_tpu.crypto.bfv import tf_uniform_rns

            c0q = c0q_nat[..., perm_j]
            a = _jax.vmap(
                lambda kd: tf_uniform_rns(kd, p.qs, n)
            )(seeds)                                  # [nq, L, N] coeff
            a = a * valid[:, None, None].astype(jnp.int64)
            c1q = jnp.stack(
                [ntt4(a[:, i], tabs[i]) for i in range(L)], 1
            )
            return packed_body(base_pad, c0q, c1q, pad_idx, kb, ka,
                               perms, signs, mono_pre, shift_tabs)

        return jax.jit(packed_mac), jax.jit(packed_mac_seeded)

    @functools.cached_property
    def _mac_fn_jax(self):
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

    def _mac_numpy(self, c0, c1, pt_polys):
        outs0, outs1 = [], []
        for i, tb in enumerate(self.ctx.tables):
            q = tb.q
            pt_ntt = ntt(pt_polys % q, tb)              # [B, N] numpy path
            outs0.append(c0[i][None, :] * pt_ntt % q)
            outs1.append(c1[i][None, :] * pt_ntt % q)
        return np.stack(outs0, axis=1), np.stack(outs1, axis=1)

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
        if self.backend == "tpu":
            # nq=1 case of the batch kernel (one shared jitted program)
            o0, o1 = self._mac_batch_fn_mxu(
                self._dev_digit_mats[0],
                jnp.asarray(ct.c0)[None], jnp.asarray(ct.c1)[None],
                jnp.asarray(polys),
            )
            c0, c1 = np.asarray(o0)[0], np.asarray(o1)[0]
        elif self.backend == "jax":
            c0, c1 = self._mac_fn_jax(
                jnp.asarray(ct.c0), jnp.asarray(ct.c1), jnp.asarray(polys)
            )
            c0, c1 = np.asarray(c0), np.asarray(c1)
        else:
            c0, c1 = self._mac_numpy(ct.c0, ct.c1, polys)
        out = [
            Ciphertext(c0=c0[b], c1=c1[b], is_ntt=True)
            for b in range(c0.shape[0])
        ]
        norms = (np.round(candidates).astype(np.int64) ** 2).sum(-1)
        return out, norms

    @functools.cached_property
    def _mac_batch_fn_mxu(self):
        """Device path for the multi-query MAC: forward NTT of ALL
        (query, block) plaintexts as one int8-MXU matmul batch + pointwise
        modular multiply — one jit dispatch per request batch."""
        from prefhetch_tpu.ops.ntt_mxu import build_mxu_tables, modmul, ntt_mxu

        tables = [build_mxu_tables(q, self.params.n) for q in self.params.qs]

        def mac(fdigs, c0q, c1q, flat_polys):
            # c0q/c1q: [nq, L, N]; flat_polys: [nq·B, N] small SIGNED ints —
            # group sizes are static at trace time from the array shapes.
            # All modular arithmetic is division-free (shift_mod_reduce):
            # int64 `%` lowers to an emulated long-division loop on TPU that
            # dominated this kernel by ~20×.
            nq = c0q.shape[0]
            n_blocks = flat_polys.shape[0] // nq
            outs0, outs1 = [], []
            for i, tb in enumerate(tables):
                q = tb.q
                lifted = jnp.where(flat_polys < 0, flat_polys + q, flat_polys)
                pt = ntt_mxu(lifted, tb, fdigs[i]).reshape(
                    nq, n_blocks, -1
                )                                       # [nq, B, N]
                outs0.append(modmul(c0q[:, None, i], pt, q, tb.delta))
                outs1.append(modmul(c1q[:, None, i], pt, q, tb.delta))
            return (
                jnp.stack(outs0, axis=2).astype(jnp.int32),
                jnp.stack(outs1, axis=2).astype(jnp.int32),
            )

        return jax.jit(mac)

    def encrypted_scores_batch(
        self,
        cts: List[Ciphertext],        # [nq] NTT-domain encrypted queries
        candidates: np.ndarray,       # [nq, P, d]
    ) -> Tuple[List[List[Ciphertext]], np.ndarray]:
        """Batched MACs: one NTT over all (query, block) plaintexts at once.

        Returns ([nq][n_blocks] result cts, norms [nq, P])."""
        nq, P, d = candidates.shape
        cts = [self.ctx.to_ntt(c) if not c.is_ntt else c for c in cts]
        polys = np.stack(
            [pack_candidates(candidates[i], self.params)[0] for i in range(nq)]
        )                                              # [nq, n_blocks, N]
        n_blocks = polys.shape[1]
        flat = polys.reshape(nq * n_blocks, -1)
        c0q = np.stack([c.c0 for c in cts])            # [nq, L, N]
        c1q = np.stack([c.c1 for c in cts])
        if self.backend == "tpu":
            o0, o1 = self._mac_batch_fn_mxu(
                self._dev_digit_mats[0],
                jnp.asarray(c0q), jnp.asarray(c1q), jnp.asarray(flat),
            )
            out0, out1 = np.asarray(o0), np.asarray(o1)
        else:
            out0 = np.empty(
                (nq, n_blocks, len(self.params.qs), self.params.n), np.int64
            )
            out1 = np.empty_like(out0)
            for i, tb in enumerate(self.ctx.tables):
                q = tb.q
                pt_ntt = ntt(flat % q, tb).reshape(nq, n_blocks, -1)
                out0[:, :, i] = c0q[:, None, i] * pt_ntt % q
                out1[:, :, i] = c1q[:, None, i] * pt_ntt % q
        result = [
            [Ciphertext(c0=out0[qi, b], c1=out1[qi, b], is_ntt=True)
             for b in range(n_blocks)]
            for qi in range(nq)
        ]
        norms = (np.round(candidates).astype(np.int64) ** 2).sum(-1)
        return result, norms
