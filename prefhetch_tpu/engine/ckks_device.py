"""Device CKKS: slot-packed encrypted scoring with on-device key-switching.

Replaces the host-numpy rotate-accumulate of CKKSComputeService
(engine/hecompute.py) for the server path — BASELINE config 3 (N=8192,
slot packing). This realizes the reference's reserved encrypted scoring
capability (reference: include/client/client_lib.h:28-36, SEAL slot
CMakeLists.txt:33-38) as one jitted TPU program per request:

- ct×pt multiply: forward MXU NTTs (ops/ntt_mxu — int8 digit matmuls),
  pointwise division-free modmul, inverse NTT, exact RNS rescale.
- slot rotations: the Galois automorphism X → X^{5^s} is a precomputed
  permutation+sign gather; key-switching digit-decomposes c1 into 15-bit
  digits (VPU shifts), forward-NTTs ALL (block, component) digit polys as
  one MXU batch per RNS prime, multiplies against the pre-NTT'd Galois key,
  inverse-NTTs the two accumulated sums, and divides by the special
  modulus p — the standard hybrid key-switch, laid out so every heavy op
  is an int8 MXU matmul.

The server holds only PUBLIC key material (client-registered Galois keys).
Numerics are exact integer RNS arithmetic — device outputs equal the host
CKKSContext bit-for-bit (tests/test_ckks_device.py).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prefhetch_tpu.crypto.ckks import (
    DIGIT_BITS, CKKSCiphertext, CKKSContext, GaloisKey,
)
from prefhetch_tpu.crypto.ntt import ntt as host_ntt
from prefhetch_tpu.crypto.params import CKKSParams
from prefhetch_tpu.ops.ntt_mxu import (
    build_ntt4_tables, intt4, modmul, modmul_lazy, ntt4, shift_mod_reduce,
)


def _mod_sub(a: jax.Array, b: jax.Array, q: int) -> jax.Array:
    """(a − b) mod q for residues already in [0, q)."""
    d = a - b
    return jnp.where(d < 0, d + q, d)


def _mod_add(a: jax.Array, b: jax.Array, q: int) -> jax.Array:
    s = a + b
    return jnp.where(s >= q, s - q, s)


class DeviceCKKS:
    """Server-side CKKS scoring service, device key-switching backend.

    Same interface as engine.hecompute.CKKSComputeService: register_keys /
    has_keys / encrypted_scores. Slot layout identical (query replicated
    across slots; per_ct = (N/2)/d candidates per plaintext; log2(d)
    rotate-left-accumulate steps leave ⟨q, x_j⟩ in slot j·d)."""

    def __init__(self, params: CKKSParams):
        self.params = params
        self.ctx = CKKSContext(params)          # host ops: encode, tables
        n = params.n
        self.L = len(params.qs)
        self.ext: Tuple[int, ...] = self.ctx.ext          # qs + (p,)
        # four-step NTT (N = N1·N2): N·(N1+N2) MACs per transform and
        # kilobyte-scale matrices — the dense N² digit matrix at N=8192 is
        # 268 MB and its HBM read dominated the whole key-switch
        self.mxu = [build_ntt4_tables(q, n) for q in self.ext]
        t0 = self.mxu[0]
        j1, j2 = np.meshgrid(
            np.arange(t0.n1), np.arange(t0.n2), indexing="ij"
        )
        # natural NTT order → four-step order (slot j1·N2+j2 holds true j2·N1+j1)
        self._four_perm = (j2 * t0.n1 + j1).reshape(-1)
        # per-key-id: step -> (Kb_ntt, Ka_ntt) [n_comp, n_ext_all, N] i32 dev
        self._keys: Dict[str, Dict[int, Tuple[jax.Array, jax.Array]]] = {}
        # rotation schedule for inner products of dimension d (set lazily)
        self._steps_cache: Dict[int, List[int]] = {}
        # parked candidate base (set_base): [nbase+1, d] f32 with a zero
        # pad row at index nbase — requests then carry INDICES, not rows
        self._base_dev: jax.Array | None = None

    # ------------------------------------------------------------------
    def set_base(self, base: np.ndarray) -> None:
        """Park the candidate base on device (one h2d at registration,
        like HEComputeService.set_base — the reference server owns the
        base, src/server/server_lib.cpp:126-130). Requests then upload
        [nq, P] int32 candidate INDICES instead of [nq, P, d] f32 rows:
        through this sandbox's ~80 MB/s relay the row upload was the
        dominant per-call cost of the combined CKKS path (8.4 MB/call at
        the config-3 operating point vs 64 KB of ids). The gather runs
        inside the score program (whole d-lane rows — tile-friendly) and
        candidate norms are computed on device from the same rows."""
        from prefhetch_tpu.engine.hecompute import CKKSComputeService as _H

        cand_scale = float(1 << _H.CAND_SCALE_BITS)
        # same int32-overflow headroom bound as the per-call encode path
        assert np.abs(base).max() < 16.0 * cand_scale, \
            "base values overflow the combined-encode headroom"
        padded = np.zeros((base.shape[0] + 1, base.shape[1]), np.float32)
        padded[:-1] = base
        self._base_dev = jnp.asarray(padded)

    # ------------------------------------------------------------------
    def register_keys(self, key_id: str, gks_wire: dict) -> None:
        """Pre-NTT every Galois key component over the full extended basis
        (host, once per client) and park the result on device.

        The key-switch digit width comes from the key wire itself
        (GaloisKey.digitBits — negotiated like BFV's RelinKey), validated
        against the component-count shape; it is stored per key_id and
        threaded into the compiled score programs."""
        out = {}
        dbits = None
        for step_s, wire in gks_wire.items():
            gk = GaloisKey.from_wire(wire)
            n_comp = gk.b.shape[0]
            if dbits is None:
                dbits = int(gk.digit_bits)
                nd = -(-30 // dbits)
            if int(gk.digit_bits) != dbits or n_comp != self.L * nd:
                raise ValueError(
                    f"galois key {step_s}: digitBits {gk.digit_bits} / "
                    f"{n_comp} components inconsistent with "
                    f"digitBits {dbits} (L={self.L})"
                )
            kb = np.empty_like(gk.b)
            ka = np.empty_like(gk.a)
            for e, q in enumerate(self.ext):
                tb = self.ctx.tables[e]
                # four-step order (matches ntt4's private domain layout)
                kb[:, e] = host_ntt(gk.b[:, e] % q, tb)[:, self._four_perm]
                ka[:, e] = host_ntt(gk.a[:, e] % q, tb)[:, self._four_perm]
            out[int(step_s)] = (
                jnp.asarray(kb.astype(np.int32)),
                jnp.asarray(ka.astype(np.int32)),
            )
        self._keys[key_id] = out
        if not hasattr(self, "_key_digits"):
            self._key_digits: Dict[str, int] = {}
        if dbits is not None:
            self._key_digits[key_id] = dbits
        # re-registration (key rotation) must invalidate the stacked
        # device-arg bundles keyed by this key_id
        if hasattr(self, "_combined_args_cache"):
            for k in [
                k for k in self._combined_args_cache if k[0] == key_id
            ]:
                del self._combined_args_cache[k]

    def has_keys(self, key_id: str) -> bool:
        return key_id in self._keys

    # ------------------------------------------------------------------
    def _auto_tables(self, steps: Tuple[int, ...]):
        """[n_steps, N] permutation / sign arrays for the schedule."""
        perms, signs = [], []
        for s in steps:
            perm, sgn = self.ctx._automorphism_map(s)
            perms.append(perm)
            signs.append(sgn)
        return (
            jnp.asarray(np.stack(perms).astype(np.int32)),
            jnp.asarray(np.stack(signs).astype(np.int32)),
        )

    def _enc_mat_dev(self) -> jax.Array:
        """Parked [N/2, N] f32 real-encode matrix × ctx.scale (a power of
        two — the f32 multiply is exact). Built once per service; passed
        as a program ARGUMENT, never a jit constant (134 MB at N=8192)."""
        em = getattr(self, "_enc_mat_cached", None)
        if em is None:
            em = jnp.asarray(
                self.ctx.encode_matrix_real()
                * np.float32(self.ctx.scale)
            )
            self._enc_mat_cached = em
        return em

    def _score_fn(self, level_in: int, n_steps: int,
                  combine_tree: int | None = None, n_post: int = 0,
                  seeded: bool = False, digit_bits: int | None = None,
                  dev_encode: bool = False, dev_gather: bool = False):
        # per-instance cache (a functools.lru_cache on the bound method
        # would key the GLOBAL cache on self and pin every DeviceCKKS
        # instance — device keys, tables, executables — for process life)
        if not hasattr(self, "_score_cache"):
            self._score_cache = {}
        key = (level_in, n_steps, combine_tree, n_post, seeded, digit_bits,
               dev_encode, dev_gather)
        if key in self._score_cache:
            return self._score_cache[key]
        fn = self._build_score_fn(
            level_in, n_steps, combine_tree, n_post, seeded, digit_bits,
            dev_encode, dev_gather,
        )
        self._score_cache[key] = fn
        return fn

    def _build_score_fn(self, level_in: int, n_steps: int,
                        combine_tree: int | None = None, n_post: int = 0,
                        seeded: bool = False,
                        digit_bits: int | None = None,
                        dev_encode: bool = False, dev_gather: bool = False):
        """jit: (fdigs…, gdigs…, ct [2, L, N], pt_rns [B, L, N],
        keys_b [n_steps, n_comp, n_ext_all, N], keys_a …,
        perms [n_steps, N], signs [n_steps, N]) → [B, 2, level, N].

        level_in = limbs of the incoming ct; the ct×pt rescale drops one, so
        rotations run at level = level_in − 1."""
        qs_in = self.ext[:level_in]
        level = level_in - 1
        primes = self.ext[:level]
        p = self.ext[-1]                          # special modulus
        p_idx = len(self.ext) - 1
        n = self.params.n
        tabs = self.mxu
        dbits = DIGIT_BITS if digit_bits is None else int(digit_bits)
        n_digits = -(-30 // dbits)
        mask = (1 << dbits) - 1
        inv_ql = [
            int(pow(qs_in[-1] % q, -1, q)) for q in primes
        ]
        inv_p = [int(pow(p % q, -1, q)) for q in primes]
        half_p = p // 2

        def keyswitch(c1r, keys_b, keys_a, lvl=None):
            """c1r [B, level, N] coeff residues → (ks0, ks1) [B, level, N].

            keys_*: [n_comp_full, n_ext_all, N] — sliced to the active
            level's components/primes statically."""
            lvl = level if lvl is None else lvl
            primes_l = self.ext[:lvl]
            inv_p_l = [int(pow(p % q, -1, q)) for q in primes_l]
            B, _, n = c1r.shape
            # dbits-wide digits of each active limb: [B, level·n_digits, N]
            digs = []
            for i in range(lvl):
                limb = c1r[:, i].astype(jnp.int32)
                for d in range(n_digits):
                    digs.append((limb >> (d * dbits)) & mask)
            digits = jnp.stack(digs, axis=1)        # [B, n_comp, N]
            n_comp = lvl * n_digits
            flat = digits.reshape(B * n_comp, n)
            acc0, acc1 = [], []
            for e_prime in list(primes_l) + [p]:
                e_all = self.ext.index(e_prime)
                tb = tabs[e_all]
                D = ntt4(flat, tb).reshape(B, n_comp, n)
                s0 = jnp.zeros((B, n), jnp.int64)
                s1 = jnp.zeros((B, n), jnp.int64)
                for c in range(n_comp):
                    kb = keys_b[c, e_all]
                    ka = keys_a[c, e_all]
                    s0 = s0 + modmul_lazy(D[:, c], kb[None], tb.q, tb.delta)
                    s1 = s1 + modmul_lazy(D[:, c], ka[None], tb.q, tb.delta)
                # Σ of n_comp lazy terms < n_comp·2^51 ≤ 2^55 — one reduce
                # (a full modmul per term cost 3 fold rounds; lazy is 1)
                s0 = shift_mod_reduce(s0, tb.q, tb.delta, 55)
                s1 = shift_mod_reduce(s1, tb.q, tb.delta, 55)
                # one INTT call for s0‖s1: the [4, N, N] matrix read from
                # HBM dominates at small batch — halve it
                i01 = intt4(jnp.concatenate([s0, s1], 0), tb)
                acc0.append(i01[:B])
                acc1.append(i01[B:])
            # exact division by p: subtract the centered mod-p part
            cp0 = acc0[-1]
            cp1 = acc1[-1]
            cp0s = jnp.where(cp0 > half_p, cp0 - p, cp0)
            cp1s = jnp.where(cp1 > half_p, cp1 - p, cp1)
            out0, out1 = [], []
            for i, q in enumerate(primes_l):
                tb = tabs[self.ext.index(q)]
                d0 = acc0[i] - cp0s
                d0 = jnp.where(d0 < 0, d0 + q, d0)
                d0 = jnp.where(d0 >= q, d0 - q, d0)
                d1 = acc1[i] - cp1s
                d1 = jnp.where(d1 < 0, d1 + q, d1)
                d1 = jnp.where(d1 >= q, d1 - q, d1)
                out0.append(modmul(d0, jnp.int64(inv_p_l[i]), q, tb.delta))
                out1.append(modmul(d1, jnp.int64(inv_p_l[i]), q, tb.delta))
            return jnp.stack(out0, 1), jnp.stack(out1, 1)

        def score_core(ct, pt_rns, keys_b, keys_a, perms, signs):
            # four-step NTT tables are jit constants (kilobytes) — the
            # dense form's 268 MB matrices needed argument plumbing
            # ct: [nq, 2, level_in, N] i32 — one per query;
            # pt_rns: [nq·blocks, level_in, N] i32, query-major
            nq = ct.shape[0]
            B, _, n = pt_rns.shape
            blocks = B // nq
            # --- ct×pt in NTT domain, per input prime ------------------
            prod0, prod1 = [], []
            for i, q in enumerate(qs_in):
                e_all = self.ext.index(q)
                tb = tabs[e_all]
                # ONE forward NTT call per prime: 2·nq ct rows + B pt rows
                rows = jnp.concatenate(
                    [ct[:, 0, i], ct[:, 1, i], pt_rns[:, i]], 0
                )
                nt = ntt4(rows, tb)
                ctn0 = jnp.repeat(nt[:nq], blocks, axis=0)        # [B, N]
                ctn1 = jnp.repeat(nt[nq : 2 * nq], blocks, axis=0)
                ptn = nt[2 * nq :]
                m0 = modmul(ctn0, ptn, q, tb.delta)               # [B, N]
                m1 = modmul(ctn1, ptn, q, tb.delta)
                i01 = intt4(jnp.concatenate([m0, m1], 0), tb)
                prod0.append(i01[:B])
                prod1.append(i01[B:])
            # --- exact RNS rescale: drop prime level_in−1 ---------------
            ql = qs_in[-1]
            c0, c1 = [], []
            for i, q in enumerate(primes):
                tb = tabs[self.ext.index(q)]
                last0 = prod0[-1]
                last1 = prod1[-1]
                l0 = jnp.where(last0 >= q, last0 - q, last0)  # mod q (ql<2q)
                l1 = jnp.where(last1 >= q, last1 - q, last1)
                d0 = _mod_sub(prod0[i], l0, q)
                d1 = _mod_sub(prod1[i], l1, q)
                c0.append(modmul(d0, jnp.int64(inv_ql[i]), q, tb.delta))
                c1.append(modmul(d1, jnp.int64(inv_ql[i]), q, tb.delta))
            acc0 = jnp.stack(c0, 1)                  # [B, level, N]
            acc1 = jnp.stack(c1, 1)
            # --- rotate-accumulate ------------------------------------
            for si in range(n_steps):
                perm = perms[si]
                sign = signs[si]
                r0s, r1s = [], []
                for i, q in enumerate(primes):
                    v0 = acc0[:, i, :][:, perm]
                    v1 = acc1[:, i, :][:, perm]
                    r0s.append(
                        jnp.where(
                            sign[None, :] > 0, v0,
                            jnp.where(v0 == 0, 0, q - v0),
                        )
                    )
                    r1s.append(
                        jnp.where(
                            sign[None, :] > 0, v1,
                            jnp.where(v1 == 0, 0, q - v1),
                        )
                    )
                c0r = jnp.stack(r0s, 1)
                c1r = jnp.stack(r1s, 1)
                ks0, ks1 = keyswitch(c1r, keys_b[si], keys_a[si])
                rot0 = jnp.stack(
                    [
                        _mod_add(c0r[:, i], ks0[:, i], q)
                        for i, q in enumerate(primes)
                    ],
                    1,
                )
                rot1 = ks1
                acc0 = jnp.stack(
                    [
                        _mod_add(acc0[:, i], rot0[:, i], q)
                        for i, q in enumerate(primes)
                    ],
                    1,
                )
                acc1 = jnp.stack(
                    [
                        _mod_add(acc1[:, i], rot1[:, i], q)
                        for i, q in enumerate(primes)
                    ],
                    1,
                )
            return acc0, acc1                    # [B, level, N] each

        def score(ct, pt_rns, keys_b, keys_a, perms, signs):
            acc0, acc1 = score_core(ct, pt_rns, keys_b, keys_a, perms, signs)
            return jnp.stack(
                [acc0.astype(jnp.int32), acc1.astype(jnp.int32)], axis=1
            )                                        # [B, 2, level, N]

        if combine_tree is None:      # plain per-block response
            return jax.jit(score)

        # ---- combined single-ct response (CKKSComputeService
        # .encrypted_scores_combined is the host oracle), WINDOWED layout:
        # only the IP strides ≥ W = d/n_blocks run pre-combine (n_steps
        # here); mask-mult keeps each block's W-slot partial window
        # (ct×pt + exact rescale → one fewer limb); the tree combines the
        # 2^combine_tree blocks with rotations by −W·2^k so block b's
        # window lands at [j·d + W·b); the n_post strides < W then finish
        # the inner products on ONE row per query — the dominant
        # pre-combine rotate-accumulate shrinks n_blocks×. ONE
        # level-(level−1) ct per query crosses the wire.
        lvl2 = level - 1
        assert lvl2 >= 1, "combined scoring needs a level-3 query ct"
        q_drop = primes[-1]
        inv_qd = [int(pow(q_drop % q, -1, q)) for q in primes[:lvl2]]

        def score_combined(
            ct, pt_coeffs, keys_b, keys_a, perms, signs,
            mask_ntt, tkeys_b, tkeys_a, tperms, tsigns,
            pkeys_b, pkeys_a, pperms, psigns,
        ):
            # pt_coeffs: [B, N] i32 SIGNED encode coefficients — the RNS
            # mod runs on device so the h2d upload is N ints per plaintext
            # instead of L_in·N residues (the relay upload was the dominant
            # per-request cost after the host encode was batched);
            # mask_ntt: [level, N] i32 four-step-NTT-domain mask residues;
            # tkeys_*: [n_tree, n_comp_full, n_ext_all, N]; tperms/tsigns:
            # [n_tree, N] automorphism tables for steps −1, −2, …
            pt_rns = jnp.stack(
                [jnp.mod(pt_coeffs, jnp.int32(q)) for q in qs_in], 1
            )                                    # [B, L_in, N] non-negative
            acc0, acc1 = score_core(ct, pt_rns, keys_b, keys_a, perms, signs)
            B = acc0.shape[0]
            nq = ct.shape[0]
            blocks = B // nq
            # --- slot mask: ct×pt per active prime -----------------------
            m0, m1 = [], []
            for i, q in enumerate(primes):
                tb = tabs[self.ext.index(q)]
                rows = jnp.concatenate([acc0[:, i], acc1[:, i]], 0)
                nt = ntt4(rows, tb)
                mm = modmul(nt, mask_ntt[i][None], q, tb.delta)
                cc = intt4(mm, tb)
                m0.append(cc[:B])
                m1.append(cc[B:])
            # --- exact rescale: drop primes[-1] → lvl2 limbs --------------
            c0l, c1l = [], []
            for i in range(lvl2):
                q = primes[i]
                tb = tabs[self.ext.index(q)]
                l0 = jnp.where(m0[-1] >= q, m0[-1] - q, m0[-1])
                l1 = jnp.where(m1[-1] >= q, m1[-1] - q, m1[-1])
                d0 = _mod_sub(m0[i], l0, q)
                d1 = _mod_sub(m1[i], l1, q)
                c0l.append(modmul(d0, jnp.int64(inv_qd[i]), q, tb.delta))
                c1l.append(modmul(d1, jnp.int64(inv_qd[i]), q, tb.delta))
            cur0 = jnp.stack(c0l, 1).reshape(nq, blocks, lvl2, n)
            cur1 = jnp.stack(c1l, 1).reshape(nq, blocks, lvl2, n)
            # --- tree combine: round k merges pairs via rot by −2^k ------
            for k in range(combine_tree):
                nb_k = cur0.shape[1]
                ev0 = cur0[:, 0::2].reshape(-1, lvl2, n)
                ev1 = cur1[:, 0::2].reshape(-1, lvl2, n)
                od0 = cur0[:, 1::2].reshape(-1, lvl2, n)
                od1 = cur1[:, 1::2].reshape(-1, lvl2, n)
                perm = tperms[k]
                sign = tsigns[k]
                r0l, r1l = [], []
                for i in range(lvl2):
                    q = primes[i]
                    v0 = od0[:, i, :][:, perm]
                    v1 = od1[:, i, :][:, perm]
                    r0l.append(jnp.where(
                        sign[None, :] > 0, v0,
                        jnp.where(v0 == 0, 0, q - v0),
                    ))
                    r1l.append(jnp.where(
                        sign[None, :] > 0, v1,
                        jnp.where(v1 == 0, 0, q - v1),
                    ))
                c0r = jnp.stack(r0l, 1)
                c1r = jnp.stack(r1l, 1)
                ks0, ks1 = keyswitch(c1r, tkeys_b[k], tkeys_a[k], lvl2)
                n0l, n1l = [], []
                for i in range(lvl2):
                    q = primes[i]
                    rot0 = _mod_add(c0r[:, i], ks0[:, i], q)
                    n0l.append(_mod_add(ev0[:, i], rot0, q))
                    n1l.append(_mod_add(ev1[:, i], ks1[:, i], q))
                cur0 = jnp.stack(n0l, 1).reshape(nq, nb_k // 2, lvl2, n)
                cur1 = jnp.stack(n1l, 1).reshape(nq, nb_k // 2, lvl2, n)
            # --- post-combine IP rotations: strides < W at lvl2, one row
            # per query (n_blocks× fewer rows than the pre-combine side)
            a0 = cur0[:, 0]
            a1 = cur1[:, 0]
            for si in range(n_post):
                perm = pperms[si]
                sign = psigns[si]
                r0l, r1l = [], []
                for i in range(lvl2):
                    q = primes[i]
                    v0 = a0[:, i, :][:, perm]
                    v1 = a1[:, i, :][:, perm]
                    r0l.append(jnp.where(
                        sign[None, :] > 0, v0,
                        jnp.where(v0 == 0, 0, q - v0),
                    ))
                    r1l.append(jnp.where(
                        sign[None, :] > 0, v1,
                        jnp.where(v1 == 0, 0, q - v1),
                    ))
                c0r = jnp.stack(r0l, 1)
                c1r = jnp.stack(r1l, 1)
                ks0, ks1 = keyswitch(c1r, pkeys_b[si], pkeys_a[si], lvl2)
                n0l, n1l = [], []
                for i in range(lvl2):
                    q = primes[i]
                    rot0 = _mod_add(c0r[:, i], ks0[:, i], q)
                    n0l.append(_mod_add(a0[:, i], rot0, q))
                    n1l.append(_mod_add(a1[:, i], ks1[:, i], q))
                a0 = jnp.stack(n0l, 1)
                a1 = jnp.stack(n1l, 1)
            return jnp.stack(
                [a0.astype(jnp.int32), a1.astype(jnp.int32)],
                axis=1,
            )                                        # [nq, 2, lvl2, N]

        def _dev_encode(slot_rows, enc_mat):
            # candidate encode ON the MXU: slot_rows [B, N/2] f32 (already
            # divided by cand_scale on the host), enc_mat [N/2, N] f32
            # pre-scaled by ctx.scale (crypto/ckks.encode_matrix_real) —
            # one matmul replaces the host FFT encode that cost 424 ms per
            # 256 rows on this 1-core host, and the upload shrinks from
            # [B, N] int32 coeffs to [B, N/2] f32 slots
            ptc = jax.lax.dot_general(
                slot_rows, enc_mat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jnp.round(ptc).astype(jnp.int32)

        def _dev_gather(cand_ids, base_pad):
            # parked-base mode (set_base): cand_ids [nq, Ppad] i32 with
            # pad id = nbase (the appended zero row). Row gather moves
            # whole d-lane rows — the tile-friendly gather shape; norms
            # come from the same gathered rows (integer-valued f32, so
            # round→int32 squares are exact: d·255² ≈ 8.3M « 2³¹)
            from prefhetch_tpu.engine.hecompute import (
                CKKSComputeService as _H,
            )

            cand_scale = np.float32(1.0 / (1 << _H.CAND_SCALE_BITS))
            rows = jnp.take(base_pad, cand_ids, axis=0)   # [nq, Ppad, d]
            nq_, p_pad, d_ = rows.shape
            per_ct_ = (n // 2) // d_
            slot_rows = (rows * cand_scale).reshape(
                nq_ * (p_pad // per_ct_), per_ct_ * d_
            )
            norms = jnp.sum(
                jnp.round(rows).astype(jnp.int32) ** 2, axis=-1
            )                                             # [nq, Ppad] i32
            return slot_rows, norms

        if not seeded:
            if dev_gather:
                def score_combined_gather(
                    ct, cand_ids, base_pad, enc_mat, *rest
                ):
                    slot_rows, norms = _dev_gather(cand_ids, base_pad)
                    return score_combined(
                        ct, _dev_encode(slot_rows, enc_mat), *rest
                    ), norms

                return jax.jit(score_combined_gather)
            if not dev_encode:
                return jax.jit(score_combined)

            def score_combined_enc(ct, slot_rows, enc_mat, *rest):
                return score_combined(
                    ct, _dev_encode(slot_rows, enc_mat), *rest
                )

            return jax.jit(score_combined_enc)

        def score_combined_seeded(c0q, seeds, pt_coeffs, *rest):
            # seedTf wire: regenerate the c1 mask from the 8-byte
            # threefry key inside the program (crypto/bfv.tf_uniform_rns)
            # — the c1 half of the query upload disappears
            from prefhetch_tpu.crypto.bfv import tf_uniform_rns

            a = jax.vmap(
                lambda kd: tf_uniform_rns(kd, qs_in, n)
            )(seeds)                                 # [nq, L_in, N] i64
            ct = jnp.stack([c0q.astype(jnp.int64), a], axis=1)
            return score_combined(ct, pt_coeffs, *rest)

        if dev_gather:
            def score_combined_seeded_gather(
                c0q, seeds, cand_ids, base_pad, enc_mat, *rest
            ):
                slot_rows, norms = _dev_gather(cand_ids, base_pad)
                return score_combined_seeded(
                    c0q, seeds, _dev_encode(slot_rows, enc_mat), *rest
                ), norms

            return jax.jit(score_combined_seeded_gather)
        if not dev_encode:
            return jax.jit(score_combined_seeded)

        def score_combined_seeded_enc(c0q, seeds, slot_rows, enc_mat, *rest):
            return score_combined_seeded(
                c0q, seeds, _dev_encode(slot_rows, enc_mat), *rest
            )

        return jax.jit(score_combined_seeded_enc)

    # ------------------------------------------------------------------
    def encrypted_scores(
        self, ct: CKKSCiphertext, candidates: np.ndarray, key_id: str
    ):
        """Enc(⟨q, x_j⟩) for every candidate row; returns
        ([n_blocks] result CKKSCiphertexts, norms [P]) — wire-compatible
        with CKKSComputeService.encrypted_scores."""
        res, norms = self.encrypted_scores_batch(
            [ct], candidates[None], key_id
        )
        return res[0], norms[0]

    def encrypted_scores_batch(
        self,
        cts: List[CKKSCiphertext],
        candidates: np.ndarray,
        key_id: str,
    ):
        return self.encrypted_scores_batch_async(cts, candidates, key_id)()

    def encrypted_scores_batch_async(
        self,
        cts: List[CKKSCiphertext],       # [nq] encrypted queries
        candidates: np.ndarray,          # [nq, P, d]
        key_id: str,
    ):
        """Multi-query scoring in ONE device program: all (query, block)
        plaintexts share each per-prime NTT call, amortizing the digit-
        matrix HBM reads that dominate at small batch. ASYNC form: returns
        a zero-arg resolver; the device work and the d2h are not awaited
        until it is called (see engine/server.py coarse_search_tiled_async
        for the relay-latency rationale).

        Returns ([nq][n_blocks] result cts, norms [nq, P])."""
        gks = self._keys[key_id]
        ctx = self.ctx
        nq, P, d = candidates.shape
        slots = self.params.n // 2
        per_ct = slots // d
        n_blocks = -(-P // per_ct)
        padded = np.zeros((nq, n_blocks * per_ct, d), np.float64)
        padded[:, :P] = candidates

        steps = []
        r = d // 2
        while r >= 1:
            steps.append(r)
            r //= 2
        for s in steps:
            if s not in gks:
                raise ValueError(f"missing Galois key for step {s}")

        level_in = cts[0].level
        assert all(c.level == level_in for c in cts)
        # plaintext blocks → scaled coeffs → RNS residues, query-major:
        # ONE batched FFT encode + ONE vectorized mod (the per-row loop was
        # ~3 ms/row of host time — the dominant e2e cost at nq=16)
        qs_in = np.array(self.ext[:level_in], np.int64)
        coeffs = ctx.encode(
            padded.reshape(nq * n_blocks, per_ct * d)
        )                                            # [nq·blocks, N]
        pt_rns = np.mod(coeffs[:, None, :], qs_in[None, :, None])

        perms, signs = self._auto_tables(tuple(steps))
        keys_b = jnp.stack([gks[s][0] for s in steps])
        keys_a = jnp.stack([gks[s][1] for s in steps])
        ct_dev = jnp.asarray(
            np.stack(
                [np.stack([c.c0, c.c1]) for c in cts]
            ).astype(np.int32)
        )                                            # [nq, 2, L_in, N]
        fn = self._score_fn(
            level_in, len(steps),
            digit_bits=getattr(self, "_key_digits", {}).get(key_id),
        )
        dev_out = fn(ct_dev, jnp.asarray(pt_rns.astype(np.int32)),
                     keys_b, keys_a, perms, signs)   # UNFETCHED device array

        out_scale = cts[0].scale * ctx.scale / self.ext[level_in - 1]
        norms = (np.round(candidates).astype(np.int64) ** 2).sum(-1)

        def resolve():
            # one d2h roundtrip (the ~300 ms dominant cost at nq=4 —
            # callers overlap it with the next batch's dispatch)
            out = np.asarray(dev_out).astype(np.int64)  # [nq·blk, 2, lvl, N]
            result = [
                [
                    CKKSCiphertext(
                        c0=out[qi * n_blocks + b, 0],
                        c1=out[qi * n_blocks + b, 1],
                        level=level_in - 1, scale=out_scale,
                    )
                    for b in range(n_blocks)
                ]
                for qi in range(nq)
            ]
            return result, norms

        resolve.dev_out = dev_out    # unfetched handle (device-rate bench)
        return resolve

    def encrypted_scores_combined_batch(
        self,
        cts: List[CKKSCiphertext],
        candidates: np.ndarray,
        key_id: str,
    ):
        return self.encrypted_scores_combined_batch_async(cts, candidates, key_id)()

    def encrypted_scores_combined_batch_async(
        self,
        cts: List[CKKSCiphertext],       # [nq] level-3 encrypted queries
        candidates: np.ndarray,          # [nq, P, d]
        key_id: str,
    ):
        """Combined single-ct response: device twin of
        CKKSComputeService.encrypted_scores_combined (see its docstring for
        the WINDOWED construction and scale bookkeeping). ONE
        level-(L_in−2) result ct per query — 2·(L_in−2)/(blocks·2·(L_in−1))
        of the per-block wire (~16× smaller at the config-3 operating
        point). Requires Galois keys for the IP-tree steps AND the combine
        steps −W·2^k (crypto/ckks.combine_tree_steps).

        Returns a resolver → ([nq] CKKSCiphertext, norms [nq, P])."""
        from prefhetch_tpu.crypto.ckks import combine_window
        from prefhetch_tpu.engine.hecompute import CKKSComputeService as _H

        gks = self._keys[key_id]
        ctx = self.ctx
        # seedTf wire dicts: only c0 travels; c1 regenerates on device
        seed_mode = all(
            isinstance(c, dict) and "seedTf" in c for c in cts
        )
        if not seed_mode:
            cts = [
                ctx.ct_from_wire(c) if isinstance(c, dict) else c
                for c in cts
            ]
        candidates = np.asarray(candidates)
        # [nq, P] integer candidates = parked-base mode (set_base): the
        # request uploads 4-byte ids; rows are gathered INSIDE the score
        # program and norms computed from them on device. The [nq, P, d]
        # row upload was the dominant per-call relay cost (8.4 MB vs
        # 64 KB of ids at the config-3 operating point).
        gather = (
            candidates.ndim == 2
            and np.issubdtype(candidates.dtype, np.integer)
        )
        if gather:
            if self._base_dev is None:
                raise ValueError("index candidates need set_base() first")
            nq, P = candidates.shape
            d = int(self._base_dev.shape[1])
        else:
            nq, P, d = candidates.shape
        slots = self.params.n // 2
        per_ct = slots // d
        n_blocks = -(-P // per_ct)
        if n_blocks > 1:
            n_blocks = 1 << (n_blocks - 1).bit_length()     # pow2 tree
        if n_blocks > d:
            raise ValueError("combine needs n_blocks <= d distinct offsets")
        n_tree = (n_blocks - 1).bit_length() if n_blocks > 1 else 0
        if not gather:
            padded = np.zeros((nq, n_blocks * per_ct, d), np.float64)
            padded[:, :P] = candidates
        cand_scale = float(1 << _H.CAND_SCALE_BITS)
        mask_scale = float(1 << _H.MASK_SCALE_BITS)

        window = combine_window(d, n_blocks)
        steps = []
        r = d // 2
        while r >= 1:
            steps.append(r)
            r //= 2
        pre_steps = [s for s in steps if s >= window]
        post_steps = [s for s in steps if s < window]
        tree_steps = [-(window << k) for k in range(n_tree)]
        for s in steps + tree_steps:
            if s not in gks:
                raise ValueError(f"missing Galois key for step {s}")

        if seed_mode:
            level_in = int(cts[0]["level"])
            scale_in = float(cts[0]["scale"])
            assert all(int(c["level"]) == level_in for c in cts)
        else:
            level_in = cts[0].level
            scale_in = cts[0].scale
            assert all(c.level == level_in for c in cts)
        if level_in < 3:
            raise ValueError("combined scoring needs a level-3 query ct")
        level = level_in - 1
        import os as _os

        env_de = _os.environ.get("PFH_CKKS_DEV_ENCODE")
        dev_enc = (
            jax.default_backend() == "tpu" if env_de is None
            else env_de == "1"
        )
        if gather:
            dev_enc = True
            p_pad = n_blocks * per_ct
            ids_pad = np.full(
                (nq, p_pad), self._base_dev.shape[0] - 1, np.int32
            )                       # pad id → the appended zero row
            ids_pad[:, :P] = candidates
            pt_args = (
                jnp.asarray(ids_pad), self._base_dev, self._enc_mat_dev()
            )
        elif dev_enc:
            # |coeff| ≤ scale·max|slot| (encode_matrix_real docstring) —
            # the int32 bound checked on the raw values, pre-matmul.
            # Bound is 16·cand_scale (coeff ≤ 16·2^26 = 2^30), NOT 32:
            # the device encode rounds through an f32 matmul whose
            # accumulation error must never be able to carry a coeff
            # across the int32 boundary before the astype(int32) cast —
            # a full power-of-two of headroom absorbs it (ADVICE r04).
            assert np.abs(padded).max() < 16.0 * cand_scale, \
                "combined pt coeffs overflow"
            pt_args = (
                jnp.asarray(
                    (padded.reshape(nq * n_blocks, per_ct * d)
                     * (1.0 / cand_scale)).astype(np.float32)
                ),
                self._enc_mat_dev(),
            )
        else:
            coeffs = ctx.encode(
                padded.reshape(nq * n_blocks, per_ct * d) / cand_scale
            )                                        # [nq·blocks, N]
            # device-side RNS mod: coeffs of the 2^-16-scaled candidates
            # are ≲ 2^28 (bounded well under int32) — asserted, not assumed
            assert np.abs(coeffs).max() < (1 << 31), \
                "combined pt coeffs overflow"
            pt_args = (jnp.asarray(coeffs.astype(np.int32)),)

        # per-(key_id, shape) device-arg bundle: mask NTT residues, stacked
        # key/automorphism tables for the pre/tree/post schedules. Cached —
        # restacking ~7 MB of key material per request measurably dented
        # the e2e rate through this sandbox's relay
        if not hasattr(self, "_combined_args_cache"):
            self._combined_args_cache = {}
        akey = (key_id, d, n_blocks, level_in)
        if akey not in self._combined_args_cache:
            mask_slots = np.zeros(slots, np.float64)
            for w in range(window):
                mask_slots[w::d] = 1.0
            mask_coeffs = ctx.encode(mask_slots, scale=mask_scale)
            m_ntt = np.empty((level, self.params.n), np.int64)
            for i in range(level):
                tb = ctx.tables[i]
                m_ntt[i] = host_ntt(
                    mask_coeffs % self.ext[i], tb
                )[self._four_perm]
            mask_ntt = jnp.asarray(m_ntt.astype(np.int32))

            any_key = gks[steps[0]]
            if pre_steps:
                perms, signs = self._auto_tables(tuple(pre_steps))
                keys_b = jnp.stack([gks[s][0] for s in pre_steps])
                keys_a = jnp.stack([gks[s][1] for s in pre_steps])
            else:                  # window == d: all strides post-combine
                perms, signs = self._auto_tables((0,))
                keys_b = any_key[0][None]
                keys_a = any_key[1][None]
            if post_steps:
                pperms, psigns = self._auto_tables(tuple(post_steps))
                pkeys_b = jnp.stack([gks[s][0] for s in post_steps])
                pkeys_a = jnp.stack([gks[s][1] for s in post_steps])
            else:
                pperms, psigns = self._auto_tables((0,))
                pkeys_b = any_key[0][None]
                pkeys_a = any_key[1][None]
            if n_tree:
                tperms, tsigns = self._auto_tables(tuple(tree_steps))
                tkeys_b = jnp.stack([gks[s][0] for s in tree_steps])
                tkeys_a = jnp.stack([gks[s][1] for s in tree_steps])
            else:
                # tree-less degenerate case: empty tables keep the signature
                tperms, tsigns = self._auto_tables((0,))
                tkeys_b = keys_b[:1]
                tkeys_a = keys_a[:1]
            self._combined_args_cache[akey] = (
                mask_ntt, keys_b, keys_a, perms, signs,
                tkeys_b, tkeys_a, tperms, tsigns,
                pkeys_b, pkeys_a, pperms, psigns,
            )
        (mask_ntt, keys_b, keys_a, perms, signs,
         tkeys_b, tkeys_a, tperms, tsigns,
         pkeys_b, pkeys_a, pperms, psigns) = self._combined_args_cache[akey]
        fn = self._score_fn(
            level_in, len(pre_steps), combine_tree=n_tree,
            n_post=len(post_steps), seeded=seed_mode,
            digit_bits=getattr(self, "_key_digits", {}).get(key_id),
            dev_encode=dev_enc, dev_gather=gather,
        )
        if seed_mode:
            import base64

            c0s = np.stack([
                np.frombuffer(
                    base64.b64decode(c["c0"]), dtype="<u4"
                ).astype(np.int32).reshape(level_in, self.params.n)
                for c in cts
            ])
            lead = (
                jnp.asarray(c0s),
                jnp.asarray(np.stack(
                    [np.asarray(c["seedTf"], np.uint32) for c in cts]
                )),
            )
        else:
            lead = (jnp.asarray(
                np.stack(
                    [np.stack([c.c0, c.c1]) for c in cts]
                ).astype(np.int32)
            ),)
        dev_out = fn(
            *lead, *pt_args,
            keys_b, keys_a, perms, signs,
            mask_ntt, tkeys_b, tkeys_a, tperms, tsigns,
            pkeys_b, pkeys_a, pperms, psigns,
        )                                            # [nq, 2, level-1, N]

        scale1 = scale_in * ctx.scale / self.ext[level_in - 1]
        scale2 = scale1 * mask_scale / self.ext[level - 1]
        out_scale = scale2 / cand_scale
        if gather:
            dev_out, norms_dev = dev_out    # norms ride the same program
        else:
            norms_dev = None
            norms = (np.round(candidates).astype(np.int64) ** 2).sum(-1)

        def resolve():
            if norms_dev is not None:       # one batched d2h for both
                out, nrm = jax.device_get((dev_out, norms_dev))
                out = out.astype(np.int64)
                local_norms = nrm[:, :P].astype(np.int64)
            else:
                out = np.asarray(dev_out).astype(np.int64)
                local_norms = norms         # [nq, 2, lvl2, N]
            result = [
                CKKSCiphertext(
                    c0=out[qi, 0], c1=out[qi, 1],
                    level=level - 1, scale=out_scale,
                )
                for qi in range(nq)
            ]
            return result, local_norms

        resolve.dev_out = dev_out
        # pure device-program re-dispatch on the SAME parked arrays: the
        # bench's device-rate probe (serving ceiling with a local, non-relay
        # host↔device link — no host encode, no h2d in the timed loop).
        # Gather mode returns (scores, norms); repeat yields the scores
        # array either way so the probe's tiny sync slice is shape-stable.
        if gather:
            resolve.program_repeat = lambda: fn(
                *lead, *pt_args, keys_b, keys_a, perms, signs,
                mask_ntt, tkeys_b, tkeys_a, tperms, tsigns,
                pkeys_b, pkeys_a, pperms, psigns,
            )[0]
        else:
            resolve.program_repeat = lambda: fn(
                *lead, *pt_args, keys_b, keys_a, perms, signs,
                mask_ntt, tkeys_b, tkeys_a, tperms, tsigns,
                pkeys_b, pkeys_a, pperms, psigns,
            )
        return resolve
