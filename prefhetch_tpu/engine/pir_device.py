"""Device-resident 2-D PIR answering: the full SealPIR-style pipeline —
oblivious query expansion (Galois key switches), dim-1 hypercube fold,
modulus switch + base-t decomposition, dim-2 fold — as ONE jitted program.

The host path (crypto/pir.py PIR2Server.answer_2d) is the correctness
oracle; this module reproduces it on the accelerator so a 1M-row fetch
answers in well under a second: per fetch the host uploads one query
ciphertext (~64 KB) and downloads 2·L·n_digits single-limb response
ciphertexts (~256 KB) — everything else stays in HBM.

All modular arithmetic is division-free (ops/ntt_mxu.shift_mod_reduce);
NTTs are the four-step MXU transforms (ops/ntt_mxu.ntt4 — the fused
Pallas Shoup kernel on TPU). The whole NTT domain of this module lives in
FOUR-STEP order: the packed DB and the key-switch stacks are permuted
natural→four-step once at load (pointwise products only need both sides
in the same order), and intt4 emits natural coefficient order, so the
wire format is unchanged. The dense N² digit-matmul form this replaces
paid a 64 MB HBM matrix read per transform call plus emulated-int64
recombination — the r04 profile put that floor at 4.8 ms per [512, 8192]
transform vs 1.6 ms for the Pallas four-step (VERDICT r04 next #3).

Upgrades reference: src/server/server_lib.cpp:169-196 ("PIR" that gathered
raw rows for cleartext indices) into real single-server PIR at the
reference's own dataset scale.
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from prefhetch_tpu.crypto.bfv import BFVContext, Ciphertext, RelinKey
from prefhetch_tpu.crypto.params import BFVParams
from prefhetch_tpu.crypto.pir import (
    expansion_galois_elements,
    grid_dims,
    pack_database,
)
from prefhetch_tpu.ops.ntt_mxu import (
    build_ntt4_tables,
    intt4,
    modmul,
    ntt4,
    shift_mod_reduce,
)

DIGIT_BITS = 15
N_KS_DIGITS = 2          # 30-bit limbs → two 15-bit key-switch digits

# Bump when _build_answer's program changes: the AOT executable cache
# (piraot_* blobs) is keyed on this + arg shapes + backend version, NOT
# on code content.
AOT_VERSION = 1


class DevicePIR2:
    """Device twin of crypto/pir.PIR2Server (same wire contract)."""

    def __init__(self, base: np.ndarray, params: BFVParams,
                 cache_dir: str | None = None):
        assert len(params.qs) == 2, "device PIR expects 2 RNS limbs"
        self.params = params
        self.ctx = BFVContext(params)
        self.d = base.shape[1]
        self.nbase = base.shape[0]
        _, self.g1, self.g2 = grid_dims(params, self.nbase, self.d)
        self.m = self.g1 + self.g2
        self.logm = max(1, (self.m - 1).bit_length())
        self.m_pad = 1 << self.logm
        self._n_digits = 1
        while (params.t ** self._n_digits) < params.qs[0]:
            self._n_digits += 1

        # natural → four-step NTT-order permutation (same recipe as
        # engine/hecompute): every NTT-domain tensor in this module is kept
        # in ntt4's four-step order, so pointwise ct×pt products line up
        _t4 = build_ntt4_tables(params.qs[0], params.n)
        _j1, _j2 = np.meshgrid(
            np.arange(_t4.n1), np.arange(_t4.n2), indexing="ij"
        )
        self._fs_perm = (_j2 * _t4.n1 + _j1).reshape(-1)

        db32 = self._load_db_cache(base, cache_dir)
        if db32 is None:
            polys = pack_database(base, params)              # [G, N]
            padded = np.zeros((self.g1 * self.g2, params.n), np.int64)
            padded[: polys.shape[0]] = polys
            # batched forward NTT of the whole packed DB per limb (the
            # per-poly python loop took ~3 min at nbase=1M); native C++
            # Shoup NTT when built, vectorized numpy butterflies otherwise
            db = np.empty(
                (self.g1 * self.g2, len(params.qs), params.n), np.int64
            )
            from prefhetch_tpu import native as _native
            from prefhetch_tpu.crypto.ntt import ntt as _host_ntt

            for i, tb in enumerate(self.ctx.tables):
                rows = padded % tb.q
                if _native.available():
                    db[:, i] = _native.NativeNTT(tb.q, params.n)(rows)
                else:
                    db[:, i] = _host_ntt(rows, tb)
            db32 = db.reshape(
                self.g1, self.g2, len(params.qs), params.n
            ).astype(np.int32)
            self._save_db_cache(base, cache_dir, db32)
        # disk cache stays natural-order (stable key across kernel
        # generations); the device copy is four-step order
        self.db = jnp.asarray(db32[..., self._fs_perm])

        # per-level monomial/automorphism tables — built to FULL depth
        # log2(N): the multi-row packed query (answer_2d_multi) expands to
        # n_rows·m selectors, deeper than the single-row logm tree
        n = params.n
        self.logm_max = n.bit_length() - 1
        k = np.arange(n)
        mono_perm = np.empty((self.logm_max, n), np.int32)
        mono_sign = np.empty((self.logm_max, n), np.int8)
        gal_perm = np.empty((self.logm_max, n), np.int32)
        gal_sign = np.empty((self.logm_max, n), np.int8)
        self._gal_elts = []
        for j in range(self.logm_max):
            e = (-(1 << j)) % (2 * n)
            dest = (k + e) % (2 * n)
            pos = dest % n
            # out[pos[k]] = sign[k]·in[k]  →  out[i] = sg[i]·in[pm[i]]
            pm = np.empty(n, np.int64)
            sg = np.empty(n, np.int64)
            pm[pos] = k
            sg[pos] = np.where(dest < n, 1, -1)
            mono_perm[j] = pm
            mono_sign[j] = sg
            g = (n >> j) + 1
            self._gal_elts.append(g)
            kg = (k * g) % (2 * n)
            dpos = kg % n
            pm2 = np.empty(n, np.int64)
            sg2 = np.empty(n, np.int64)
            pm2[dpos] = k
            sg2[dpos] = np.where(kg < n, 1, -1)
            gal_perm[j] = pm2
            gal_sign[j] = sg2
        self.mono_perm = jnp.asarray(mono_perm)
        self.mono_sign = jnp.asarray(mono_sign)
        self.gal_perm = jnp.asarray(gal_perm)
        self.gal_sign = jnp.asarray(gal_sign)
        self._keys: Dict[str, tuple] = {}
        self._ks_meta = None     # (ext primes, inv_p per limb) — key-indep
        # kept for the key-switch-table cache (register_galois_keys): the
        # per-level host NTT of a deep expansion-key stack costs tens of
        # seconds on this one-core host and is a pure function of the wire
        self._cache_dir = cache_dir

    # -- packed-DB disk cache -------------------------------------------
    # NTT-ing 1M rows costs ~8 min on this one-core host; the result is a
    # pure function of (base, params), so cache it keyed by a sampled
    # fingerprint (full-byte hashing a 512 MB base would itself take
    # noticeable time).
    def _db_cache_key(self, base: np.ndarray) -> str:
        import hashlib

        h = hashlib.sha256()
        h.update(repr((base.shape, str(base.dtype), self.params.n,
                       self.params.t, self.params.qs)).encode())
        stride = max(1, base.shape[0] // 1024)
        h.update(np.ascontiguousarray(base[::stride]).tobytes())
        return h.hexdigest()[:24]

    def _db_cache_path(self, base, cache_dir):
        if not cache_dir:
            return None
        return os.path.join(
            cache_dir, f"pirdb_{self._db_cache_key(base)}.npy"
        )

    def _load_db_cache(self, base, cache_dir):
        path = self._db_cache_path(base, cache_dir)
        if path and os.path.exists(path):
            db = np.load(path)
            if db.shape == (self.g1, self.g2, len(self.params.qs),
                            self.params.n):
                return db
        return None

    def _save_db_cache(self, base, cache_dir, db32) -> None:
        path = self._db_cache_path(base, cache_dir)
        if not path:
            return
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.save(f, db32)
        os.replace(tmp, path)

    @property
    def n_selectors(self) -> int:
        return self.m

    def has_keys(self, key_id: str) -> bool:
        return key_id in self._keys

    def register_galois_keys(self, key_id: str, gks_wire: dict) -> None:
        """Pre-NTT the key components per ext prime; stack per level.

        Accepts any contiguous prefix of the full log2(N)-level element
        chain (n>>j)+1: single-row clients send logm levels, multi-row
        packed clients send the deeper tree their n_rows·m expansion
        needs. The stacked depth gates which answer forms are available."""
        gks = {int(g): RelinKey.from_wire(w) for g, w in gks_wire.items()}
        wire_by_elt = {int(g): w for g, w in gks_wire.items()}
        depth = 0
        while depth < self.logm_max and self._gal_elts[depth] in gks:
            depth += 1
        if depth < self.logm:
            raise ValueError(
                f"expansion keys cover {depth} levels; even the single-row "
                f"tree needs {self.logm}"
            )
        # No-downgrade merge (ADVICE r03): a shallow re-registration under
        # a key_id already holding a DEEPER stack of the SAME keys must not
        # truncate it — multi-row answers would break until the client's
        # 400-retry re-registered. Keep the deeper stack when the incoming
        # levels are identical to its prefix; genuinely different keys
        # (a new client reusing the id) still overwrite below.
        import hashlib
        import json as _json

        fps = [
            hashlib.sha1(
                _json.dumps(
                    wire_by_elt[g], sort_keys=True, default=str
                ).encode()
            ).hexdigest()
            for g in self._gal_elts[:depth]
        ]
        prev = getattr(self, "_key_fps", {}).get(key_id)
        if prev is not None and len(prev) >= depth \
                and list(prev[:depth]) == fps:
            return
        first = gks[self._gal_elts[0]]
        ext = first.ext
        sp = first.special_p
        # disk cache of the NTT'd key stack: pure function of the wire
        # (fingerprinted above) + params — re-registration of the same
        # client keys across processes must not redo depth×n_comp×|ext|
        # host NTTs (VERDICT r04 #1: keygen/registration burned the pir cap)
        ks_path = None
        if self._cache_dir:
            stack_fp = hashlib.sha1(
                repr((fps, self.params.qs, self.params.n, ext, sp)).encode()
            ).hexdigest()[:24]
            ks_path = os.path.join(self._cache_dir, f"pirks_{stack_fp}.npz")
        kb32 = ka32 = None
        if ks_path and os.path.exists(ks_path):
            with np.load(ks_path) as z:
                kb32, ka32 = z["kb"], z["ka"]
        if kb32 is None:
            kb = np.empty(
                (depth, first.b.shape[0], len(ext), self.params.n), np.int64
            )
            ka = np.empty_like(kb)
            for j, g in enumerate(self._gal_elts[:depth]):
                rk = gks[g]
                assert rk.ext == ext and rk.special_p == sp
                for e, q in enumerate(ext):
                    from prefhetch_tpu.crypto.ntt import build_tables, ntt

                    tb = build_tables(q, self.params.n)
                    kb[j, :, e] = ntt(rk.b[:, e] % q, tb)
                    ka[j, :, e] = ntt(rk.a[:, e] % q, tb)
            kb32 = kb.astype(np.int32)
            ka32 = ka.astype(np.int32)
            if ks_path:
                tmp = ks_path + ".tmp"
                with open(tmp, "wb") as f:
                    np.savez(f, kb=kb32, ka=ka32)
                os.replace(tmp, ks_path)
        inv_p = np.array(
            [pow(sp, -1, qi) for qi in self.params.qs], np.int64
        )
        # key stacks ride the NTT domain: permute into four-step order
        # (the pirks_ disk cache stays natural-order)
        self._keys[key_id] = (
            jnp.asarray(kb32[..., self._fs_perm]),
            jnp.asarray(ka32[..., self._fs_perm]),
        )
        if not hasattr(self, "_key_fps"):
            self._key_fps = {}
        self._key_fps[key_id] = tuple(fps)
        self._ks_meta = (tuple(ext), sp, inv_p)

    # ------------------------------------------------------------------
    def _build_answer(self, n_rows: int = 1, axis_name: str | None = None,
                      n_shards: int = 1):
        """The answer pipeline as a pure function (jitted for one-off
        fetches; vmapped over the ciphertext axis for batched fetches —
        in_axes=None on the database so the g1-scan's HBM read of the
        packed DB happens ONCE per step, shared across the whole batch;
        that read dominates a 1M-row fetch).

        n_rows > 1 is the multi-row packed form: ONE uploaded ct expands to
        n_rows·m selectors (crypto/pir.build_query_2d_multi) and each row's
        m-block folds against the same expansion — n_rows× less upload and
        one expansion shared by n_rows fetches.

        axis_name/n_shards: mesh-sharded form (answer_2d_sharded) — the db
        argument is each device's [g1/n_shards, g2, L, N] chunk, the dim-1
        fold scans it locally and a psum + canonical reduce reassembles
        the accumulators bit-equal to the single-device scan; expansion
        and the dim-2 fold run replicated."""
        p = self.params
        n = p.n
        q1, q2 = p.qs
        t = p.t
        nd = self._n_digits
        g1, g2 = self.g1, self.g2
        if n_rows == 1:
            logm, m_pad = self.logm, self.m_pad
        else:
            assert 1 <= n_rows * self.m <= n
            logm = max(1, (n_rows * self.m - 1).bit_length())
            m_pad = 1 << logm
        ext, sp, inv_p_np = self._ks_meta
        L = len(p.qs)
        n_comp = L * N_KS_DIGITS
        tabs = [build_ntt4_tables(q, n) for q in ext]
        tabs_q = [build_ntt4_tables(q, n) for q in p.qs]
        inv_q2_mod_q1 = pow(q2, -1, q1)

        def lift_sign(x, sign, q):
            """x·sign mod q for residues x ∈ [0, q), sign ∈ {−1, 1}."""
            return jnp.where(sign[None, None, :] > 0, x,
                             jnp.where(x == 0, 0, q - x))

        def apply_perm(x, perm, sign):
            """[M, L, N] per-limb signed permutation (out[i]=sg[i]·in[pm[i]])."""
            y = x[:, :, perm]
            out = []
            for i, q in enumerate(p.qs):
                out.append(lift_sign(y[:, i : i + 1], sign, q))
            return jnp.concatenate(out, axis=1)

        def key_switch_batch(c1g, kb_l, ka_l):
            """[M, L, N] int32 → (ks0, ks1) [M, L, N] int32.

            kb_l/ka_l: [n_comp, n_ext, N] int32 four-step-NTT-domain key
            components."""
            M = c1g.shape[0]
            digs = []
            for i in range(L):
                limb = c1g[:, i].astype(jnp.int32)
                digs.append(limb & ((1 << DIGIT_BITS) - 1))
                digs.append(limb >> DIGIT_BITS)
            D = jnp.stack(digs, axis=1)                  # [M, n_comp, N]
            flat = D.reshape(M * n_comp, n)
            acc = []                                     # per ext prime
            for e, q in enumerate(ext):
                tb = tabs[e]
                Dn = ntt4(flat, tb).reshape(M, n_comp, n)
                s0 = jnp.zeros((M, n), jnp.int64)
                s1 = jnp.zeros((M, n), jnp.int64)
                for c in range(n_comp):
                    s0 = s0 + modmul(Dn[:, c], kb_l[c, e][None], q, tb.delta)
                    s1 = s1 + modmul(Dn[:, c], ka_l[c, e][None], q, tb.delta)
                # sums of n_comp values < q: reduce with conditional subs
                s0 = shift_mod_reduce(s0, q, tb.delta, 34)
                s1 = shift_mod_reduce(s1, q, tb.delta, 34)
                acc.append((intt4(s0, tb), intt4(s1, tb)))
            half = sp // 2
            cp0 = acc[-1][0]
            cp1 = acc[-1][1]
            cp0 = jnp.where(cp0 > half, cp0 - sp, cp0)   # centered, signed
            cp1 = jnp.where(cp1 > half, cp1 - sp, cp1)
            outs0, outs1 = [], []
            for i, qi in enumerate(p.qs):
                tb = tabs_q[i]
                # make the small-range difference non-negative (+2q covers
                # cp ≤ sp/2 < 2q), then divide by the special prime — no
                # int64 division anywhere (emulated long division on TPU)
                d0 = shift_mod_reduce(acc[i][0] - cp0 + 2 * qi, qi, tb.delta, 33)
                d1 = shift_mod_reduce(acc[i][1] - cp1 + 2 * qi, qi, tb.delta, 33)
                outs0.append(modmul(d0, jnp.int64(int(inv_p_np[i])), qi, tb.delta))
                outs1.append(modmul(d1, jnp.int64(int(inv_p_np[i])), qi, tb.delta))
            return (
                jnp.stack(outs0, axis=1).astype(jnp.int32),
                jnp.stack(outs1, axis=1).astype(jnp.int32),
            )

        def expand(c0, c1, kb, ka):
            """[L, N] query ct → [m_pad, L, N] selectors (breadth-first)."""
            c0s = jnp.zeros((m_pad, L, n), jnp.int32).at[0].set(c0)
            c1s = jnp.zeros((m_pad, L, n), jnp.int32).at[0].set(c1)
            for j in range(logm):                       # static unroll
                half_m = 1 << j
                sh0 = apply_perm(c0s, self.mono_perm[j], self.mono_sign[j])
                sh1 = apply_perm(c1s, self.mono_perm[j], self.mono_sign[j])
                both0 = jnp.concatenate([c0s[:half_m], sh0[:half_m]])
                both1 = jnp.concatenate([c1s[:half_m], sh1[:half_m]])
                gb0 = apply_perm(both0, self.gal_perm[j], self.gal_sign[j])
                gb1 = apply_perm(both1, self.gal_perm[j], self.gal_sign[j])
                ks0, ks1 = key_switch_batch(gb1, kb[j], ka[j])
                qs_b = jnp.array(p.qs, jnp.int64)[None, :, None]

                def red3q(x):
                    # x < 3q: two conditional subtracts beat emulated mod
                    x = jnp.where(x >= qs_b, x - qs_b, x)
                    return jnp.where(x >= qs_b, x - qs_b, x)

                nc0 = red3q(
                    both0.astype(jnp.int64) + gb0.astype(jnp.int64)
                    + ks0.astype(jnp.int64)
                ).astype(jnp.int32)
                nc1 = red3q(
                    both1.astype(jnp.int64) + ks1.astype(jnp.int64)
                ).astype(jnp.int32)
                c0s = jax.lax.dynamic_update_slice(
                    c0s, nc0, (0, 0, 0)
                )
                c1s = jax.lax.dynamic_update_slice(
                    c1s, nc1, (0, 0, 0)
                )
            return c0s, c1s

        def mod_down(x):
            """[..., L, N] int → [..., N] mod q1 (RNS mod switch)."""
            r2 = x[..., 1, :].astype(jnp.int64)
            r2c = jnp.where(r2 > q2 // 2, r2 - q2, r2)
            tb = tabs_q[0]
            diff = shift_mod_reduce(
                x[..., 0, :].astype(jnp.int64) - r2c + 2 * q1, q1, tb.delta, 33
            )
            return modmul(diff, jnp.int64(inv_q2_mod_q1), q1, tb.delta)

        def fold(db, sel_ntt):
            """One row's dim-1 + dim-2 hypercube fold;
            sel_ntt [m, 2, L, N] NTT-domain selectors → [2·nd, 2, N]."""
            # dim 1: fold rows over the [g1, g2] cube — scan over g1
            if axis_name is None:
                s1sel = sel_ntt[:g1]                      # [g1, 2, L, N]
            else:
                # each device folds the g1-rows of its db chunk against
                # its slice of the selector stack
                chunk = g1 // n_shards
                me = jax.lax.axis_index(axis_name)
                s1sel = jax.lax.dynamic_slice_in_dim(
                    sel_ntt[:g1], me * chunk, chunk, 0
                )

            def fold_row(acc, inp):
                srow, dbrow = inp                         # [2, L, N], [g2, L, N]
                term0 = []
                term1 = []
                for i, q in enumerate(p.qs):
                    tb = tabs_q[i]
                    term0.append(
                        modmul(srow[0, i][None], dbrow[:, i], q, tb.delta)
                    )
                    term1.append(
                        modmul(srow[1, i][None], dbrow[:, i], q, tb.delta)
                    )
                t0 = jnp.stack(term0, axis=1)             # [g2, L, N]
                t1 = jnp.stack(term1, axis=1)
                a0, a1 = acc
                qs_b = jnp.array(p.qs, jnp.int64)[None, :, None]
                a0 = jnp.where(
                    (a0 + t0) >= qs_b, a0 + t0 - qs_b, a0 + t0
                )
                a1 = jnp.where(
                    (a1 + t1) >= qs_b, a1 + t1 - qs_b, a1 + t1
                )
                return (a0, a1), None

            z = jnp.zeros((g2, L, n), jnp.int64)
            (C0n, C1n), _ = jax.lax.scan(fold_row, (z, z), (s1sel, db))
            if axis_name is not None:
                # per-shard partials are canonical (< q per limb); their
                # int64 psum is < n_shards·q < 2^34 — one staged reduce
                # restores the canonical value, bit-equal to the
                # single-device scan's running reduction
                bits = 30 + (n_shards - 1).bit_length() + 1
                C0n = jax.lax.psum(C0n, axis_name)
                C1n = jax.lax.psum(C1n, axis_name)
                C0n = jnp.stack(
                    [shift_mod_reduce(C0n[:, i], p.qs[i], tabs_q[i].delta,
                                      bits) for i in range(L)], axis=1,
                )
                C1n = jnp.stack(
                    [shift_mod_reduce(C1n[:, i], p.qs[i], tabs_q[i].delta,
                                      bits) for i in range(L)], axis=1,
                )
            # back to coeff domain
            C0 = jnp.stack(
                [intt4(C0n[:, i], tabs_q[i]) for i in range(L)], axis=1,
            )
            C1 = jnp.stack(
                [intt4(C1n[:, i], tabs_q[i]) for i in range(L)], axis=1,
            )
            c0d = mod_down(C0)                            # [g2, N] mod q1
            c1d = mod_down(C1)

            # base-t digits → dim-2 fold with selectors g1..g1+g2
            s2 = sel_ntt[g1 : g1 + g2]                    # [g2, 2, L, N]
            outs = []
            for which, poly in enumerate((c0d, c1d)):
                x = poly
                for k in range(nd):
                    dig = x % t
                    x = x // t
                    r0 = jnp.zeros((L, n), jnp.int64)
                    r1 = jnp.zeros((L, n), jnp.int64)
                    for i, q in enumerate(p.qs):
                        tb = tabs_q[i]
                        dn = ntt4(dig, tb)                # [g2, N]
                        p0 = modmul(s2[:, 0, i], dn, q, tb.delta)
                        p1 = modmul(s2[:, 1, i], dn, q, tb.delta)
                        # sum over g2 with staged reduction (each < q)
                        s0_ = shift_mod_reduce(
                            jnp.sum(p0, axis=0), q, tb.delta,
                            30 + (g2 - 1).bit_length() + 1,
                        )
                        s1_ = shift_mod_reduce(
                            jnp.sum(p1, axis=0), q, tb.delta,
                            30 + (g2 - 1).bit_length() + 1,
                        )
                        r0 = r0.at[i].set(s0_)
                        r1 = r1.at[i].set(s1_)
                    r0c = jnp.stack(
                        [intt4(r0[i][None], tabs_q[i])[0] for i in range(L)]
                    )
                    r1c = jnp.stack(
                        [intt4(r1[i][None], tabs_q[i])[0] for i in range(L)]
                    )
                    o0 = mod_down(r0c[None])[0]
                    o1 = mod_down(r1c[None])[0]
                    outs.append(jnp.stack([o0, o1]).astype(jnp.int32))
            return jnp.stack(outs)                        # [2·nd, 2, N]

        def answer(db, c0, c1, kb, ka):
            sel0, sel1 = expand(c0, c1, kb, ka)
            take = n_rows * self.m
            # NTT the needed selectors once per limb
            sel = jnp.stack([sel0[:take], sel1[:take]], axis=1)
            sel_ntt = []
            for i, q in enumerate(p.qs):
                tb = tabs_q[i]
                sel_ntt.append(ntt4(sel.reshape(-1, L, n)[:, i], tb))
            sel_ntt = jnp.stack(sel_ntt, axis=1).reshape(
                n_rows, self.m, 2, L, n
            )                                            # [take·2, N]
            if n_rows == 1:
                return fold(db, sel_ntt[0])
            # all rows share one expansion AND one DB pass per scan step
            return jax.vmap(fold, in_axes=(None, 0))(db, sel_ntt)

        return answer

    @functools.cached_property
    def _answer_fn(self):
        return jax.jit(self._build_answer())

    # batched-answer programs, one compiled program per bucket size
    # bucket cap 16: the vmapped answer at B=64 exceeds HBM at 1M scale
    # (AOT compile OOM: 16.33G needed of 15.75G); B=16 measured 99 ms/row
    _BATCH_BUCKETS = (4, 16)

    def _batched_answer_fn(self, b: int):
        if not hasattr(self, "_batch_fns"):
            self._batch_fns: Dict[int, object] = {}
        fn = self._batch_fns.get(b)
        if fn is None:
            fn = jax.jit(jax.vmap(
                self._build_answer(),
                in_axes=(None, 0, 0, None, None),
            ))
            self._batch_fns[b] = fn
        return fn

    def _resp_wire(self, outs: np.ndarray, logf: int | None = None) -> dict:
        from prefhetch_tpu.utils.wire import pack_i32

        return {
            "cts": [
                {"c0": pack_i32(outs[i, 0]), "c1": pack_i32(outs[i, 1])}
                for i in range(outs.shape[0])
            ],
            "nDigits": self._n_digits,
            "g1": self.g1,
            "g2": self.g2,
            "logF": self.logm if logf is None else logf,
        }

    def _query_c01(self, query_wire: dict):
        ct = Ciphertext.from_wire(query_wire)
        if ct.is_ntt:
            ct = self.ctx.from_ntt(ct)
        return ct.c0.astype(np.int32), ct.c1.astype(np.int32)

    def answer_2d(self, query_wire: dict, key_id: str) -> dict:
        c0, c1 = self._query_c01(query_wire)
        kb, ka = self._keys[key_id]
        outs = np.asarray(self._answer_fn(
            self.db, jnp.asarray(c0), jnp.asarray(c1), kb, ka,
        ))                                               # [2·nd, 2, N]
        return self._resp_wire(outs)

    def answer_2d_sharded(self, query_wire: dict, key_id: str, mesh) -> dict:
        """Single-row answer with the packed DB sharded over the mesh
        (VERDICT r04 next #4): each device scans its g1/ndev rows of the
        hypercube in the dim-1 fold — the HBM-dominant stage at production
        scale — and a psum + canonical reduce reassembles the accumulators
        BIT-equal to answer_2d. Expansion and the dim-2 fold run
        replicated (the next sharding lever would be the key-switch M
        axis). Requires g1 % ndev == 0."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        ndev = mesh.devices.size
        if self.g1 % ndev:
            raise ValueError(
                f"g1={self.g1} not divisible by {ndev} devices"
            )
        if not hasattr(self, "_sharded_fns"):
            self._sharded_fns: Dict[int, object] = {}
        fn = self._sharded_fns.get(ndev)
        if fn is None:
            fn = jax.jit(jax.shard_map(
                self._build_answer(1, axis_name=axis, n_shards=ndev),
                mesh=mesh,
                in_specs=(P(axis), P(), P(), P(), P()),
                out_specs=P(),
                check_vma=False,
            ))
            self._sharded_fns[ndev] = fn
        c0, c1 = self._query_c01(query_wire)
        kb, ka = self._keys[key_id]
        db_sh = jax.device_put(self.db, NamedSharding(mesh, P(axis)))
        outs = np.asarray(fn(
            db_sh, jnp.asarray(c0), jnp.asarray(c1), kb, ka,
        ))                                               # [2·nd, 2, N]
        return self._resp_wire(outs)

    # -- multi-row packed form -------------------------------------------
    def rows_per_ct(self) -> int:
        """Max row-fetches one packed query ct carries (⌊N/m⌋)."""
        return max(1, self.params.n // self.m)

    def answer_2d_multi(
        self, query_wire: dict, key_id: str, n_rows: int
    ) -> list:
        """ONE packed ct (build_query_2d_multi) → n_rows response dicts.
        Requires expansion keys registered to depth ⌈log2(n_rows·m)⌉
        (galois_keys_wire_2d_multi)."""
        if not 1 <= n_rows <= self.rows_per_ct():
            raise ValueError(
                f"n_rows={n_rows} outside [1, {self.rows_per_ct()}]"
            )
        kb, ka = self._keys[key_id]
        need = max(1, (n_rows * self.m - 1).bit_length())
        if kb.shape[0] < need:
            raise ValueError(
                f"expansion keys cover {kb.shape[0]} levels; "
                f"{n_rows} packed rows need {need}"
            )
        c0, c1 = self._query_c01(query_wire)
        if not hasattr(self, "_multi_fns"):
            self._multi_fns: Dict[int, object] = {}
        fn = self._multi_fns.get(n_rows)
        if fn is None:
            fn = jax.jit(self._build_answer(n_rows))
            self._multi_fns[n_rows] = fn
        outs = np.asarray(fn(
            self.db, jnp.asarray(c0), jnp.asarray(c1), kb, ka,
        ))                                               # [n_rows, 2·nd, 2, N]
        return [self._resp_wire(outs[j], need) for j in range(n_rows)]

    # batched multi-row cts: one program folds b·n_rows selector blocks
    # against ONE DB pass. b=2 with n_rows≈11 carries the selector load of
    # a B≈22 single-row batch — safely inside the B=64 OOM ceiling above
    _MULTI_BATCH_BUCKETS = (2, 4)

    def _try_bucket(self, call, broken_attr: str, b: int):
        """Run a batched device program; retry once before blacklisting.

        The sandbox's remote compiler 500s INTERMITTENTLY (CLAUDE.md) —
        the same program usually compiles on retry, so one transient
        failure must not degrade batching for the process lifetime
        (ADVICE r03). Only a PERSISTENT failure (e.g. a genuine compile
        OOM at this bucket size) adds `b` to the blacklist; returns None
        so the caller falls through to a smaller bucket / per-ct path."""
        try:
            return call()
        except Exception:   # noqa: BLE001 — transient remote-compile 500?
            try:
                return call()
            except Exception:   # noqa: BLE001 — persistent: blacklist
                if not hasattr(self, broken_attr):
                    setattr(self, broken_attr, set())
                getattr(self, broken_attr).add(b)
                return None

    def _batched_multi_fn(self, b: int, n_rows: int):
        if not hasattr(self, "_multi_batch_fns"):
            self._multi_batch_fns: Dict[tuple, object] = {}
        fn = self._multi_batch_fns.get((b, n_rows))
        if fn is None:
            fn = jax.jit(jax.vmap(
                self._build_answer(n_rows),
                in_axes=(None, 0, 0, None, None),
            ))
            self._multi_batch_fns[(b, n_rows)] = fn
        return fn

    def _aot_multi_call(self, b, n_rows, c0, c1, kb, ka) -> np.ndarray:
        """Run the b-way vmapped multi-answer through a DISK-CACHED PJRT
        executable (serialize/deserialize_executable), bypassing jit.

        The multi-answer program's 12-level unrolled expansion tree lowers
        to a ~60 MB StableHLO module: tracing + lowering + hashing it
        costs MINUTES of host time per process, and the XLA persistent
        cache never hits it cross-process in this sandbox (measured: b=4
        first dispatch 505 s with the compiled entry already on disk —
        fresh jit_answer cache entries every run). Serializing the
        COMPILED executable skips trace, lower, AND compile: a boot-time
        deserialize is seconds. Keyed by AOT_VERSION + backend version +
        every shape the program closes over; cleared by deleting
        bench_cache/piraot_*."""
        import hashlib

        if jax.default_backend() != "tpu":
            # CPU test path: programs there are small; keep plain jit
            return np.asarray(
                self._batched_multi_fn(b, n_rows)(self.db, c0, c1, kb, ka)
            )
        if not hasattr(self, "_aot_execs"):
            self._aot_execs: Dict[tuple, object] = {}
        key = (b, n_rows, tuple(kb.shape))
        lex = self._aot_execs.get(key)
        if lex is None:
            dev0 = jax.devices()[0]
            be = dev0.client
            pv = hashlib.sha256(
                be.platform_version.encode()
            ).hexdigest()[:10]
            p = self.params
            shp = (
                f"g{self.g1}x{self.g2}L{len(p.qs)}n{p.n}t{p.t}"
                f"d{self._n_digits}b{b}r{n_rows}k"
                + "x".join(map(str, kb.shape))
            )
            path = (
                os.path.join(
                    self._cache_dir, f"piraot_v{AOT_VERSION}_{pv}_{shp}.bin"
                )
                if self._cache_dir else None
            )
            if path and os.path.exists(path):
                with open(path, "rb") as f:
                    lex = be.deserialize_executable(f.read(), [dev0])
            else:
                comp = self._batched_multi_fn(b, n_rows).lower(
                    self.db, c0, c1, kb, ka
                ).compile()
                lex = comp.runtime_executable()
                if path:
                    tmp = path + ".tmp"
                    with open(tmp, "wb") as f:
                        f.write(lex.serialize())
                    os.replace(tmp, path)
            self._aot_execs[key] = lex
        out = lex.execute([self.db, c0, c1, kb, ka])
        return np.asarray(out[0])                # [b, n_rows, 2·nd, 2, N]

    def answer_2d_multi_batch(
        self, query_wires: list, key_id: str, n_rows: int
    ) -> list:
        """Several packed cts (all carrying n_rows row-fetches) answered as
        bucketed vmapped programs — the stage-8 production form: K=100 rows
        arrive as ⌈100/rows_per_ct⌉ cts and fold against ~2 DB passes
        total. Returns len(query_wires)·n_rows responses in order; OOM'd
        buckets fall back to per-ct answer_2d_multi programs."""
        kb, ka = self._keys[key_id]
        need = max(1, (n_rows * self.m - 1).bit_length())
        if kb.shape[0] < need:
            raise ValueError(
                f"expansion keys cover {kb.shape[0]} levels; "
                f"{n_rows} packed rows need {need}"
            )
        pairs = [self._query_c01(w) for w in query_wires]
        out: list = []
        i = 0
        while i < len(pairs):
            rem = len(pairs) - i
            broken = getattr(self, "_multi_batch_broken", ())
            usable = [
                bb for bb in self._MULTI_BATCH_BUCKETS if bb not in broken
            ]
            b = next(
                (bb for bb in reversed(usable) if bb <= rem),
                usable[0] if usable else 0,
            )
            if b == 0:
                out.extend(self.answer_2d_multi(
                    query_wires[i], key_id, n_rows
                ))
                i += 1
                continue
            chunk = pairs[i : i + b]
            nv = len(chunk)
            while len(chunk) < b:
                chunk.append(chunk[-1])
            c0 = jnp.asarray(np.stack([c[0] for c in chunk]))
            c1 = jnp.asarray(np.stack([c[1] for c in chunk]))
            outs = self._try_bucket(
                lambda: self._aot_multi_call(b, n_rows, c0, c1, kb, ka),
                "_multi_batch_broken", b,    # [b, n_rows, 2·nd, 2, N]
            )
            if outs is None:                 # persistent failure: shrink
                continue
            for j in range(nv):
                out.extend(
                    self._resp_wire(outs[j, r], need) for r in range(n_rows)
                )
            i += nv
        return out

    def answer_2d_batch(self, query_wires: list, key_id: str) -> list:
        """Answer B row-fetches as bucketed batched device programs.

        Stage-8 of the protocol needs K≈100 rows per query; answering them
        one device program at a time re-reads the packed DB K times
        (~276 ms/row measured at 1M). Batching folds all B selector sets
        against ONE pass over the DB. Buckets bound the number of compiled
        programs (each costs minutes through this sandbox's remote XLA)."""
        kb, ka = self._keys[key_id]
        pairs = [self._query_c01(w) for w in query_wires]
        out: list = []
        i = 0
        while i < len(pairs):
            rem = len(pairs) - i
            # largest bucket not wastefully larger than the remainder
            broken = getattr(self, "_batch_broken", ())
            usable = [bb for bb in self._BATCH_BUCKETS if bb not in broken]
            b = next(
                (bb for bb in reversed(usable) if bb <= rem),
                usable[0] if usable else 0,
            )
            if b == 0:      # every bucket OOM'd: per-query answers
                c0j, c1j = pairs[i]
                out.append(self._resp_wire(np.asarray(self._answer_fn(
                    self.db, jnp.asarray(c0j), jnp.asarray(c1j),
                    kb, ka,
                ))))
                i += 1
                continue
            chunk = pairs[i : i + b]
            nv = len(chunk)                  # valid rows (tail pads repeat)
            while len(chunk) < b:
                chunk.append(chunk[-1])
            c0 = jnp.asarray(np.stack([c[0] for c in chunk]))
            c1 = jnp.asarray(np.stack([c[1] for c in chunk]))
            outs = self._try_bucket(
                lambda: np.asarray(self._batched_answer_fn(b)(
                    self.db, c0, c1, kb, ka,
                )),                          # [b, 2·nd, 2, N]
                "_batch_broken", b,
            )
            if outs is None:
                # persistent compile failure (e.g. OOM) at this bucket:
                # drop to per-query answers rather than fail the fetch
                out.extend(
                    self._resp_wire(np.asarray(self._answer_fn(
                        self.db, c0[j], c1[j], kb, ka,
                    ))) for j in range(nv)
                )
                i += nv
                continue
            out.extend(self._resp_wire(outs[j]) for j in range(nv))
            i += nv
        return out
