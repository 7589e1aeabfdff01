"""Negacyclic NTT on the MXU: digit-decomposed DFT matmul.

The butterfly-network NTT (crypto/ntt.py) is VPU/elementwise work with a
log N-deep dependency chain — the wrong shape for TPU, and its unrolled
int64 stages also blow up XLA compile time. The MXU formulation used here:

    NTT(a)[j] = Σ_k a_k ψ^{k(2j+1)}  — one N×N matrix-vector product mod q.

Exact integer matmul on the MXU via balanced base-256 digits:
    a = Σ_d A_d·2^{8d},  F = Σ_e F_e·2^{8e},   A_d, F_e ∈ [-128, 127]
so  a @ F = Σ_{d,e} 2^{8(d+e)} (A_d @ F_e)
with every A_d @ F_e an int8×int8→int32 MXU matmul whose accumulators stay
< N·128² ≤ 2^26 (exact).

The modular recombination deliberately avoids 64-bit division (TPU int64 is
emulated in 32-bit lanes, and a generic `mod` lowers to a long-division
loop that dominated the whole kernel). The RNS primes are chosen just below
2^30 (crypto/params.find_ntt_primes), so with δ = 2^30 − q < 2^19:

    x ≡ (x & (2^30−1)) + (x >> 30)·δ   (mod q)

shrinks any 62-bit value to < q in 4 shift/multiply-small/add rounds —
`shift_mod_reduce` below. Digit weights 2^{8s} recombine as pure shifts for
s ≤ 3 and one small multiply for s ≥ 4.

O(N²) instead of O(N log N), but N² int8 MACs is microseconds of MXU time
at N≤8192, the program is tiny (16 matmuls — fast to compile), and there is
no deep dependency chain. This is the production path for the server-side
homomorphic MAC (SURVEY.md §7.4 hard-part #1: "lay out NTTs to hit the MXU").
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from prefhetch_tpu.crypto.params import root_of_unity

N_DIGITS = 4  # 4 × 8-bit balanced digits cover q < 2^31

_M30 = (1 << 30) - 1


class MXUNTTTables(NamedTuple):
    q: int
    n: int
    f_digits: np.ndarray    # [4, N, N] int8 — forward matrix digits
    g_digits: np.ndarray    # [4, N, N] int8 — inverse matrix digits
    weights: np.ndarray     # [7] int64 — 2^{8s} mod q for s = d+e
    delta: int              # 2^30 − q  (small by prime construction)


def _balanced_digits_int(mat: np.ndarray, q: int) -> np.ndarray:
    """[N, N] int64 in [0, q) → [4, N, N] int8 balanced base-256 digits."""
    x = mat.astype(np.int64).copy()
    out = np.empty((N_DIGITS,) + mat.shape, np.int8)
    for d in range(N_DIGITS):
        r = ((x + 128) % 256) - 128
        out[d] = r.astype(np.int8)
        x = (x - r) >> 8
    assert np.all(x == 0), "digits must reconstruct exactly"
    return out


@functools.lru_cache(maxsize=None)
def build_mxu_tables(q: int, n: int) -> MXUNTTTables:
    psi = root_of_unity(q, 2 * n)
    inv_psi = pow(psi, -1, q)
    inv_n = pow(n, -1, q)
    # F[k, j] = ψ^{k(2j+1)} ;  G[j, k] = N⁻¹·ψ^{-k(2j+1)}
    # (INTT(v)[k] = N⁻¹ Σ_j v_j ψ^{-k(2j+1)})
    psi_pows = np.array([pow(psi, int(e), q) for e in range(2 * n)], np.int64)
    ipsi_pows = np.array([pow(inv_psi, int(e), q) for e in range(2 * n)], np.int64)
    kk, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    F = psi_pows[(kk * (2 * jj + 1)) % (2 * n)]
    G = (ipsi_pows[(kk * (2 * jj + 1)) % (2 * n)] * inv_n % q).T
    weights = np.array(
        [pow(2, 8 * s, q) for s in range(2 * N_DIGITS - 1)], np.int64
    )
    assert (1 << 30) - q < (1 << 20), (
        f"prime {q} too far below 2^30 for shift-based reduction"
    )
    return MXUNTTTables(
        q=q, n=n,
        f_digits=_balanced_digits_int(F, q),
        g_digits=_balanced_digits_int(G, q),
        weights=weights,
        delta=(1 << 30) - q,
    )


def shift_mod_reduce(x: jax.Array, q: int, delta: int, bits: int = 62) -> jax.Array:
    """Reduce non-negative int64 x < 2^bits to [0, q) without division.

    Uses 2^30 ≡ δ (mod q): each round maps x → (x & M30) + (x>>30)·δ.
    Requires δ = 2^30 − q (the prime-chain construction guarantees δ small;
    asserted < 2^19 at table build)."""
    # per round: x' ≤ 2^30 + 2^(b−30)·δ < 2^max(31, b−30+⌈log2δ⌉+1)
    dbits = max(1, (delta - 1).bit_length())
    b = bits
    while b > 31:
        x = (x & _M30) + (x >> 30) * delta
        b = max(b - 30 + dbits + 1, 31)
    x = jnp.where(x >= q, x - q, x)
    x = jnp.where(x >= q, x - q, x)
    return x


def modmul(a: jax.Array, b: jax.Array, q: int, delta: int) -> jax.Array:
    """Pointwise (a·b) mod q for residues in [0, q), division-free."""
    return shift_mod_reduce(a.astype(jnp.int64) * b.astype(jnp.int64), q, delta, 60)


def _digits_of(x: jax.Array) -> List[jax.Array]:
    """[B, N] int32 in [0, q) → 4 × [B, N] int8 balanced digits (traced)."""
    x = x.astype(jnp.int32)
    outs = []
    for _ in range(N_DIGITS):
        r = ((x + 128) % 256) - 128
        outs.append(r.astype(jnp.int8))
        x = (x - r) >> 8
    return outs


def _matmul_mod(x: jax.Array, digit_mats: jax.Array, weights, q: int,
                delta: int) -> jax.Array:
    """x [B, N] int32 residues → x @ M mod q via 16 int8 MXU matmuls.

    Recombination: partials grouped by digit weight s = d+e; |P_s| < 4·2^26.
    s ≤ 3 contributes P_s << 8s (shift only); s ≥ 4 contributes
    P_s · (2^{8s} mod q) — one small int64 multiply. The signed sum is made
    non-negative with a K·q offset, then shift-reduced."""
    xd = _digits_of(x)
    n_s = 2 * N_DIGITS - 1
    partial = [None] * n_s                       # grouped by s = d+e
    for d in range(N_DIGITS):
        for e in range(N_DIGITS):
            p = jax.lax.dot_general(
                xd[d], digit_mats[e],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                    # [B, N] int32, |p| < 2^26
            s = d + e
            partial[s] = p if partial[s] is None else partial[s] + p
    acc = jnp.zeros(x.shape, jnp.int64)
    for s in range(n_s):
        p64 = partial[s].astype(jnp.int64)
        if 8 * s < 30:
            acc = acc + (p64 << (8 * s))         # exact power of two
        else:
            acc = acc + p64 * int(pow(2, 8 * s, q))
    # |acc| < 7·2^28·2^30 < 2^61 signed → offset to non-negative
    offset = ((1 << 61) // q + 1) * q
    return shift_mod_reduce(acc + offset, q, delta, 62)


def ntt_mxu(x: jax.Array, tables: MXUNTTTables, f_digits=None) -> jax.Array:
    """Forward negacyclic NTT of [B, N] int residues (returns int64 [B, N]).

    Pass ``f_digits`` as a traced/device array when calling under jit — the
    matrix digits are 64+ MB at N=4096 and must travel as an ARGUMENT, not a
    baked-in constant (constants blow past the remote compiler's program
    size limit and defeat the compile cache)."""
    mats = jnp.asarray(tables.f_digits) if f_digits is None else f_digits
    return _matmul_mod(
        x.astype(jnp.int32), mats, tables.weights, tables.q, tables.delta,
    )


def intt_mxu(x: jax.Array, tables: MXUNTTTables, g_digits=None) -> jax.Array:
    """Inverse negacyclic NTT of [B, N] int residues."""
    mats = jnp.asarray(tables.g_digits) if g_digits is None else g_digits
    return _matmul_mod(
        x.astype(jnp.int32), mats, tables.weights, tables.q, tables.delta,
    )


# ---------------------------------------------------------------------------
# Four-step NTT: N = N1·N2 decomposition.
#
# The dense N×N formulation above costs N² MACs and a [4, N, N] int8 matrix
# (268 MB at N=8192) per transform direction — at small batch the matrix
# HBM read dominates. The classic four-step factorization
#
#   X[j2·N1 + j1] = Σ_{k2} ω2^{j2k2} · ω^{j1k2} · Σ_{k1} A[k1,k2] ω1^{j1k1}
#
# (ω1 = ω^{N2} of order N1, ω2 = ω^{N1} of order N2, A = input as [N1, N2])
# is two small matmuls (N1² and N2²) plus one twiddle multiply:
# N·(N1+N2) MACs (~42× fewer at N=8192) and kilobyte-scale matrices.
#
# The output lands in "four-step order" (j1-major instead of j-major). All
# NTT-domain consumers here are POINTWISE (ct×pt MACs, key-switch inner
# products), so the ordering is a private convention: ntt4/intt4 are exact
# mutual inverses and pointwise products correspond to negacyclic
# convolution exactly as with ntt_mxu — only cross-domain mixing with the
# dense transform is disallowed.
# ---------------------------------------------------------------------------


class NTT4Tables(NamedTuple):
    q: int
    n: int
    n1: int
    n2: int
    delta: int
    # forward: W1 [4, N1, N1] (ψ-twist folded into its k1 columns),
    #          tw [N1, N2] (ω^{j1·k2}·ψ^{k2}), W2 [4, N2, N2]
    f_w1: np.ndarray        # [4, N1, N1] int8 digits of ω1^{j1·k1}·ψ^{k1·N2}
    f_tw: np.ndarray        # [N1, N2] int64 — ω^{j1·k2}·ψ^{k2}
    f_w2: np.ndarray        # [4, N2, N2] int8 digits of ω2^{j2·k2}
    # inverse: W2⁻¹, conj twiddles (·ψ^{-k2}), W1⁻¹ (·ψ^{-k1·N2}·N⁻¹ rows)
    g_w2: np.ndarray        # [4, N2, N2]
    g_tw: np.ndarray        # [N1, N2] — ω^{-j1·k2}·ψ^{-k2}
    g_w1: np.ndarray        # [4, N1, N1]


@functools.lru_cache(maxsize=None)
def build_ntt4_tables(q: int, n: int, n1: int | None = None) -> NTT4Tables:
    """The negacyclic ψ-twists (ψ^k pre-twist forward, ψ^{-k}·N⁻¹ post-twist
    inverse) are FOLDED into the static tables: ψ^k = ψ^{k1·N2}·ψ^{k2} with
    k = k1·N2 + k2, so the k1 part scales W1's contraction columns and the
    k2 part rides the middle twiddle — two whole elementwise modmul passes
    per transform disappear, bit-identically."""
    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)      # ~√N, power of two
    assert n % n1 == 0
    n2 = n // n1
    psi = root_of_unity(q, 2 * n)
    inv_psi = pow(psi, -1, q)
    w = pow(psi, 2, q)                             # ω of order N
    inv_w = pow(w, -1, q)
    inv_n = pow(n, -1, q)

    def powvec(base, count):
        out = np.empty(count, np.int64)
        v = 1
        for i in range(count):
            out[i] = v
            v = v * base % q
        return out

    def mat(base, m):
        row = powvec(base, m)
        jj, kk = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
        return row[(jj * kk) % m]

    w1 = pow(w, n2, q)
    w2 = pow(w, n1, q)
    W1 = mat(w1, n1)                               # ω1^{j1·k1}, symmetric
    W2 = mat(w2, n2)
    W1i = mat(pow(w1, -1, q), n1)
    W2i = mat(pow(w2, -1, q), n2)
    # _small_matmul_mod computes out[..., j] = Σ_m x[..., m]·M[j, m]
    # (contraction on M's axis 1). Forward: input index k1 is the
    # contraction axis → scale W1's COLUMNS by ψ^{k1·N2}. Inverse: output
    # index k1 is M's axis 0 → scale W1i's ROWS by ψ^{-k1·N2}·N⁻¹.
    psiN2 = powvec(pow(psi, n2, q), n1)            # ψ^{k1·N2}
    ipsiN2 = powvec(pow(inv_psi, n2, q), n1)
    W1f = W1 * psiN2[None, :] % q
    W1g = W1i * (ipsiN2 * inv_n % q)[:, None] % q
    j1, k2 = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    wp = powvec(w, n)
    iwp = powvec(inv_w, n)
    psiv = powvec(psi, n2)                          # ψ^{k2}
    ipsiv = powvec(inv_psi, n2)
    f_tw = wp[(j1 * k2) % n] * psiv[None, :] % q
    g_tw = iwp[(j1 * k2) % n] * ipsiv[None, :] % q
    assert (1 << 30) - q < (1 << 20)
    return NTT4Tables(
        q=q, n=n, n1=n1, n2=n2, delta=(1 << 30) - q,
        f_w1=_balanced_digits_int(W1f, q),
        f_tw=f_tw,
        f_w2=_balanced_digits_int(W2, q),
        g_w2=_balanced_digits_int(W2i, q),
        g_tw=g_tw,
        g_w1=_balanced_digits_int(W1g, q),
    )


def _digits_of_nd(x: jax.Array) -> jax.Array:
    """int32 residues → […, 4] int8 balanced digits (stacked last axis)."""
    x = x.astype(jnp.int32)
    outs = []
    for _ in range(N_DIGITS):
        r = ((x + 128) % 256) - 128
        outs.append(r.astype(jnp.int8))
        x = (x - r) >> 8
    return jnp.stack(outs, axis=-1)


def _small_matmul_mod(x: jax.Array, digit_mats: jax.Array, q: int,
                      delta: int, axis: int) -> jax.Array:
    """Exact (x @ M) mod q contracting `axis` of x [..., m, ...] against
    M's first axis, via 16 int8 MXU matmuls (digit pairs)."""
    m = digit_mats.shape[1]
    # move the contraction axis last: x' [..., m]
    xm = jnp.moveaxis(x, axis, -1)
    xd = _digits_of_nd(xm)                          # [..., m, 4]
    n_s = 2 * N_DIGITS - 1
    partial = [None] * n_s
    for d in range(N_DIGITS):
        for e in range(N_DIGITS):
            # contract m: out[..., j] = Σ_k xd[..., k, d] · M_e[j, k]
            p = jax.lax.dot_general(
                xd[..., d], digit_mats[e],
                dimension_numbers=(
                    ((xd.ndim - 2,), (1,)), ((), ())
                ),
                preferred_element_type=jnp.int32,
            )
            s = d + e
            partial[s] = p if partial[s] is None else partial[s] + p
    acc = jnp.zeros(partial[0].shape, jnp.int64)
    for s in range(n_s):
        p64 = partial[s].astype(jnp.int64)
        if 8 * s < 30:
            acc = acc + (p64 << (8 * s))
        else:
            acc = acc + p64 * int(pow(2, 8 * s, q))
    # |partial| < 4·m·128² ≤ 2^27 for m ≤ 512 → |acc| < 7·2^27·2^30 < 2^60
    offset = ((1 << 61) // q + 1) * q
    out = shift_mod_reduce(acc + offset, q, delta, 62)
    return jnp.moveaxis(out, -1, axis)


def _use_pallas_ntt() -> bool:
    """Dispatch the four-step transform to the fused Pallas kernel on TPU
    (ops/ntt_pallas — bit-exact, ~int32/uint32 Shoup arithmetic instead of
    emulated-int64 recombination). PFH_NTT_PALLAS=0 restores the XLA path."""
    import os

    if os.environ.get("PFH_NTT_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:   # noqa: BLE001 — backend probe must never raise here
        return False


def ntt4(x: jax.Array, tb: NTT4Tables) -> jax.Array:
    """Forward negacyclic NTT of [B, N] residues, four-step order output.

    The small W matrices are jit constants (≤ 256 KB — negligible program
    size, unlike the dense form); the ψ-twists are pre-folded into the
    tables (build_ntt4_tables), so the transform is matmul · twiddle ·
    matmul with no standalone twist pass. On TPU this dispatches to the
    fused Pallas kernel (ops/ntt_pallas) — bit-identical output."""
    q, delta = tb.q, tb.delta
    B = x.shape[0]
    if tb.n1 in (64, 128) and tb.n2 in (64, 128) and _use_pallas_ntt():
        from prefhetch_tpu.ops.ntt_pallas import build_pallas_ntt4, ntt4_pallas

        return ntt4_pallas(x, build_pallas_ntt4(q, tb.n, tb.n1)) \
            .astype(jnp.int64)
    a = x.reshape(B, tb.n1, tb.n2)
    b = _small_matmul_mod(a, jnp.asarray(tb.f_w1), q, delta, axis=1)
    c = modmul(b, jnp.asarray(tb.f_tw)[None], q, delta)
    d = _small_matmul_mod(c, jnp.asarray(tb.f_w2), q, delta, axis=2)
    return d.reshape(B, tb.n)


def intt4(x: jax.Array, tb: NTT4Tables) -> jax.Array:
    """Inverse of ntt4 (consumes four-step order, emits natural order)."""
    q, delta = tb.q, tb.delta
    B = x.shape[0]
    if tb.n1 in (64, 128) and tb.n2 in (64, 128) and _use_pallas_ntt():
        from prefhetch_tpu.ops.ntt_pallas import (
            build_pallas_ntt4, intt4_pallas,
        )

        return intt4_pallas(x, build_pallas_ntt4(q, tb.n, tb.n1)) \
            .astype(jnp.int64)
    a = x.reshape(B, tb.n1, tb.n2)
    b = _small_matmul_mod(a, jnp.asarray(tb.g_w2), q, delta, axis=2)
    c = modmul(b, jnp.asarray(tb.g_tw)[None], q, delta)
    d = _small_matmul_mod(c, jnp.asarray(tb.g_w1), q, delta, axis=1)
    return d.reshape(B, tb.n)


def modmul_lazy(a: jax.Array, b: jax.Array, q: int, delta: int) -> jax.Array:
    """(a·b) mod q, PARTIALLY reduced: one fold round instead of modmul's
    full chain. Result ≡ a·b (mod q) and < 2^(31+⌈log2 δ⌉) ≤ 2^51 — callers
    accumulate several terms and finish with one shift_mod_reduce. The MAC
    pattern Σ_c digits·key inside key-switching is the whole point: n_comp
    lazy products + one final reduce replaces n_comp full reductions."""
    x = a.astype(jnp.int64) * b.astype(jnp.int64)
    return (x & _M30) + (x >> 30) * delta
