"""Negacyclic number-theoretic transform over Z_q[X]/(X^N+1).

TPU-first design notes:

- All butterflies are expressed as reshapes + elementwise modular arithmetic
  over the whole [batch, N] tensor — no gathers or scatters in the loop (one
  precomputed bit-reversal permutation up front). log2(N) stages of pure VPU
  work, vmappable over RNS limbs and ciphertext batches.
- Modular products run in int64 lanes (operands < 2^31 ⇒ products < 2^62).
  int64 is emulated on TPU; the Pallas int32 Montgomery kernel (ops/ later
  rounds) is the planned speed-of-light path — this module is the reference
  implementation and correctness oracle.
- The negacyclic twist (multiply by ψ^i / ψ^{-i}) is folded around a standard
  cyclic NTT with ω = ψ².

Replaces what SEAL's Harvey NTT would have done in the reference's intended
design (SEAL linked but uncalled — reference CMakeLists.txt:33-38).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prefhetch_tpu.crypto.params import root_of_unity


class NTTTables(NamedTuple):
    """Precomputed constants for one prime q (all numpy int64, host-built)."""

    q: int
    n: int
    psi_pows: np.ndarray       # [n] ψ^i — forward twist
    ipsi_pows: np.ndarray      # [n] ψ^{-i}·n^{-1}... (twist * 1/n folded)
    stage_tw: Tuple[np.ndarray, ...]    # per-stage twiddles ω^…, shapes [m]
    stage_itw: Tuple[np.ndarray, ...]   # inverse-stage twiddles
    bitrev: np.ndarray         # [n] bit-reversal permutation


@functools.lru_cache(maxsize=None)
def build_tables(q: int, n: int) -> NTTTables:
    logn = n.bit_length() - 1
    assert 1 << logn == n
    psi = root_of_unity(q, 2 * n)
    omega = psi * psi % q
    inv_psi = pow(psi, -1, q)
    inv_omega = pow(omega, -1, q)
    inv_n = pow(n, -1, q)

    psi_pows = np.array([pow(psi, i, q) for i in range(n)], np.int64)
    ipsi = np.array([pow(inv_psi, i, q) * inv_n % q for i in range(n)], np.int64)

    bitrev = np.zeros(n, np.int64)
    for i in range(n):
        r = 0
        x = i
        for _ in range(logn):
            r = (r << 1) | (x & 1)
            x >>= 1
        bitrev[i] = r

    stage_tw = []
    stage_itw = []
    for s in range(logn):
        m = 1 << s  # half-block size at this stage
        w = pow(omega, n // (2 * m), q)
        iw = pow(inv_omega, n // (2 * m), q)
        stage_tw.append(np.array([pow(w, j, q) for j in range(m)], np.int64))
        stage_itw.append(np.array([pow(iw, j, q) for j in range(m)], np.int64))
    return NTTTables(
        q=q, n=n, psi_pows=psi_pows, ipsi_pows=ipsi,
        stage_tw=tuple(stage_tw), stage_itw=tuple(stage_itw), bitrev=bitrev,
    )


def _xp_of(x):
    """Array-module dispatch: jnp for traced/device arrays, numpy otherwise.

    The client party (keygen/encrypt/decrypt) runs pure numpy — dispatching
    12 eager op stages to a remote TPU per transform would dominate client
    latency; the server's batched MAC path traces the same code under jit.
    """
    return jnp if isinstance(x, jax.Array) else np


def _cyclic_ntt_core(x, tables: NTTTables, inverse: bool):
    """In-order → in-order cyclic NTT over the last axis. x int64 in [0, q)."""
    xp = _xp_of(x)
    q = tables.q
    n = tables.n
    logn = n.bit_length() - 1
    batch = x.shape[:-1]

    x = x[..., tables.bitrev] if xp is np else x[..., jnp.asarray(tables.bitrev)]
    tws = tables.stage_itw if inverse else tables.stage_tw
    for s in range(logn):
        m = 1 << s
        tw = tws[s] if xp is np else jnp.asarray(tws[s])   # [m]
        y = x.reshape(*batch, n // (2 * m), 2, m)
        even = y[..., 0, :]
        odd = y[..., 1, :] * tw % q                  # int64 product < 2^61
        x = xp.concatenate([(even + odd) % q, (even - odd) % q], axis=-1)
        x = x.reshape(*batch, n // (2 * m), 2 * m).reshape(*batch, n)
    return x


import os

_NATIVE_DISABLED = os.environ.get("PFH_NO_NATIVE", "") not in ("", "0")
_native_ntts: dict = {}


def _native_transform(x: np.ndarray, tables: NTTTables, inverse: bool):
    """Route host-side transforms through the C++ Shoup NTT when built
    (native/prefhetch_native.cpp) — ~10× over the numpy butterfly path."""
    if _NATIVE_DISABLED:
        return None
    try:
        from prefhetch_tpu import native
    except ImportError:
        return None
    if not native.available():
        return None
    key = (tables.q, tables.n, inverse)
    fn = _native_ntts.get(key)
    if fn is None:
        fn = native.NativeNTT(tables.q, tables.n, inverse=inverse)
        _native_ntts[key] = fn
    shape = x.shape
    return fn(x).reshape(shape)


def ntt(x, tables: NTTTables):
    """Forward negacyclic NTT along the last axis (numpy or jax input)."""
    xp = _xp_of(x)
    q = tables.q
    if xp is np:
        out = _native_transform(np.asarray(x, np.int64), tables, inverse=False)
        if out is not None:
            return out
    psi = tables.psi_pows if xp is np else jnp.asarray(tables.psi_pows)
    return _cyclic_ntt_core(x * psi % q, tables, inverse=False)


def intt(x, tables: NTTTables):
    """Inverse negacyclic NTT along the last axis (numpy or jax input)."""
    xp = _xp_of(x)
    q = tables.q
    if xp is np:
        out = _native_transform(np.asarray(x, np.int64), tables, inverse=True)
        if out is not None:
            return out
    ipsi = tables.ipsi_pows if xp is np else jnp.asarray(tables.ipsi_pows)
    y = _cyclic_ntt_core(x, tables, inverse=True)
    return y * ipsi % q


def negacyclic_polymul(a: jax.Array, b: jax.Array, tables: NTTTables) -> jax.Array:
    """a·b in Z_q[X]/(X^N+1) via NTT ∘ pointwise ∘ INTT."""
    q = tables.q
    return intt(ntt(a, tables) * ntt(b, tables) % q, tables)


# ---------------------------------------------------------------------------
# Host-side oracle (python ints, no jax) for tests
def naive_negacyclic_polymul(a: np.ndarray, b: np.ndarray, q: int) -> np.ndarray:
    """O(N²) schoolbook negacyclic product — test oracle."""
    n = len(a)
    out = [0] * n
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            v = ai * int(b[j])
            if k < n:
                out[k] = (out[k] + v) % q
            else:
                out[k - n] = (out[k - n] - v) % q
    return np.array(out, np.int64)
