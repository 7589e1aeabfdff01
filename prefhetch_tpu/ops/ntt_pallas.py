"""Fused Pallas four-step negacyclic NTT — int32/uint32 Shoup arithmetic.

Bit-exact drop-in for ops/ntt_mxu.ntt4 / intt4 (same four-step output
order, same canonical [0, q) results), re-built as two Pallas kernels so
the whole transform runs out of VMEM with no emulated-int64 tensors.

Why: the XLA ntt4 recombines its int8 MXU partials through int64
arithmetic (shift_mod_reduce), and TPU int64 is emulated in 32-bit lanes —
the r04 profile measured 4.8 ms per [512, 8192] transform against a
~0.05 ms HBM floor, and that VPU modular-multiply floor capped both the
CKKS scoring service and the PIR per-row cost (VERDICT r04 next #3).
This kernel keeps every intermediate in 32-bit lanes:

  * the 16 int8 digit matmuls accumulate into FOUR int32 group buffers
    (digit weights 2^8 folded in-place; exact by the bound
    |partial_s| <= 4*128*127*128 < 2^23);
  * group weights 2^16 / 2^24 / 2^40 are applied with Shoup multiplication
    (precomputed floor(c*2^32/q) companions, 4 uint32 mulhi pieces) —
    ~20 native u32 VPU ops per modmul instead of an emulated-int64
    shift_mod_reduce chain;
  * signed->unsigned offsets ride a single top-bit flip per group, with
    one compile-time correction constant folded into the final reduce;
  * the middle twiddle is a vectorized Shoup multiply against static
    (tw, tw_shoup) tables, fused into the first kernel.

Layout: both matmuls contract the LAST axis (the n1 contraction is moved
there by an XLA swapaxes outside the kernel — a minor-dims transpose the
TPU does as one VMEM-speed copy), and 64-wide steps are packed two rows
per 128-lane register via block-diagonal weight matrices, so every dot is
a native [*, 128] @ [128, 128] int8 MXU op with zero lane padding.

Correctness contract: inputs are int residues in [0, 2^31); outputs are
canonical [0, q) and equal ntt_mxu.ntt4/intt4 element-for-element (tests
assert exact equality, CPU interpret mode vs the XLA path). The reference
(PreFHEtch) has no HE at its snapshot — this backs the SEAL-shaped hole
(CMakeLists.txt:33-38, include/client/client_lib.h:28-30) that SURVEY §7.4
hard-part #1 requires: "lay out NTTs to hit the MXU".
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prefhetch_tpu.ops.ntt_mxu import build_ntt4_tables

LANE = 128
_M30 = (1 << 30) - 1
_MASK16 = (1 << 16) - 1


class _Step(NamedTuple):
    """One matmul-mod(-twiddle) stage, tables in packed kernel layout."""

    wd: np.ndarray                  # [4, 128, 128] int8 (block-diag packed)
    tw: Optional[np.ndarray]        # [r // pack, 128] uint32, or None
    tw_shoup: Optional[np.ndarray]  # same shape, floor(tw * 2^32 / q)
    r: int                          # rows per polynomial before packing
    m: int                          # real contraction size (64 or 128)
    pack: int                       # 128 // m


class PallasNTT4(NamedTuple):
    q: int
    delta: int
    n: int
    n1: int
    n2: int
    f_a: _Step          # forward: contract k1, twiddle
    f_b: _Step          # forward: contract k2, canonical out
    g_a: _Step          # inverse: contract j2, twiddle
    g_b: _Step          # inverse: contract j1, canonical out


def _pack_w(dig: np.ndarray) -> np.ndarray:
    """[4, m, m] int8 digit matrices -> [4, 128, 128] block-diag packed."""
    m = dig.shape[1]
    pack = LANE // m
    assert pack * m == LANE and pack in (1, 2), m
    out = np.zeros((dig.shape[0], LANE, LANE), np.int8)
    for p in range(pack):
        out[:, p * m:(p + 1) * m, p * m:(p + 1) * m] = dig
    return out


def _pack_tw(tw: np.ndarray, q: int) -> tuple[np.ndarray, np.ndarray]:
    """[r, mout] int64 twiddles -> packed [r//pack, 128] (value, shoup)."""
    r, mout = tw.shape
    pack = LANE // mout
    t = tw.reshape(r // pack, pack * mout).astype(np.uint32)
    sh = np.empty_like(t)
    flat = tw.reshape(-1)
    shl = np.array([(int(c) << 32) // q for c in flat], np.uint64)
    sh = shl.astype(np.uint32).reshape(r // pack, pack * mout)
    return t, sh


def _mk_step(dig: np.ndarray, tw: Optional[np.ndarray], q: int) -> _Step:
    m = dig.shape[1]
    pack = LANE // m
    twp = tws = None
    if tw is not None:
        twp, tws = _pack_tw(tw, q)
    return _Step(wd=_pack_w(dig), tw=twp, tw_shoup=tws,
                 r=tw.shape[0] if tw is not None else 0, m=m, pack=pack)


@functools.lru_cache(maxsize=None)
def build_pallas_ntt4(q: int, n: int, n1: Optional[int] = None) -> PallasNTT4:
    """Derive packed kernel tables from the XLA build (bit-identical
    matrices/twiddles — ntt_mxu.build_ntt4_tables is the single source)."""
    tb = build_ntt4_tables(q, n, n1)
    assert tb.n1 in (64, 128) and tb.n2 in (64, 128), (tb.n1, tb.n2)
    # right-multiplication forms: out[.., j] = sum_m in[.., m] * W[m, j]
    # (ntt_mxu stores M[j, m]; digits of a transpose == transposed digits)
    f_a = _mk_step(tb.f_w1.transpose(0, 2, 1), tb.f_tw.T, q)
    f_b = _mk_step(tb.f_w2.transpose(0, 2, 1), None, q)
    g_a = _mk_step(tb.g_w2.transpose(0, 2, 1), tb.g_tw, q)
    g_b = _mk_step(tb.g_w1.transpose(0, 2, 1), None, q)
    # steps without twiddles still need r for the output reshape
    f_b = f_b._replace(r=tb.n1)
    g_b = g_b._replace(r=tb.n2)
    f_a = f_a._replace(r=tb.n2)
    g_a = g_a._replace(r=tb.n1)
    return PallasNTT4(q=q, delta=tb.delta, n=tb.n, n1=tb.n1, n2=tb.n2,
                      f_a=f_a, f_b=f_b, g_a=g_a, g_b=g_b)


def _u32(x):
    return x.astype(jnp.uint32)


def _mulhi_u32(x, c):
    """Exact high 32 bits of a u32 x u32 product (16-bit pieces)."""
    x0 = x & _MASK16
    x1 = x >> 16
    c0 = c & _MASK16
    c1 = c >> 16
    p00 = x0 * c0
    p01 = x0 * c1
    p10 = x1 * c0
    p11 = x1 * c1
    mid = (p00 >> 16) + (p01 & _MASK16) + (p10 & _MASK16)
    return p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)


def _shoup(x, c, c_shoup, q):
    """x*c mod q for u32 x, constant c in [0, q): result in [0, 2q).

    h = floor(x * floor(c*2^32/q) / 2^32) differs from floor(x*c/q) by at
    most 1, so r = x*c - h*q lands in [0, 2q) — computed exactly in
    wrapping u32 arithmetic because r < 2q < 2^31."""
    h = _mulhi_u32(x, c_shoup)
    return x * c - h * q


def _fold30(x, delta):
    """u32 x -> x mod-q-congruent value < 2^30 + 4*delta (one 2^30 fold)."""
    return (x & _M30) + (x >> 30) * delta


@functools.lru_cache(maxsize=None)
def _make_kernel(q: int, delta: int, has_tw: bool, canonical: bool,
                 rp: int):
    """Kernel: int32 block [bt, r*m] -> matmul-mod(-twiddle) -> int32.

    rp = rows-per-polynomial after packing (r // pack); the twiddle tables
    are indexed [rp, 128] and broadcast over the bt polynomials."""
    w2c = pow(2, 16, q)
    w34c = pow(2, 24, q)
    w56c = pow(2, 40, q)
    w2s = (w2c << 32) // q
    w34s = (w34c << 32) // q
    w56s = (w56c << 32) // q
    # the signed->unsigned top-bit flip adds 2^31 to every group value;
    # subtract sum(2^31 * group_weight) once, folded into the final sum
    corr = (-(1 << 31) * (1 + (1 << 16) + (1 << 24) + (1 << 40))) % q
    qs = np.uint32(q)
    dl = np.uint32(delta)

    def kernel(x_ref, wd_ref, tw_ref, tws_ref, o_ref):
        x = x_ref[:].reshape(-1, LANE)              # [bt*rp, 128] int32
        # one 2^30 fold first: raw inputs reach 2q-1 (< 2^31), above the
        # 4-digit balanced-base-256 ceiling 127*(1+2^8+2^16+2^24); folding
        # bounds them by 2^30 + delta < 1.62e9, which decomposes exactly
        xf = _fold30(_u32(x), dl).astype(jnp.int32)
        cur = xf
        xd = []
        for _ in range(4):
            rdig = ((cur + 128) & 255) - 128
            xd.append(rdig.astype(jnp.int8))
            cur = (cur - rdig) >> 8
        # 16 int8 MXU matmuls folded into 4 int32 group accumulators:
        # group(0,1) w=1, group(2) w=2^16, group(3,4) w=2^24,
        # group(5,6) w=2^40; the odd member of each pair rides a *256.
        # Exact in int32: |sum_{d+e=s} dot| < 4*128*127*128 < 2^23 and the
        # worst group |g34| < 2^30.6 + 2^23 < 2^31.
        groups = [None, None, None, None]
        g_of_s = (0, 0, 1, 2, 2, 3, 3)
        odd_of_s = (False, True, False, False, True, False, True)
        for d in range(4):
            for e in range(4):
                p = jax.lax.dot_general(
                    xd[d], wd_ref[e],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                s = d + e
                if odd_of_s[s]:
                    p = p << 8
                gi = g_of_s[s]
                groups[gi] = p if groups[gi] is None else groups[gi] + p
        # signed -> u32 via top-bit flip (== +2^31 mod 2^32)
        top = jnp.uint32(1 << 31)
        u01 = _u32(groups[0]) ^ top
        u2 = _u32(groups[1]) ^ top
        u34 = _u32(groups[2]) ^ top
        u56 = _u32(groups[3]) ^ top
        r01 = _fold30(u01, dl)                       # < 2^30 + 4d
        r2 = _shoup(u2, np.uint32(w2c), np.uint32(w2s), qs)     # < 2q
        r34 = _shoup(u34, np.uint32(w34c), np.uint32(w34s), qs)
        r56 = _shoup(u56, np.uint32(w56c), np.uint32(w56s), qs)
        t = _fold30(r2 + r34, dl)                    # sum < 2^32, ok
        t2 = _fold30(r56 + np.uint32(corr), dl)
        v = _fold30(t + t2 + r01, dl)                # < 2^30 + 2^23 < 2q
        if has_tw:
            bt = x_ref.shape[0]
            v3 = v.reshape(bt, rp, LANE)
            tw = tw_ref[:]
            tws = tws_ref[:]
            v = _shoup(v3, tw[None], tws[None], qs).reshape(-1, LANE)
        if canonical:
            v = jnp.where(v >= qs, v - qs, v)
            v = jnp.where(v >= qs, v - qs, v)
        o_ref[:] = v.astype(jnp.int32).reshape(x_ref.shape)

    return kernel


def _run_step(x3: jax.Array, step: _Step, q: int, delta: int,
              canonical: bool, interpret: bool) -> jax.Array:
    """x3 [B, r, m] int32 -> [B, r, m] int32 (mod-q matmul on last axis)."""
    b, r, m = x3.shape
    assert m == step.m and (step.tw is None or r == step.r), (x3.shape, step)
    n_flat = r * m
    bt = 32
    b_pad = -(-b // bt) * bt
    x2 = x3.reshape(b, n_flat)
    if b_pad != b:
        x2 = jnp.pad(x2, ((0, b_pad - b), (0, 0)))
    has_tw = step.tw is not None
    rp = r // step.pack          # packed rows per polynomial
    kern = _make_kernel(q, delta, has_tw, canonical, rp)
    tw = jnp.asarray(step.tw if has_tw else np.zeros((1, LANE), np.uint32))
    tws = jnp.asarray(
        step.tw_shoup if has_tw else np.zeros((1, LANE), np.uint32)
    )
    twr = tw.shape[0]
    # index-map constants must be i32: this module is imported after
    # crypto enables jax_enable_x64, so a bare Python `0` traces as i64
    # and Mosaic fails to legalize the (i32, i64) index tuple
    z = np.int32(0)
    out = pl.pallas_call(
        kern,
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, n_flat), lambda i: (i, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, LANE, LANE), lambda i: (z, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twr, LANE), lambda i: (z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twr, LANE), lambda i: (z, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, n_flat), lambda i: (i, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_flat), jnp.int32),
        interpret=interpret,
    )(x2, jnp.asarray(step.wd), tw, tws)
    return out[:b].reshape(b, r, m)


def ntt4_pallas(x: jax.Array, tb: PallasNTT4,
                interpret: bool = False) -> jax.Array:
    """Forward negacyclic NTT of [B, N] residues — four-step order output,
    canonical [0, q), exactly ntt_mxu.ntt4's convention."""
    bsz = x.shape[0]
    a = x.astype(jnp.int32).reshape(bsz, tb.n1, tb.n2)
    at = jnp.swapaxes(a, 1, 2)                       # [B, k2, k1]
    y = _run_step(at, tb.f_a, tb.q, tb.delta, False, interpret)
    yt = jnp.swapaxes(y, 1, 2)                       # [B, j1, k2]
    z = _run_step(yt, tb.f_b, tb.q, tb.delta, True, interpret)
    return z.reshape(bsz, tb.n)


def intt4_pallas(x: jax.Array, tb: PallasNTT4,
                 interpret: bool = False) -> jax.Array:
    """Inverse of ntt4_pallas (consumes four-step order, emits natural)."""
    bsz = x.shape[0]
    a = x.astype(jnp.int32).reshape(bsz, tb.n1, tb.n2)   # [B, j1, j2]
    y = _run_step(a, tb.g_a, tb.q, tb.delta, False, interpret)
    yt = jnp.swapaxes(y, 1, 2)                       # [B, k2, j1]
    z = _run_step(yt, tb.g_b, tb.q, tb.delta, True, interpret)
    return jnp.swapaxes(z, 1, 2).reshape(bsz, tb.n)
