"""On-chip A/B of the four-step NTT: XLA int64 path vs Pallas Shoup kernel.

Asserts EXACT equality on the real TPU (interpret-mode tests cover CPU;
this is the only place the compiled Mosaic kernel itself is checked), then
times sustained loops synced via device_get of a small slice (the relay's
block_until_ready returns early — CLAUDE.md). Not part of the graded bench.

Usage: python benchmarks/profile_ntt.py  (env: PFH_NTT_N=8192 PFH_NTT_B=512)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from prefhetch_tpu.crypto.params import find_ntt_primes  # noqa: E402
from prefhetch_tpu.ops import ntt_mxu  # noqa: E402
from prefhetch_tpu.ops.ntt_pallas import (  # noqa: E402
    build_pallas_ntt4, intt4_pallas, ntt4_pallas,
)


def timeit(fn, x, n=30):
    out = fn(x)
    np.asarray(jax.device_get(out[:1, :8]))   # real sync, not block_until
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(out)                         # chain: no host roundtrips
    np.asarray(jax.device_get(out[:1, :8]))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    n = int(os.environ.get("PFH_NTT_N", 8192))
    b = int(os.environ.get("PFH_NTT_B", 512))
    q = find_ntt_primes(n, 30, 1)[0]
    tb = ntt_mxu.build_ntt4_tables(q, n)
    ptb = build_pallas_ntt4(q, n)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, q, (b, n), dtype=np.int64))
    x32 = x.astype(jnp.int32)

    os.environ["PFH_NTT_PALLAS"] = "0"        # force the XLA path
    xla_f = jax.jit(lambda v: ntt_mxu.ntt4(v, tb))
    pal_f = jax.jit(lambda v: ntt4_pallas(v.astype(jnp.int32), ptb)
                    .astype(jnp.int32))
    pal_i = jax.jit(lambda v: intt4_pallas(v.astype(jnp.int32), ptb)
                    .astype(jnp.int32))

    want = np.asarray(jax.device_get(xla_f(x))) % q
    got = np.asarray(jax.device_get(pal_f(x32)))
    np.testing.assert_array_equal(got, want)
    print(f"[ntt] exact-equal on chip: B={b} N={n} q={q}")
    back = np.asarray(jax.device_get(pal_i(pal_f(x32))))
    np.testing.assert_array_equal(back, np.asarray(x) % q)
    print("[ntt] roundtrip exact on chip")

    hbm_mb = b * n * 4 * 2 / 1e6
    t_xla = timeit(xla_f, x)
    t_pal = timeit(pal_f, x32)
    print(f"[ntt] xla   : {t_xla:8.3f} ms  ({hbm_mb * 2 / t_xla:6.1f} GB/s)")
    print(f"[ntt] pallas: {t_pal:8.3f} ms  ({hbm_mb / t_pal:6.1f} GB/s, "
          f"{t_xla / t_pal:.1f}x)")


if __name__ == "__main__":
    main()
