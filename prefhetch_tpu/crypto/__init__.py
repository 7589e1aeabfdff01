"""Homomorphic encryption subsystem.

The reference links Microsoft SEAL into both binaries but never calls it —
encryption is aspirational placeholders ("Replace std::vector<float> with the
corresponding Encrypted Vector type", reference: include/client/client_lib.h:14;
commented-out compute_encrypted_* declarations, client_lib.h:28-30;
CMakeLists.txt:33-38 links SEAL with zero call sites). This package fills
that hole for real:

- ``params``  — RLWE parameter sets (NTT-friendly RNS primes)
- ``ntt``     — negacyclic number-theoretic transform, batched over
                limbs/ciphertexts as JAX int ops
- ``bfv``     — RNS-BFV: keygen, encrypt, decrypt, ct+ct, ct×pt
- ``packing`` — coefficient-packing of candidate vectors so one ct×pt
                computes N/d inner products (encrypted L2 re-rank)
- ``ckks``    — RNS-CKKS approximate scheme (slot packing)

Client-side operations (keygen, encrypt, decrypt) run wherever the client
runs; the server-side hot path (ct×pt MACs over candidate blocks) is jitted
and batched for TPU.
"""

import jax

# Limb arithmetic runs in int64 lanes (products of 30-bit residues); jax
# defaults to 32-bit unless x64 is enabled. Enabling here is process-wide but
# benign: the search pipeline pins its dtypes (float32/int32) explicitly.
jax.config.update("jax_enable_x64", True)

from prefhetch_tpu.crypto.params import BFVParams, default_bfv_params  # noqa: F401,E402
from prefhetch_tpu.crypto.bfv import BFVContext, Ciphertext  # noqa: F401,E402
