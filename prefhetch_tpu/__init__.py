"""prefhetch_tpu — TPU-native privacy-preserving ANN search framework.

A from-scratch rebuild of the capabilities of PES-Innovation-Lab/PreFHEtch
(reference mounted read-only at /root/reference): a client/server
approximate-nearest-neighbor triage protocol in which the server hosts an
IVF(-PQ) index and the client drives a multi-round pipeline — centroid
download, client-side centroid ranking, server-side all-candidate coarse
scoring over client-chosen inverted lists, client-side candidate selection,
server-side exact re-rank, client-side top-K, and vector retrieval — such
that ALL ranking happens on the client and the server never learns which
candidates survive (reference: src/client/client.cpp:7-80,
src/server/server_lib.cpp:111-196).

The compute path is JAX/XLA/Pallas on TPU: distances are batched matmuls on
the MXU, the inverted-list candidate scan is a padded/masked gather kernel,
and the homomorphic-encryption layer (the reference's linked-but-unused SEAL
slot, CMakeLists.txt:33-38) is implemented for real as RNS-BFV/CKKS
polynomial arithmetic over integer limb tensors.

Subpackages
-----------
- ``data``     — fvecs/ivecs dataset IO, synthetic dataset generation
- ``models``   — index model families (Flat, IVF-Flat, IVF-PQ)
- ``ops``      — TPU kernels: distance matmuls, ADC scan, masked top-k, k-means
- ``index``    — index training/building (k-means, PQ codebooks) and storage
- ``crypto``   — RNS-BFV/CKKS homomorphic encryption (NTT, modular limb ops)
- ``engine``   — server-side query engine (index lifecycle + jitted services)
- ``serve``    — HTTP frontend exposing the reference's 4 routes
- ``client``   — client pipeline library (stages 1-9) and CLI driver
- ``parallel`` — device mesh / shard_map sharding of the index
- ``utils``    — config presets, timer, logging
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache() -> None:
    """Point XLA's persistent compilation cache at a repo-local directory.

    In this deployment XLA compiles remotely at 1-2 min/program; without the
    persistent cache EVERY process (server boot, bench run, client driver)
    re-pays that for each jitted program. Must run before the first
    compilation; importing this package anywhere does it. Override the
    location with PFH_JAX_CACHE_DIR; disable with PFH_JAX_CACHE_DIR=off."""
    import os

    loc = os.environ.get("PFH_JAX_CACHE_DIR")
    if loc == "off":
        return
    if not loc:
        parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if os.access(parent, os.W_OK):
            loc = os.path.join(parent, ".jax_cache")
        else:
            # site-packages installs can be read-only — cache writes would
            # fail silently at first compile; use a user-writable fallback
            loc = os.path.join(
                os.path.expanduser("~"), ".cache", "prefhetch_jax"
            )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization — never block import
        pass


def _apply_platform_override() -> None:
    """Honor PFH_PLATFORM (e.g. "cpu") for subprocess entry points.

    This sandbox's sitecustomize force-updates jax.config to the "axon" TPU
    platform at interpreter start, so JAX_PLATFORMS alone cannot put a
    spawned server/client process on CPU — the config must be re-updated
    after jax import. Tests that spawn real server processes set
    PFH_PLATFORM=cpu."""
    import os

    plat = os.environ.get("PFH_PLATFORM")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


def _disable_thp() -> None:
    """Opt this process out of transparent huge pages (PR_SET_THP_DISABLE).

    Measured on this deployment's VM (lazy-restore memory backing): FIRST
    touch of fresh anonymous memory faults 2 MB THP folios through
    folio_zero_user at ~6 MB/s, while 4 KB faults run ~70 MB/s — an 11×
    difference that turned 1M-scale dataset generation and index builds
    into tens of minutes of pure system time. Re-touch is full speed
    either way, so only first-touch cost changes. Inherited by fork/exec
    children (client farms, spawned servers). PFH_KEEP_THP=1 opts out."""
    import os

    if os.environ.get("PFH_KEEP_THP"):
        return
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        libc.prctl(41, 1, 0, 0, 0)   # PR_SET_THP_DISABLE = 41
    except Exception:  # an optimization — never block import
        pass


_disable_thp()
_enable_persistent_compile_cache()
_apply_platform_override()

from prefhetch_tpu.utils.config import (  # noqa: F401
    IndexParams,
    ProtocolParams,
    PipelineConfig,
    REFERENCE_PRESET,
    SIFT1M_PRESET,
)
