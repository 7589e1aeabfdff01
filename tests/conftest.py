"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the multichip
path). Must run before the first jax import in any test module.
"""

import os

# THP first-touch is ~11× slower than 4 KB faults on this VM (see
# prefhetch_tpu._disable_thp) — tests allocate fixture datasets constantly
try:
    import ctypes as _ctypes

    _ctypes.CDLL(None).prctl(41, 1, 0, 0, 0)  # PR_SET_THP_DISABLE
except Exception:
    pass

# The sandbox pre-sets JAX_PLATFORMS=axon (the real TPU) and its
# sitecustomize force-updates jax.config to "axon,cpu" at interpreter start,
# so the env var alone is not enough — override the config post-import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def small_dataset():
    """Small clustered dataset shared across integration tests."""
    from prefhetch_tpu.data.synthetic import make_clustered_dataset

    return make_clustered_dataset(
        nbase=2000, ntrain=4000, nquery=20, d=32, n_clusters=40, gt_k=100, seed=7
    )
