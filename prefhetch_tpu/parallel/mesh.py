"""Device mesh construction.

The reference has no multi-device compute at all (SURVEY.md §2.4) — its only
process boundary is the client↔server HTTP hop. Sharding the index across a
TPU pod slice is net-new capability: inverted lists and the base matrix are
partitioned over a 1-D ``lists`` mesh axis, queries are replicated, and
per-shard candidate results are combined with XLA collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


AXIS = "lists"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} "
                "(set --xla_force_host_platform_device_count for CPU testing)"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))
