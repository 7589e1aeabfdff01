"""Driver-contract tests: entry() compiles and runs; dryrun_multichip
executes the full sharded train+query step on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    d, ids = np.asarray(out[0]), np.asarray(out[1])
    assert d.shape == ids.shape == (8, 32)
    assert np.isfinite(d).all()
    assert (np.diff(d, axis=1) >= -1e-3).all()      # ascending distances
    assert ids.min() >= 0


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally
