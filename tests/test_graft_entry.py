"""Driver-contract checks: entry() compiles; dryrun_multichip shards."""

import numpy as np
import pytest


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    out = jax.tree.map(np.asarray, out)
    assert out["boxes"].shape == (8, 64, 4)
    assert np.isfinite(out["conf"]).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any sharding/compile failure


@pytest.mark.slow
def test_dryrun_multiprocess_2x2():
    """2 real processes x 2 virtual devices: jax.distributed mesh, per-host
    batch feeding, replicated metrics agree across ranks."""
    import __graft_entry__ as g

    g._dryrun_multiprocess(n_processes=2, devices_per_process=2)
