"""Guard the driver contract: entry() jits; dryrun_multichip runs."""

import numpy as np

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (4, 32, 3)  # root positions
    assert out[3].shape == (4, 32, g.NJOINTS, 2, 3)  # ltxy
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_dryrun_multichip_two_devices():
    import __graft_entry__ as g

    g.dryrun_multichip(2)
