"""The driver-facing entry points must keep working: entry() compile-checks
the flagship step, dryrun_multichip() validates the multi-chip sharding path
(BASELINE config #5: sharded 3-D 7-pt stencil + GMRES over a 2-D mesh).

The test process already runs on an 8-device virtual CPU mesh (conftest), so
dryrun_multichip(8) takes the in-process branch — the same code the driver's
subprocess bootstrap lands in.
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_mesh_shape_factoring():
    assert graft._mesh_shape_2d(8) == (4, 2)
    assert graft._mesh_shape_2d(4) == (2, 2)
    assert graft._mesh_shape_2d(2) == (2, 1)
    assert graft._mesh_shape_2d(1) == (1, 1)
    assert graft._mesh_shape_2d(6) == (3, 2)
    assert graft._mesh_shape_2d(7) == (7, 1)


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(np.asarray(out).sum()))


def test_dryrun_multichip_in_process():
    assert len(jax.devices()) >= 8, "conftest should force 8 virtual devices"
    graft.dryrun_multichip(8)  # raises on any failure
