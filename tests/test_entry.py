"""Driver-contract tests: __graft_entry__.entry() compiles and runs;
dryrun_multichip executes a full sharded training step on the virtual CPU
mesh (the driver runs the same functions)."""

import importlib
import sys

import numpy as np

import jax


def _entry_module():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__graft_entry__")


def test_entry_forward():
    ge = _entry_module()
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    ge = _entry_module()
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    ge = _entry_module()
    ge.dryrun_multichip(2)
