"""Pins the driver entry points: single-chip forward compile and the full
sharded train step on the virtual 8-device mesh."""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[1]["dense"].shape[0]


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
