"""Multi-chip sharding dry run on the virtual 8-device CPU mesh.

Validates that the full prefill+decode step jit-compiles and executes under
real TP x DP shardings (parallel/mesh.py) — the same check the driver runs
via __graft_entry__.dryrun_multichip.
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[4]["token_ids"].shape[0]
