"""Driver-contract tests: dryrun_multichip on the 8-device CPU mesh, and
entry() traceability (lowering only — full-size XLA compile happens on TPU)."""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_lowers():
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert "multi_accdoa" in str(lowered.out_info)


@pytest.mark.skipif(os.environ.get("GRAFT_FULL_DRYRUN") != "1",
                    reason="~25-30 min of XLA CPU compiles; run once per "
                           "round via GRAFT_FULL_DRYRUN=1 (see __graft_entry__"
                           ".dryrun_multichip_full)")
def test_dryrun_multichip_fullsize():
    import __graft_entry__ as g

    g.dryrun_multichip_full(8)
