"""Driver entry points stay green: multi-chip dry run on the virtual mesh
and a trace-check of the flagship forward step."""

import jax
import pytest


@pytest.mark.slow   # the round driver runs this exact entry out-of-band
def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_traces():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    jax.jit(fn).lower(*args)  # trace + lower (compile exercised in dryrun)
