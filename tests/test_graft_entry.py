"""Driver entry-point contract tests.

The driver compile-checks entry() single-chip and runs dryrun_multichip(N)
under xla_force_host_platform_device_count=N. Round 1's dryrun FAILED in
the driver because arrays dispatched to the TPU backend; this pins the
CPU-only contract (VERDICT.md round 1, next-round task 1).
"""
import sys

import jax
import pytest


sys.path.insert(0, "/root/repo")


@pytest.mark.slow
def test_dryrun_multichip_8_devices(capsys):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "8-device mesh OK" in out


@pytest.mark.slow
def test_dryrun_never_touches_non_cpu_backend():
    """After dryrun, the default backend must be cpu (the dryrun forces the
    platform itself; under the test harness it's already cpu)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)
    assert jax.default_backend() == "cpu"


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    for o in out:
        assert jax.numpy.isfinite(o).all()
