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


def test_dryrun_driver_context_backend_already_initialized(tmp_path):
    """Regression for the MULTICHIP_r03 red: the driver's process had jax
    ALREADY initialized on a 1-device backend while the environment claimed
    cpu-8 (env mutation after backend init is a no-op). dryrun_multichip must
    detect the live backend state and route through the --virtual re-exec
    instead of asserting on the 1-device in-process backend."""
    import subprocess

    script = tmp_path / "driver_sim.py"
    script.write_text(
        "import os, sys\n"
        "sys.path.insert(0, %r)\n"
        # pin to ONE cpu device and initialize the backend, like the driver's
        # process (which is live on axon with 1 device)
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "os.environ['XLA_FLAGS'] = "
        "'--xla_force_host_platform_device_count=1'\n"
        "import jax\n"
        "assert len(jax.devices()) == 1\n"
        # now the env claims an 8-device cpu backend — a lie, init happened
        "os.environ['XLA_FLAGS'] = "
        "'--xla_force_host_platform_device_count=8'\n"
        "import __graft_entry__ as g\n"
        "assert g._live_device_count() == 1, g._live_device_count()\n"
        "g.dryrun_multichip(8)\n"
        "print('DRIVER_SIM_OK')\n" % os.path.join(
            os.path.dirname(__file__), ".."))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTEST_CURRENT_TEST")}
    proc = subprocess.run([sys.executable, str(script)], env=env,
                          capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DRIVER_SIM_OK" in proc.stdout
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_dryrun_device_shortfall_falls_back_to_reexec(monkeypatch):
    """Belt-and-braces path: even if the cpu-ready decision is wrong and the
    in-process run raises _DeviceShortfall, dryrun_multichip must fall back
    to the re-exec path rather than propagate."""
    import __graft_entry__ as g

    calls = {}

    def fake_impl(n):
        raise g._DeviceShortfall("need 8, have 1")

    def fake_reexec(n):
        calls["reexec"] = n

    monkeypatch.setattr(g, "_dryrun_impl", fake_impl)
    monkeypatch.setattr(g, "_reexec_virtual", fake_reexec)
    g.dryrun_multichip(8)
    assert calls == {"reexec": 8}


@pytest.mark.skipif(os.environ.get("GRAFT_FULL_DRYRUN") != "1",
                    reason="~25-30 min of XLA CPU compiles; run once per "
                           "round via GRAFT_FULL_DRYRUN=1 (see __graft_entry__"
                           ".dryrun_multichip_full)")
def test_dryrun_multichip_fullsize():
    import __graft_entry__ as g

    g.dryrun_multichip_full(8)
