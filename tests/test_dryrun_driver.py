"""Invoke dryrun_multichip the way the driver does: a fresh interpreter whose
JAX sees FEWER devices than requested (round-1 failure mode, MULTICHIP_r01).
The entry point must self-provision virtual CPU devices."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation():
    env = dict(os.environ)
    # Simulate the bench rig: one device only, jax imported before the call.
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; assert len(jax.devices()) == 1, jax.devices();"
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "dryrun ok" in proc.stdout, proc.stdout
