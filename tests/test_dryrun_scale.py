"""The driver's multichip dryrun at larger virtual mesh sizes.

``__graft_entry__.dryrun_multichip`` is validated by the harness at 8
devices; this exercises the same full sharded training step at 16 (a
``(data=8, model=2)`` mesh) in a subprocess with its own
``--xla_force_host_platform_device_count``, proving the sharding rules and
collectives are size-generic, not tuned to one mesh.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.timeout(600)
@pytest.mark.slow
def test_dryrun_16_virtual_devices():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.getcwd(), env.get("PYTHONPATH", "")])
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import __graft_entry__ as g; g.dryrun_multichip(16)"],
        capture_output=True, text=True, timeout=570, env=env,
        cwd=os.getcwd())
    assert out.returncode == 0, out.stderr[-2000:]
    assert "mesh={'data': 8, 'model': 2}" in out.stdout, out.stdout
    assert "OK" in out.stdout
