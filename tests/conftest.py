"""Test configuration: run everything on an 8-device virtual CPU mesh so
sharding/collective paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag wins.
jax.config.update("jax_platforms", "cpu")
# Golden-value tests compare against float64 scipy/torch references; the
# production default (bf16 MXU matmuls) is exercised separately on TPU.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    """Enforce @pytest.mark.timeout(seconds) via SIGALRM (pytest-timeout is
    not installed in this image; an unenforced mark is silently inert)."""
    import signal

    marker = item.get_closest_marker("timeout")
    if marker is None or not marker.args:
        return (yield)
    seconds = int(marker.args[0])

    def on_alarm(signum, frame):
        raise TimeoutError(
            f"{item.nodeid} exceeded its {seconds}s timeout mark")

    previous = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, previous)
