"""Test configuration: force an 8-device virtual CPU mesh.

The shared suite runs TPU-less (the reference's CPU-runtime fallback,
cubecl-cpu/src/lib.rs:19 — SURVEY §4): kernels execute through the Pallas
interpreter and multi-chip sharding tests get 8 virtual devices.
"""

import os
import sys

# NOTE: the axon-tunnel re-exec guard lives in cubecl_tpu/testing.py,
# loaded via addopts before pytest capture starts (see pyproject.toml).

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           if "xla_force_host_platform_device_count"
                           in os.environ.get("XLA_FLAGS", "")
                           else os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("CUBECL_AUTOTUNE_CACHE", "false")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def client():
    from cubecl_tpu import CpuRuntime

    return CpuRuntime.client()


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(42)
