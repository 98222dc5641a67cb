"""pytest early-load plugin: sanitize the environment for the test suite.

Loaded via ``addopts = "-p cubecl_tpu.testing"`` (pyproject.toml) so this
module imports BEFORE pytest's capture manager redirects stdout — a
re-exec here keeps the original file descriptors.

Why: the axon TPU-tunnel sitecustomize (PYTHONPATH=/root/.axon_site)
registers a PJRT plugin and initializes jax at interpreter start, locking
the device count at 1 before any test code runs. The suite needs the
8-device virtual CPU mesh (tests/conftest.py), so when the tunnel is
active we re-exec once with it disabled.
"""

import os
import sys

# CUBECL_TEST_TPU=1: run the smoke subset on the REAL chip through the
# tunnel (round-2 verdict item 5) — no re-exec, no virtual CPU mesh
if not os.environ.get("CUBECL_TEST_TPU") and \
        os.environ.get("PALLAS_AXON_POOL_IPS") and \
        not os.environ.get("CUBECL_TEST_REEXEC"):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    env["CUBECL_TEST_REEXEC"] = "1"
    argv = list(getattr(sys, "orig_argv", [sys.executable] + sys.argv))
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, argv, env)
