"""Test harness config.

Two jobs:

1. Re-exec with a cleaned environment before anything imports jax.  The
   container's sitecustomize registers a remote-TPU PJRT plugin (axon) in
   every python process; the first jit then blocks claiming the single TPU
   grant — deadlocking CPU-only test runs if any other jax process is alive.
   Clearing PALLAS_AXON_POOL_IPS skips that registration entirely.
2. Force an 8-virtual-device CPU platform so sharding tests exercise real
   collectives without TPU hardware.
"""
import os
import sys

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("FPQVAR_TESTS_REEXEC") != "1"
):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["FPQVAR_TESTS_REEXEC"] = "1"
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
    )

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
