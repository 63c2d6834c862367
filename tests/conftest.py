"""Test harness config.

Three jobs, all before anything uses a jax backend:

1. Keep the suite off the remote TPU.  The container's sitecustomize
   registers a remote-TPU PJRT plugin (axon) at interpreter start in every
   python process; backend *initialization* (which claims the single TPU
   grant and would deadlock CPU-only test runs if any other jax process is
   alive) is lazy, so forcing ``jax_platforms=cpu`` here — before any
   device use — keeps the registered plugin dormant.  (An earlier version
   re-exec'd pytest with a cleaned env instead; that silently ate all
   pytest output, because the execve ran while pytest's fd-level capture
   had a deleted tempfile dup2'ed over fd 1, and the re-exec'd process
   inherited it.)
2. Clean the env for subprocess-spawning tests (test_multihost) so child
   interpreters skip the axon registration entirely and come up as CPU.
3. Force an 8-virtual-device CPU platform so sharding tests exercise real
   collectives without TPU hardware.
"""
import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""   # children: skip axon registration
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
