"""Multi-host (multi-process) wiring test: two local processes join via
jax.distributed.initialize over a loopback coordinator and run a psum over
a global dp mesh — validating the DCN-path plumbing that
scripts/evaluate.py --coordinator uses (SURVEY.md §2.9; the reference has
no distributed execution at all)."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4                    # 2 local x 2 processes

from fpqvar_tpu.config import MeshConfig
from fpqvar_tpu.parallel import make_mesh

mesh = make_mesh(MeshConfig(dp=2, tp=2))
# global psum over the full mesh: every process contributes its local
# shard; the reduction must see all 4 devices
x = jnp.ones((4, 8))
xs = jax.device_put(
    x, NamedSharding(mesh, P("dp", None)))        # rows over dp
total = jax.jit(lambda a: jnp.sum(a))(xs)
assert float(total) == 32.0, float(total)
print(f"proc{pid} ok", flush=True)
"""


def test_two_process_distributed_psum(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""       # never touch the TPU tunnel
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-2000:]}"
        assert f"proc{i} ok" in out
