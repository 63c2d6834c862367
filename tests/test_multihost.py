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


_EVAL_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax

coord, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)

from jax.experimental import multihost_utils

from fpqvar_tpu.config import QuantConfig, VARConfig, VQVAEConfig
from fpqvar_tpu.eval.pipeline import class_range_for_host, generate_eval_set
from fpqvar_tpu.models import VARGenerator, build_vae_var

TINY = VARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2), num_classes=6,
    vae=VQVAEConfig(vocab_size=32, z_channels=8, ch=16, ch_mult=(1, 2),
                    num_res_blocks=1, patch_nums=(1, 2)),
)
# every host builds the same model from the same seed (the stand-in for
# loading the same checkpoint)
vae_p, var_p = build_vae_var(jax.random.PRNGKey(0), TINY)
gen = VARGenerator(TINY, QuantConfig())
classes = class_range_for_host(TINY.num_classes, jax.process_index(),
                               jax.process_count())
generate_eval_set(gen, var_p, vae_p, out_dir, num_img_per_class=2,
                  classes=classes, log_every=1000)
multihost_utils.sync_global_devices("eval_done")
print(f"proc{pid} wrote classes {list(classes)}", flush=True)
"""


def test_two_process_class_partitioned_eval(tmp_path):
    """End-to-end multi-host eval (SURVEY.md §2.9 dp-across-hosts design):
    two jax.distributed processes each generate their class_range_for_host
    partition of a tiny eval set into a shared directory; together they
    must produce the complete PNG set, packable into one npz."""
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    out_dir = str(tmp_path / "samples")
    script = tmp_path / "eval_worker.py"
    script.write_text(_EVAL_WORKER)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, str(i), out_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-2000:]}"
    files = sorted(os.listdir(out_dir))
    assert len(files) == 6 * 2, files       # 6 classes x 2 images
    for ci in range(6):
        for j in range(2):
            assert f"class{ci}_img{j}.png" in files

    from fpqvar_tpu.eval.imaging import create_npz_from_sample_folder
    import numpy as np
    npz = create_npz_from_sample_folder(out_dir, expected=12)
    assert np.load(npz)["arr_0"].shape == (12, 4, 4, 3)
