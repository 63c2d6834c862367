"""Continuous-batching server tests (tiny model, CPU)."""
import time

import jax
import pytest

from fpqvar_tpu.config import QuantConfig, VARConfig, VQVAEConfig
from fpqvar_tpu.models import VARGenerator, build_vae_var
from fpqvar_tpu.serving import GenerationServer

TINY = VARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2), num_classes=8,
    vae=VQVAEConfig(vocab_size=32, z_channels=8, ch=16, ch_mult=(1, 2),
                    num_res_blocks=1, patch_nums=(1, 2)),
)


@pytest.fixture(scope="module")
def server():
    vae_p, var_p = build_vae_var(jax.random.PRNGKey(0), TINY)
    gen = VARGenerator(TINY, QuantConfig())
    # warm the jit so batching timing is meaningful
    gen.generate(var_p, vae_p, jax.numpy.array([0, 1]), jax.random.PRNGKey(1))
    srv = GenerationServer(gen, var_p, vae_p, max_batch=4, max_wait_ms=100)
    yield srv
    srv.stop()


def test_single_request(server):
    img = server.submit(3, seed=1).result(timeout=60)
    assert img.shape == (3, 4, 4)
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_same_request_reproducible_across_batch_mixes(server):
    """A (label, seed) request must yield the same image regardless of what
    it is co-batched with (per-row key folding in serving._run)."""
    import numpy as np

    a1 = server.submit(3, seed=7).result(timeout=60)          # likely alone
    futs = [server.submit(i % 8, seed=100 + i) for i in range(3)]
    a2 = server.submit(3, seed=7).result(timeout=60)          # mixed batch
    for f in futs:
        f.result(timeout=60)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_requests_are_batched(server):
    before = server.stats()["batches"]
    futs = [server.submit(i % 8, seed=i) for i in range(4)]
    imgs = [f.result(timeout=60) for f in futs]
    assert all(im.shape == (3, 4, 4) for im in imgs)
    after = server.stats()
    # 4 requests arriving together should coalesce into few batches
    assert after["batches"] - before <= 2
    assert after["served"] >= 5


def test_pipelined_under_load_reproducible(server):
    """Under a sustained burst the worker dispatches batch N+1 before
    fetching batch N (depth-2 pipeline); results must still match the same
    request served alone, and the pipelined counter must advance."""
    import numpy as np

    alone = server.submit(5, seed=42).result(timeout=60)
    before = server.stats()
    futs = [server.submit(i % 8, seed=200 + i) for i in range(12)]
    futs.append(server.submit(5, seed=42))
    imgs = [f.result(timeout=120) for f in futs]
    assert all(im.shape == (3, 4, 4) for im in imgs)
    np.testing.assert_array_equal(np.asarray(imgs[-1]), np.asarray(alone))
    after = server.stats()
    assert after["served"] - before["served"] == 13
    # 13 requests / max_batch 4 -> >=4 batches; at least one pair must have
    # overlapped (the burst is fully enqueued before the first fetch)
    assert after["pipelined"] >= 1
