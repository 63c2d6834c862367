"""Rotation invariants (SURVEY.md §4(b)): orthogonality, block-equivalence,
and exactness of (xQ)(WQ)^T = xW^T."""
import pytest
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.ops import hadamard as H

pytestmark = pytest.mark.quick


def test_orthogonality():
    for n in (64, 128):
        q = H.random_hadamard_matrix(n, seed=42)
        np.testing.assert_allclose(q @ q.T, np.eye(n), atol=1e-10)


def test_signs_match_torch_rng():
    import torch

    torch.manual_seed(42)
    ref = (torch.randint(0, 2, (128,)) * 2 - 1).double().numpy()
    np.testing.assert_array_equal(H.torch_signs(128, 42), ref)


def test_block_matrix_structure():
    q = H.block_hadamard_matrix(512, 128, seed=42)
    qb = H.block_hadamard_block(128, seed=42)
    # diagonal blocks identical, off-diagonal zero
    for i in range(4):
        np.testing.assert_array_equal(
            q[i * 128:(i + 1) * 128, i * 128:(i + 1) * 128], qb)
    assert np.count_nonzero(q[:128, 128:]) == 0
    np.testing.assert_allclose(q @ q.T, np.eye(512), atol=1e-10)


def test_apply_block_hadamard_equals_dense():
    rng = np.random.default_rng(0)
    x = jnp.array(rng.normal(size=(3, 5, 512)).astype(np.float32))
    qb = H.block_hadamard_block(128, 42).astype(np.float32)
    qd = H.block_hadamard_matrix(512, 128, 42).astype(np.float32)
    fast = H.apply_block_hadamard(x, qb)
    dense = x @ qd
    np.testing.assert_allclose(np.asarray(fast), np.asarray(dense), atol=1e-4)


def test_rotation_matmul_invariance():
    # (x Q)(W Q)^T == x W^T  (rotation_utils.py offline weight rewrite +
    # online activation rotation identity)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(7, 256)).astype(np.float64)
    w = rng.normal(size=(96, 256)).astype(np.float64)
    q = H.block_hadamard_matrix(256, 128, 42)
    lhs = (x @ q) @ (w @ q).T
    np.testing.assert_allclose(lhs, x @ w.T, atol=1e-9)


def test_paley_hadamard_orders():
    """Non-power-of-2 Hadamard generation (replaces the reference's
    hard-coded had-K tables) for every order a VAR channel size needs."""
    from fpqvar_tpu.ops.hadamard import hadamard_matrix

    for n in (12, 20, 28, 36, 40, 52, 60, 108, 140, 1920, 2304):
        h = hadamard_matrix(n)
        np.testing.assert_allclose(h @ h.T, n * np.eye(n), atol=1e-9,
                                   err_msg=str(n))
        assert np.all(np.abs(np.abs(h) - 1.0) < 1e-12)


def test_full_size_random_hadamard_orthogonal():
    q = H.random_hadamard_matrix(1920, seed=42)
    np.testing.assert_allclose(q @ q.T, np.eye(1920), atol=1e-9)
