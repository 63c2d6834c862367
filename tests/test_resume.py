"""Train-state checkpoint/auto-resume: an interrupted run restored from the
newest orbax step must continue bit-identically with an uninterrupted run
(the reference's `utils/misc.py:344` auto_resume contract)."""
import jax
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.config import VARConfig, VQVAEConfig
from fpqvar_tpu.models.var import init_var_params
from fpqvar_tpu.train import make_train_state, train_step
from fpqvar_tpu.train.resume import auto_resume, make_manager, save_train_state
from fpqvar_tpu.train.trainer import make_optimizer

TINY = VARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2), num_classes=4,
    vae=VQVAEConfig(vocab_size=32, z_channels=8, patch_nums=(1, 2)),
)


def _setup():
    params = init_var_params(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(peak_lr=3e-3)
    state = make_train_state(params, opt)
    rng = np.random.default_rng(0)
    batch = {
        "label": jnp.array([0, 1]),
        "x": jnp.asarray(rng.normal(size=(2, TINY.L - 1, 8)), jnp.float32),
        "targets": jnp.asarray(rng.integers(0, 32, (2, TINY.L)), jnp.int32),
    }
    step = jax.jit(lambda s, b: train_step(s, TINY, opt, b))
    return state, step, batch


def test_auto_resume_continues_bit_identically(tmp_path):
    state, step_fn, batch = _setup()

    # Uninterrupted 7-step run.
    ref, ref_losses = state, []
    for _ in range(7):
        ref, m = step_fn(ref, batch)
        ref_losses.append(float(m["loss"]))

    # Interrupted run: 5 steps, saving each; then "crash".
    mngr = make_manager(str(tmp_path / "run"), max_to_keep=2)
    info, state, start = auto_resume(mngr, state)
    assert start == 0 and "no ckpt" in info[0]
    for _ in range(5):
        state, _ = step_fn(state, batch)
        assert save_train_state(mngr, state)
    mngr.wait_until_finished()
    mngr.close()

    # Fresh process: resume from the newest step and finish the run.
    mngr2 = make_manager(str(tmp_path / "run"))
    fresh, _, _ = _setup()
    info, resumed, start = auto_resume(mngr2, fresh)
    assert start == 5 and "resume from step 5" in info[1]
    assert int(resumed.step) == 5
    losses = []
    for _ in range(start, 7):
        resumed, m = step_fn(resumed, batch)
        losses.append(float(m["loss"]))
    np.testing.assert_array_equal(losses, ref_losses[5:])
    jax.tree.map(
        np.testing.assert_array_equal,
        jax.device_get(resumed.params), jax.device_get(ref.params))
    mngr2.close()


def test_retention_keeps_only_newest(tmp_path):
    state, step_fn, batch = _setup()
    mngr = make_manager(str(tmp_path / "run"), max_to_keep=2)
    for _ in range(4):
        state, _ = step_fn(state, batch)
        save_train_state(mngr, state)
    mngr.wait_until_finished()
    assert sorted(mngr.all_steps()) == [3, 4]
    mngr.close()
