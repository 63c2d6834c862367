"""Train-state checkpointing and auto-resume (orbax).

The reference's trainer resumes from the newest ``ckpt*.pth`` in the run
directory (`utils/misc.py:340-357`: glob latest-modified, torch.load,
return (epoch, iter, trainer_state)).  The TPU-native equivalent is an
orbax ``CheckpointManager``: step-indexed directories instead of mtime
globbing, async saves that overlap the next step's compute, retention
(``max_to_keep``), and sharded-array aware restore — a state restored onto
a ``Mesh`` keeps its shardings, so resume works unchanged under dp/tp
(`fpqvar_tpu/parallel/mesh.py`).

Usage::

    mngr = make_manager(run_dir, max_to_keep=3)
    info, state, start_step = auto_resume(mngr, state)   # state: template
    for step in range(start_step, max_steps):
        state, metrics = train_step(...)
        save_train_state(mngr, state)                    # async, rate-limited
    mngr.wait_until_finished()
"""
from __future__ import annotations

import os
from typing import Any, List, Tuple

import jax
import orbax.checkpoint as ocp


def make_manager(
    directory: str,
    max_to_keep: int = 3,
    save_interval_steps: int = 1,
    async_save: bool = True,
) -> ocp.CheckpointManager:
    """A step-indexed checkpoint manager rooted at ``directory``.

    ``save_interval_steps`` rate-limits saves the way the reference saves
    once per epoch; ``max_to_keep`` bounds disk the way the reference's
    single rolling ``ckpt-last.pth`` does (but keeps history).
    """
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=async_save,
        ),
    )


def save_train_state(mngr: ocp.CheckpointManager, state: Any) -> bool:
    """Save ``state`` under its own ``state.step``.  Returns False when the
    manager's save-interval policy skips this step.  Async by default —
    returns as soon as the on-device arrays are snapshotted."""
    step = int(jax.device_get(state.step))
    return mngr.save(step, args=ocp.args.StandardSave(state))


def auto_resume(
    mngr: ocp.CheckpointManager, template: Any
) -> Tuple[List[str], Any, int]:
    """Restore the newest checkpoint, or pass ``template`` through.

    Mirrors the reference's return shape (`utils/misc.py:344`: info lines +
    resume point + state).  ``template`` supplies the pytree structure,
    dtypes, and shardings: each leaf is mapped to its abstract
    shape/dtype/sharding, so the restored arrays land directly on the same
    devices/mesh as the template (no host round-trip re-shard).
    """
    step = mngr.latest_step()
    if step is None:
        return (
            [f"[auto_resume] no ckpt found @ {mngr.directory}",
             "[auto_resume quit]"],
            template,
            0,
        )
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    state = mngr.restore(step, args=ocp.args.StandardRestore(abstract))
    return (
        [f"[auto_resume] load ckpt from @ {mngr.directory}/{step} ...",
         f"[auto_resume success] resume from step {step}"],
        state,
        step,
    )
