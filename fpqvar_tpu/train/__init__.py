from fpqvar_tpu.train.data import (  # noqa: F401
    dist_infinite_batches,
    eval_shard,
    infinite_batches,
)
try:
    # checkpoint/resume needs orbax (an optional extra: only scripts/train.py
    # persists state); the trainer itself must import without it
    from fpqvar_tpu.train.resume import (  # noqa: F401
        auto_resume,
        make_manager,
        save_train_state,
    )
except ModuleNotFoundError as e:  # pragma: no cover - env without orbax
    if not (e.name or "").startswith("orbax"):
        # anything OTHER than a missing orbax (a typo'd import inside
        # resume.py, an unrelated missing dep) must not be silently
        # swallowed — it would surface later as a misleading
        # "cannot import name auto_resume" in scripts/train.py
        raise
    import sys as _sys

    print("[warn] orbax not installed; checkpoint/resume disabled "
          "(fpqvar_tpu.train.resume unavailable)", file=_sys.stderr,
          flush=True)
from fpqvar_tpu.train.trainer import (  # noqa: F401
    TrainState,
    cross_entropy_loss,
    lr_wd_schedule,
    make_train_state,
    train_step,
)
