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
except ModuleNotFoundError:  # pragma: no cover - env without orbax
    pass
from fpqvar_tpu.train.trainer import (  # noqa: F401
    TrainState,
    cross_entropy_loss,
    lr_wd_schedule,
    make_train_state,
    train_step,
)
