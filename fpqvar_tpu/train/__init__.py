from fpqvar_tpu.train.trainer import (  # noqa: F401
    TrainState,
    cross_entropy_loss,
    lr_wd_schedule,
    make_train_state,
    train_step,
)
