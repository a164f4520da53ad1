"""Training library: states, steps, schedules, checkpoints, logging."""

from pwcnet_tpu.train_lib.checkpoint import (
    latest_checkpoint,
    restore_checkpoint_orbax,
    save_checkpoint_orbax,
    load_params,
    restore_checkpoint,
    save_checkpoint,
    save_params,
)
from pwcnet_tpu.train_lib.metrics import MetricsLogger
from pwcnet_tpu.train_lib.schedule import (
    DEFAULT_BOUNDARIES,
    make_lr,
    piecewise_halving,
)
from pwcnet_tpu.train_lib.step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_forward,
    make_loss_fn,
    make_train_step,
)

__all__ = [
    "latest_checkpoint",
    "load_params",
    "restore_checkpoint",
    "restore_checkpoint_orbax",
    "save_checkpoint",
    "save_checkpoint_orbax",
    "save_params",
    "MetricsLogger",
    "DEFAULT_BOUNDARIES",
    "make_lr",
    "piecewise_halving",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_forward",
    "make_loss_fn",
    "make_train_step",
]
