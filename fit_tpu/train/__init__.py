"""Training: state, jitted steps, orchestration loop."""

from fit_tpu.train.loop import Trainer
from fit_tpu.train.state import TrainState, create_train_state, ema_update, make_optimizer
from fit_tpu.train.step import (
    diffusion_loss,
    make_eval_step,
    make_train_step,
    split_for_accumulation,
)

__all__ = [
    "Trainer",
    "TrainState",
    "create_train_state",
    "ema_update",
    "make_optimizer",
    "diffusion_loss",
    "make_eval_step",
    "make_train_step",
    "split_for_accumulation",
]
