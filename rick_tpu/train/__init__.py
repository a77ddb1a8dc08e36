"""L5 training: losses, optimizer, Fisher-driven masks, jitted train step."""

from rick_tpu.train.losses import (
    d_logistic_loss,
    g_nonsaturating_loss,
)
from rick_tpu.train.state import TrainConfig, TrainState, init_train_state
from rick_tpu.train.steps import make_train_step, run_iteration, sample_images
from rick_tpu.train.fisher import fisher_round

__all__ = [
    "d_logistic_loss",
    "g_nonsaturating_loss",
    "TrainConfig",
    "TrainState",
    "init_train_state",
    "make_train_step",
    "run_iteration",
    "fisher_round",
    "sample_images",
]
