from dahitra_tpu.train.optim import (
    current_learning_rate,
    epoch_lr,
    make_optimizer,
    set_learning_rate,
)

__all__ = [
    "current_learning_rate",
    "epoch_lr",
    "make_optimizer",
    "set_learning_rate",
]
