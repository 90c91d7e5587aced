"""Training runtime: scan-compiled trainer, losses, checkpointing."""

from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .losses import get_loss, mse_loss, relative_l2_loss
from .scalars import ScalarLogger, read_scalars
from .trainer import TrainConfig, Trainer, TrainResult, make_optimizer

__all__ = [
    "TrainConfig",
    "Trainer",
    "TrainResult",
    "make_optimizer",
    "get_loss",
    "mse_loss",
    "relative_l2_loss",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "ScalarLogger",
    "read_scalars",
]
