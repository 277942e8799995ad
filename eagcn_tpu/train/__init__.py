"""Training: jitted steps, losses, metrics, driver loop, checkpoints."""

from .checkpoint import CheckpointManager
from .loop import Experiment
from .losses import mse_loss, weighted_bce_loss
from .metrics import masked_multitask_auc, rmse, roc_auc
from .steps import make_eval_step, make_optimizer, make_train_step

__all__ = [
    "CheckpointManager", "Experiment", "mse_loss", "weighted_bce_loss",
    "masked_multitask_auc", "rmse", "roc_auc", "make_eval_step",
    "make_optimizer", "make_train_step",
]
