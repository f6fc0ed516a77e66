from cmcd_tpu.train.evaluate import evaluate
from cmcd_tpu.train.trainer import (
    TrainResult,
    create_optimizer,
    mfvi_pretrain,
    project,
    train,
)

__all__ = [
    "TrainResult",
    "create_optimizer",
    "evaluate",
    "mfvi_pretrain",
    "project",
    "train",
]
