from .crw_trainer import CRWTrainConfig, CRWTrainer, make_crw_train_step
from .checkpoint import CheckpointManager

__all__ = [
    "CRWTrainConfig",
    "CRWTrainer",
    "make_crw_train_step",
    "CheckpointManager",
]
