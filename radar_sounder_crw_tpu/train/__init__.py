from .crw_trainer import CRWTrainConfig, CRWTrainer, make_crw_train_step
from .checkpoint import CheckpointManager
from .unet_trainer import UNetTrainConfig, UNetTrainer
from .tune import run_asha, sample_configs

__all__ = [
    "CRWTrainConfig",
    "CRWTrainer",
    "make_crw_train_step",
    "CheckpointManager",
    "UNetTrainConfig",
    "UNetTrainer",
    "run_asha",
    "sample_configs",
]
