from .batch_minor import resnet_eval_batch_minor
from .encoders import CNNEncoder, ResNetEncoder, create_model, param_count
from .resnet import BasicBlock, ResNetCore
from .unet import UNet
from .torch_import import (
    export_state_dict,
    import_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "CNNEncoder",
    "ResNetEncoder",
    "resnet_eval_batch_minor",
    "create_model",
    "param_count",
    "BasicBlock",
    "ResNetCore",
    "UNet",
    "import_state_dict",
    "export_state_dict",
    "load_torch_checkpoint",
]
