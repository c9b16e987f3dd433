from dahitra_tpu.models.bit import BIT
from dahitra_tpu.models.dahitra import DAHiTraUNet, TransDiffModule
from dahitra_tpu.models.registry import available_models, define_g
from dahitra_tpu.models.resnet_cd import ResNetCD

__all__ = [
    "BIT",
    "DAHiTraUNet",
    "TransDiffModule",
    "ResNetCD",
    "available_models",
    "define_g",
]
