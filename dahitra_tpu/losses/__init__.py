from dahitra_tpu.losses.cd import (
    ce_dice,
    cross_entropy,
    dice_argmax,
    focal_loss,
    focal_loss_xbd,
    levir_train_loss,
    multi_cross_entropy,
)
from dahitra_tpu.losses.combo import (
    ComboLoss,
    focal_loss_2d,
    jaccard_loss,
    lovasz_hinge,
    lovasz_sigmoid,
    soft_dice_loss,
    stable_bce,
    xbd_damage_loss,
)

__all__ = [
    "ce_dice",
    "cross_entropy",
    "dice_argmax",
    "focal_loss",
    "focal_loss_xbd",
    "levir_train_loss",
    "multi_cross_entropy",
    "ComboLoss",
    "focal_loss_2d",
    "jaccard_loss",
    "lovasz_hinge",
    "lovasz_sigmoid",
    "soft_dice_loss",
    "stable_bce",
    "xbd_damage_loss",
]
