"""Siamese dilated-ResNet change-detection baseline (``base_resnet18``).

Parity target: reference models/networks.py:176-257 (class ResNet) —
shared-weight trunk on both dates, conv_pred to 32 channels, |A - B|
difference, x4 bilinear upsample, TwoLayerConv2d classifier.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dahitra_tpu.nn.blocks import TwoLayerConv, upsample_bilinear, upsample_nearest
from dahitra_tpu.nn.resnet import ResNetTrunk

Dtype = Any


class ResNetCD(nn.Module):
    output_nc: int = 2
    backbone: str = "resnet18"
    resnet_stages_num: int = 5
    if_upsample_2x: bool = True
    output_sigmoid: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.trunk = ResNetTrunk(backbone=self.backbone,
                                 replace_stride_with_dilation=(False, True, True),
                                 dtype=self.dtype, name="resnet")
        self.conv_pred = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                                 name="conv_pred")
        self.classifier = TwoLayerConv(self.output_nc, dtype=self.dtype,
                                       name="classifier")

    def forward_single(self, x: jax.Array, train: bool = False) -> jax.Array:
        """networks.py:233-257: stem, layer1-2, optional layer3/4, x2 up,
        conv_pred -> 32ch."""
        x = self.trunk.stem(x, train)
        x = self.trunk.layer1(x, train)
        x = self.trunk.layer2(x, train)
        if self.resnet_stages_num > 3:
            x = self.trunk.layer3(x, train)
        if self.resnet_stages_num == 5:
            x = self.trunk.layer4(x, train)
        if self.if_upsample_2x:
            x = upsample_nearest(x, 2)
        return self.conv_pred(x)

    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = False) -> jax.Array:
        f1 = self.forward_single(x1, train)
        f2 = self.forward_single(x2, train)
        x = jnp.abs(f1 - f2)
        if not self.if_upsample_2x:
            x = upsample_nearest(x, 2)
        x = upsample_bilinear(x, 4)
        x = self.classifier(x, train)
        if self.output_sigmoid:
            x = nn.sigmoid(x)
        return x
