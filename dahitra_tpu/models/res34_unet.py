"""xView2-winner ResNet34 UNets.

Parity targets:
  * Res34_Unet_Loc  — xBD_code/zoo/models.py:491-563: resnet34 encoder
    (standard strides), 5-level UNet decoder (filters 320/160/96/64/48) with
    nearest x2 upsamples and skip concats, 1x1 conv to 1 loc channel.
  * Res34_Unet_Double — xBD_code/zoo/models.py:565-646 (= models/networks.py
    :1360-1440, the LEVIR ``siamUnet`` key): the same trunk+decoder run on
    pre and post images with shared weights, decoded features concatenated,
    1x1 conv to 5 damage channels. Accepts either a single 6-channel tensor
    (xBD convention) or two 3-channel tensors (LEVIR convention).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dahitra_tpu.nn.blocks import ConvRelu, max_pool_3x3_s2, upsample_nearest
from dahitra_tpu.nn.resnet import ResNetTrunk

Dtype = Any

ENCODER_FILTERS = (64, 64, 128, 256, 512)
DECODER_FILTERS = (48, 64, 96, 160, 320)


class _Res34UnetCore(nn.Module):
    """Shared encoder+decoder returning the 48-channel full-res feature map."""

    dtype: Dtype = jnp.float32

    def setup(self):
        self.trunk = ResNetTrunk(backbone="resnet34",
                                 replace_stride_with_dilation=(False, False, False),
                                 dtype=self.dtype, name="resnet")
        d = DECODER_FILTERS
        e = ENCODER_FILTERS
        self.conv6 = ConvRelu(d[4], dtype=self.dtype, name="conv6")
        self.conv6_2 = ConvRelu(d[4], dtype=self.dtype, name="conv6_2")
        self.conv7 = ConvRelu(d[3], dtype=self.dtype, name="conv7")
        self.conv7_2 = ConvRelu(d[3], dtype=self.dtype, name="conv7_2")
        self.conv8 = ConvRelu(d[2], dtype=self.dtype, name="conv8")
        self.conv8_2 = ConvRelu(d[2], dtype=self.dtype, name="conv8_2")
        self.conv9 = ConvRelu(d[1], dtype=self.dtype, name="conv9")
        self.conv9_2 = ConvRelu(d[1], dtype=self.dtype, name="conv9_2")
        self.conv10 = ConvRelu(d[0], dtype=self.dtype, name="conv10")

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        enc1 = nn.relu(self.trunk.stem_preact(x, train))      # 1/2, 64
        enc2 = self.trunk.layer1(max_pool_3x3_s2(enc1), train)  # 1/4, 64
        enc3 = self.trunk.layer2(enc2, train)                  # 1/8, 128
        enc4 = self.trunk.layer3(enc3, train)                  # 1/16, 256
        enc5 = self.trunk.layer4(enc4, train)                  # 1/32, 512

        dec6 = self.conv6(upsample_nearest(enc5, 2))
        dec6 = self.conv6_2(jnp.concatenate([dec6, enc4], -1))
        dec7 = self.conv7(upsample_nearest(dec6, 2))
        dec7 = self.conv7_2(jnp.concatenate([dec7, enc3], -1))
        dec8 = self.conv8(upsample_nearest(dec7, 2))
        dec8 = self.conv8_2(jnp.concatenate([dec8, enc2], -1))
        dec9 = self.conv9(upsample_nearest(dec8, 2))
        dec9 = self.conv9_2(jnp.concatenate([dec9, enc1], -1))
        dec10 = self.conv10(upsample_nearest(dec9, 2))
        return dec10


class Res34UnetLoc(nn.Module):
    """Binary building-footprint localization head (1 logit channel)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dec10 = _Res34UnetCore(dtype=self.dtype, name="core")(x, train)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="res")(dec10)


class Res34UnetDouble(nn.Module):
    """Siamese damage classifier: shared core on both dates, concat, 1x1."""

    output_nc: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array = None,
                 train: bool = False) -> jax.Array:
        if x2 is None:
            x1, x2 = x1[..., :3], x1[..., 3:]
        core = _Res34UnetCore(dtype=self.dtype, name="core")
        d0 = core(x1, train)
        d1 = core(x2, train)
        x = jnp.concatenate([d0, d1], axis=-1)
        return nn.Conv(self.output_nc, (1, 1), dtype=self.dtype, name="res")(x)
