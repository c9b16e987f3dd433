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

    def encode(self, x: jax.Array, train: bool):
        enc1 = nn.relu(self.trunk.stem_preact(x, train))      # 1/2, 64
        enc2 = self.trunk.layer1(max_pool_3x3_s2(enc1), train)  # 1/4, 64
        enc3 = self.trunk.layer2(enc2, train)                  # 1/8, 128
        enc4 = self.trunk.layer3(enc3, train)                  # 1/16, 256
        enc5 = self.trunk.layer4(enc4, train)                  # 1/32, 512
        return enc1, enc2, enc3, enc4, enc5

    def features(self, x: jax.Array, train: bool = False):
        """All per-level features (zoo/models.py:899-928 forward1)."""
        enc1, enc2, enc3, enc4, enc5 = self.encode(x, train)
        dec6 = self.conv6(upsample_nearest(enc5, 2))
        dec6 = self.conv6_2(jnp.concatenate([dec6, enc4], -1))
        dec7 = self.conv7(upsample_nearest(dec6, 2))
        dec7 = self.conv7_2(jnp.concatenate([dec7, enc3], -1))
        dec8 = self.conv8(upsample_nearest(dec7, 2))
        dec8 = self.conv8_2(jnp.concatenate([dec8, enc2], -1))
        dec9 = self.conv9(upsample_nearest(dec8, 2))
        dec9 = self.conv9_2(jnp.concatenate([dec9, enc1], -1))
        dec10 = self.conv10(upsample_nearest(dec9, 2))
        return (enc1, enc2, enc3, enc4, enc5, dec6, dec7, dec8, dec9, dec10)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.features(x, train)[-1]


class Res34UnetLoc(nn.Module):
    """Binary building-footprint localization head (1 logit channel)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dec10 = _Res34UnetCore(dtype=self.dtype, name="core")(x, train)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="res")(dec10)


class Res34UnetSingle(nn.Module):
    """Single-branch 5-class UNet (zoo/models.py:320-393): one resnet34
    encode/decode pass over a 3-channel image, 1x1 conv to 5 channels."""

    output_nc: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dec10 = _Res34UnetCore(dtype=self.dtype, name="core")(x, train)
        return nn.Conv(self.output_nc, (1, 1), dtype=self.dtype,
                       name="res")(dec10)


class Res34UnetDoubleModified(nn.Module):
    """Res34_Unet_Double_Modified (zoo/models.py:854-991): two per-date
    passes through the shared core collecting every level's features, then
    a THIRD fused pass — the trunk layers re-run on 1x1-fused (conv1d_N)
    concatenations of the fused stream with both dates' features at each
    encoder and decoder level; head = 1x1 conv on cat of the fused dec10
    with both dates' dec10s (3*48 channels)."""

    output_nc: int = 5
    dtype: Dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        self.core = _Res34UnetCore(dtype=dt, name="core")
        e = ENCODER_FILTERS
        d = DECODER_FILTERS
        self.conv1d_1 = nn.Conv(e[0], (1, 1), dtype=dt, name="conv1d_1")
        self.conv1d_2 = nn.Conv(e[1], (1, 1), dtype=dt, name="conv1d_2")
        self.conv1d_3 = nn.Conv(e[2], (1, 1), dtype=dt, name="conv1d_3")
        self.conv1d_4 = nn.Conv(e[3], (1, 1), dtype=dt, name="conv1d_4")
        self.conv1d_5 = nn.Conv(e[4], (1, 1), dtype=dt, name="conv1d_5")
        self.conv1d_6 = nn.Conv(d[4], (1, 1), dtype=dt, name="conv1d_6")
        self.conv1d_7 = nn.Conv(d[3], (1, 1), dtype=dt, name="conv1d_7")
        self.conv1d_8 = nn.Conv(d[2], (1, 1), dtype=dt, name="conv1d_8")
        self.conv1d_9 = nn.Conv(d[1], (1, 1), dtype=dt, name="conv1d_9")
        self.res = nn.Conv(self.output_nc, (1, 1), dtype=dt, name="res")

    def __call__(self, x1: jax.Array, x2: jax.Array = None,
                 train: bool = False) -> jax.Array:
        if x2 is None:
            x1, x2 = x1[..., :3], x1[..., 3:]
        f1 = self.core.features(x1, train)
        f2 = self.core.features(x2, train)
        (e1_1, e2_1, e3_1, e4_1, e5_1, d6_1, d7_1, d8_1, d9_1, d10_1) = f1
        (e1_2, e2_2, e3_2, e4_2, e5_2, d6_2, d7_2, d8_2, d9_2, d10_2) = f2

        c = self.core
        cat = jnp.concatenate
        enc1 = self.conv1d_1(cat([e1_1, e1_2], -1))
        enc2 = c.trunk.layer1(max_pool_3x3_s2(enc1), train)
        enc2 = self.conv1d_2(cat([enc2, e2_1, e2_2], -1))
        enc3 = self.conv1d_3(cat([c.trunk.layer2(enc2, train),
                                  e3_1, e3_2], -1))
        enc4 = self.conv1d_4(cat([c.trunk.layer3(enc3, train),
                                  e4_1, e4_2], -1))
        enc5 = self.conv1d_5(cat([c.trunk.layer4(enc4, train),
                                  e5_1, e5_2], -1))

        dec6 = c.conv6(upsample_nearest(enc5, 2))
        dec6 = c.conv6_2(cat([dec6, enc4], -1))
        dec6 = self.conv1d_6(cat([dec6, d6_1, d6_2], -1))
        dec7 = c.conv7(upsample_nearest(dec6, 2))
        dec7 = c.conv7_2(cat([dec7, enc3], -1))
        dec7 = self.conv1d_7(cat([dec7, d7_1, d7_2], -1))
        dec8 = c.conv8(upsample_nearest(dec7, 2))
        dec8 = c.conv8_2(cat([dec8, enc2], -1))
        dec8 = self.conv1d_8(cat([dec8, d8_1, d8_2], -1))
        dec9 = c.conv9(upsample_nearest(dec8, 2))
        dec9 = c.conv9_2(cat([dec9, enc1], -1))
        dec9 = self.conv1d_9(cat([dec9, d9_1, d9_2], -1))
        dec10 = c.conv10(upsample_nearest(dec9, 2))
        dec10 = cat([dec10, d10_1, d10_2], -1)
        return self.res(dec10)


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
