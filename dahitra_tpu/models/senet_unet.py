"""SE-backbone UNets from the xView2 first-place solution.

Parity targets (reference /root/reference/xBD_code/zoo):
  * senet.py:86-106  SEModule — global-avg squeeze/excite with sigmoid.
  * senet.py:241-268 SEResNeXtBottleneck — 1x1 -> grouped 3x3 (groups 32,
    base width 4) -> 1x1 x4, SE(reduction 16); se_resnext50_32x4d layers
    (3, 4, 6, 3), 7x7/s2 stem + 3x3/s2 maxpool.
  * senet.py:168-195 SEBottleneck (senet154) — 1x1 -> planes*2, grouped 3x3
    (groups 64) -> planes*4, 1x1; deep 3-conv stem to 128 channels,
    downsample kernel 3.
  * models.py:71-319 SeResNext50_Unet_Loc/Double — UNet decoder filters
    [32, 48, 64, 128, 256] over encoder [64, 256, 512, 1024, 2048].
  * models.py:648-802 SeNet154_Unet_Loc/Double — decoder [48, 64, 96, 160,
    320] over encoder [128, 256, 512, 1024, 2048].
  Double variants share the trunk over pre/post and concat decoded
  features before the 1x1 head (models.py:307-319).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dahitra_tpu.nn.blocks import (ConvRelu, max_pool_3x3_s2_ceil,
                                   upsample_nearest)

Dtype = Any


class SEModule(nn.Module):
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(c // self.reduction, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class SCSEModule(nn.Module):
    """Concat of channel-SE and spatial-SE gates (senet.py:107-130,
    concat=True doubles the channel count)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(c // self.reduction, (1, 1), dtype=self.dtype,
                            name="fc1")(s))
        s = nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(s))
        chn = x * s
        spa = x * nn.sigmoid(nn.Conv(1, (1, 1), dtype=self.dtype,
                                     name="spatial")(x))
        return jnp.concatenate([chn, spa], axis=-1)


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32, name=name)


class SEResNeXtBottleneck(nn.Module):
    planes: int
    groups: int = 32
    base_width: int = 4
    stride: int = 1
    downsample_kernel: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = (self.planes * self.base_width // 64) * self.groups
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(_bn(train, "bn1")(y))
        y = nn.Conv(width, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_bn(train, "bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = _bn(train, "bn3")(y)
        y = SEModule(dtype=self.dtype, name="se")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            k = self.downsample_kernel
            identity = nn.Conv(out_ch, (k, k), strides=self.stride,
                               padding=k // 2, use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            identity = _bn(train, "down_bn")(identity)
        return nn.relu(y + identity)


class SEBottleneck(nn.Module):
    """senet154 block (senet.py:168-195)."""

    planes: int
    groups: int = 64
    stride: int = 1
    downsample_kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(self.planes * 2, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(_bn(train, "bn1")(y))
        y = nn.Conv(self.planes * 4, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_bn(train, "bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = _bn(train, "bn3")(y)
        y = SEModule(dtype=self.dtype, name="se")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            k = self.downsample_kernel
            identity = nn.Conv(out_ch, (k, k), strides=self.stride,
                               padding=k // 2, use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            identity = _bn(train, "down_bn")(identity)
        return nn.relu(y + identity)


class _SEUnet(nn.Module):
    """Shared encoder+decoder core for both SE backbones (single compact)."""

    arch: str
    decoder_filters: Sequence[int]
    dtype: Dtype = jnp.float32

    def _block(self, planes, stride, name, down_k):
        if self.arch == "se_resnext50":
            return SEResNeXtBottleneck(planes, stride=stride,
                                       downsample_kernel=down_k,
                                       dtype=self.dtype, name=name)
        return SEBottleneck(planes, stride=stride, downsample_kernel=down_k,
                            dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        d = self.decoder_filters
        if self.arch == "se_resnext50":
            layers_cfg = ((64, 3), (128, 4), (256, 6), (512, 3))
            x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                        dtype=dt, name="stem_conv1")(x)
            x = nn.relu(_bn(train, "stem_bn1")(x))
        else:
            layers_cfg = ((64, 3), (128, 8), (256, 36), (512, 3))
            x = nn.Conv(64, (3, 3), strides=2, padding=1, use_bias=False,
                        dtype=dt, name="stem_conv1")(x)
            x = nn.relu(_bn(train, "stem_bn1")(x))
            x = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=dt,
                        name="stem_conv2")(x)
            x = nn.relu(_bn(train, "stem_bn2")(x))
            x = nn.Conv(128, (3, 3), padding=1, use_bias=False, dtype=dt,
                        name="stem_conv3")(x)
            x = nn.relu(_bn(train, "stem_bn3")(x))
        enc1 = x

        feats = []
        # senet pool is ceil-mode, pad-0 (zoo/senet.py:362-364)
        x = max_pool_3x3_s2_ceil(enc1)
        for idx, (planes, blocks) in enumerate(layers_cfg):
            stride = 1 if idx == 0 else 2
            # layer1 downsamples with a 1x1 regardless of arch
            # (senet.py:366-373 overrides downsample_kernel_size=1);
            # senet154's other layers use 3x3 (:475-478 default).
            down_k = 1 if (idx == 0 or self.arch == "se_resnext50") else 3
            for b in range(blocks):
                x = self._block(planes, stride if b == 0 else 1,
                                f"layer{idx + 1}_block{b}", down_k)(x, train)
            feats.append(x)
        enc2, enc3, enc4, enc5 = feats

        d6 = ConvRelu(d[4], dtype=dt, name="conv6")(upsample_nearest(enc5, 2))
        d6 = ConvRelu(d[4], dtype=dt, name="conv6_2")(
            jnp.concatenate([d6, enc4], -1))
        d7 = ConvRelu(d[3], dtype=dt, name="conv7")(upsample_nearest(d6, 2))
        d7 = ConvRelu(d[3], dtype=dt, name="conv7_2")(
            jnp.concatenate([d7, enc3], -1))
        d8 = ConvRelu(d[2], dtype=dt, name="conv8")(upsample_nearest(d7, 2))
        d8 = ConvRelu(d[2], dtype=dt, name="conv8_2")(
            jnp.concatenate([d8, enc2], -1))
        d9 = ConvRelu(d[1], dtype=dt, name="conv9")(upsample_nearest(d8, 2))
        d9 = ConvRelu(d[1], dtype=dt, name="conv9_2")(
            jnp.concatenate([d9, enc1], -1))
        return ConvRelu(d[0], dtype=dt, name="conv10")(upsample_nearest(d9, 2))


SE_RESNEXT_DEC = (32, 48, 64, 128, 256)   # models.py:76 (//2 of [64,96,...])
SENET154_DEC = (48, 64, 96, 160, 320)     # models.py:653


class SeResNext50UnetLoc(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d10 = _SEUnet("se_resnext50", SE_RESNEXT_DEC, self.dtype,
                      name="core")(x, train)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="res")(d10)


class SeResNext50UnetDouble(nn.Module):
    output_nc: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2=None, train: bool = False):
        if x2 is None:
            x1, x2 = x1[..., :3], x1[..., 3:]
        core = _SEUnet("se_resnext50", SE_RESNEXT_DEC, self.dtype, name="core")
        out = jnp.concatenate([core(x1, train), core(x2, train)], -1)
        return nn.Conv(self.output_nc, (1, 1), dtype=self.dtype, name="res")(out)


class SeNet154UnetLoc(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d10 = _SEUnet("senet154", SENET154_DEC, self.dtype, name="core")(x, train)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="res")(d10)


class SeNet154UnetDouble(nn.Module):
    output_nc: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2=None, train: bool = False):
        if x2 is None:
            x1, x2 = x1[..., :3], x1[..., 3:]
        core = _SEUnet("senet154", SENET154_DEC, self.dtype, name="core")
        out = jnp.concatenate([core(x1, train), core(x2, train)], -1)
        return nn.Conv(self.output_nc, (1, 1), dtype=self.dtype, name="res")(out)
