"""ResNet trunk (torchvision-style), NHWC, stage-addressable.

Parity targets (reference /root/reference/models/resnet.py — the vendored
torchvision copy):
  * conv1 7x7 s2 p3 (no bias) -> BN -> ReLU -> maxpool 3x3 s2 p1.
  * BasicBlock: conv3x3(s)-BN-ReLU-conv3x3-BN (+1x1-conv-BN downsample when
    stride != 1 or channel change), residual add, ReLU.
  * Quirk preserved: the vendored BasicBlock silently resets dilation > 1
    back to 1 (resnet.py:45-46), so ``replace_stride_with_dilation`` merely
    removes the stride — layers 3/4 run at stride 1 WITHOUT dilation. The
    CD models' receptive fields depend on this.

The trunk exposes the stem and each layer separately because the CD models
drive them in nonstandard orders (extra maxpools, pre-ReLU taps — see
models/networks.py:233-257 and :1118-1138).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dahitra_tpu.nn.blocks import max_pool_3x3_s2

Dtype = Any


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        y = nn.Conv(self.filters, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = nn.Conv(self.filters, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=jnp.float32,
                                    name="down_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    filters: int  # base width; output channels = 4 * filters
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        out_ch = self.filters * 4
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=jnp.float32,
                                    name="down_bn")(identity)
        return nn.relu(y + identity)


_CONFIGS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
}


class ResNetLayer(nn.Module):
    """One torchvision ``layerN``: a stack of residual blocks."""

    filters: int
    num_blocks: int
    stride: int
    block: str = "basic"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cls = BasicBlock if self.block == "basic" else Bottleneck
        for i in range(self.num_blocks):
            x = cls(self.filters, stride=self.stride if i == 0 else 1,
                    dtype=self.dtype, name=f"block{i}")(x, train)
        return x


class ResNetTrunk(nn.Module):
    """Stage-addressable ResNet feature extractor.

    ``replace_stride_with_dilation[i]`` sets layer(i+2)'s stride to 1
    (matching the vendored torchvision quirk where BasicBlock drops the
    dilation — see module docstring).
    """

    backbone: str = "resnet18"
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (False, True, True)
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    def setup(self):
        block, sizes = _CONFIGS[self.backbone]
        rswd = self.replace_stride_with_dilation
        self.conv1 = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                             dtype=self.dtype, name="conv1")
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
                                name="bn1")
        self.layer1 = ResNetLayer(64, sizes[0], 1, block, self.dtype, name="layer1")
        self.layer2 = ResNetLayer(128, sizes[1], 1 if rswd[0] else 2, block,
                                  self.dtype, name="layer2")
        self.layer3 = ResNetLayer(256, sizes[2], 1 if rswd[1] else 2, block,
                                  self.dtype, name="layer3")
        self.layer4 = ResNetLayer(512, sizes[3], 1 if rswd[2] else 2, block,
                                  self.dtype, name="layer4")

    def stem_preact(self, x: jax.Array, train: bool = False) -> jax.Array:
        """conv1 -> bn1, WITHOUT the ReLU (the DAHiTra trunk taps this —
        networks.py:1120-1123 maxpools the pre-ReLU bn1 output)."""
        return self.bn1(self.conv1(x), use_running_average=not train)

    def stem(self, x: jax.Array, train: bool = False) -> jax.Array:
        """conv1 -> bn1 -> relu -> maxpool (standard torchvision stem)."""
        return max_pool_3x3_s2(nn.relu(self.stem_preact(x, train)))

    def __call__(self, x: jax.Array, train: bool = False,
                 num_stages: int = 4) -> jax.Array:
        """Standard sequential forward through ``num_stages`` layers."""
        x = self.stem(x, train)
        for i, layer in enumerate((self.layer1, self.layer2, self.layer3,
                                   self.layer4)[:num_stages]):
            x = layer(x, train)
        return x
