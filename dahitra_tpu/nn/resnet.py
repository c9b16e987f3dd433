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

from dahitra_tpu.nn.blocks import _ConvParams, max_pool_3x3_s2

Dtype = Any

# Space-to-depth stem tap map: T[u, di, kr] = 1 iff full-res kernel row kr
# of the 7x7/s2/p3 stem conv lands on packed-kernel row u with input phase
# di. Output row i reads full rows 2i-3..2i+3 = 2(i-2+u)+di for u in 0..3,
# so kr = 2u+di-1 (kr=-1 at u=0,di=0 and kr=7 at u=3,di=1 are zero taps).
# numpy constant so it never captures a trace.
import numpy as _np  # noqa: E402

_STEM_TAPS = _np.zeros((4, 2, 7), _np.float32)
for _u in range(4):
    for _di in range(2):
        _kr = 2 * _u + _di - 1
        if 0 <= _kr < 7:
            _STEM_TAPS[_u, _di, _kr] = 1.0
del _u, _di, _kr


class PairBatchNorm(nn.Module):
    """BatchNorm whose ``pair=True`` mode treats the leading batch axis as
    TWO stacked groups [date1; date2] and reproduces EXACTLY what two
    sequential ``nn.BatchNorm`` train calls (one per date) would do:

      * each half is normalized by its own batch statistics, and
      * the running stats receive the composed sequential update
        ``ra'' = m*(m*ra + (1-m)*s1) + (1-m)*s2``.

    The CD references run their twin-date trunks as two separate module
    calls (networks.py:233-257, :1118-1138), which is per-date BN train
    semantics; this module keeps that exact math while letting the convs
    around it see one 2B-stacked batch (full MXU batch, half the kernel
    launches). ``pair=False`` is bit-equal to flax ``nn.BatchNorm``
    (asserted in tests/test_pair_bn.py). Variable names (params
    scale/bias, batch_stats mean/var) match nn.BatchNorm, so checkpoints
    and the torch importer are unchanged."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    # Output dtype. Statistics and the normalization arithmetic are ALWAYS
    # fp32; bfloat16 output halves the inter-block activation traffic and
    # is numerically identical for every consumer that casts to bf16
    # anyway (convs, pools — rounding commutes with max), differing only
    # in the residual-carry adds.
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool,
                 pair: bool = False) -> jax.Array:
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        xf = x.astype(jnp.float32)
        red = tuple(range(x.ndim - 1))
        m = self.momentum
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif pair:
            b2 = x.shape[0]
            xg = xf.reshape(2, b2 // 2, *x.shape[1:])
            gmean = jnp.mean(xg, axis=tuple(range(1, xg.ndim - 1)))  # (2, C)
            gmsq = jnp.mean(xg * xg, axis=tuple(range(1, xg.ndim - 1)))
            gvar = jnp.maximum(gmsq - gmean * gmean, 0.0)
            # per-half normalization
            mean = jnp.repeat(gmean, b2 // 2, axis=0).reshape(
                b2, *([1] * (x.ndim - 2)), c)
            var = jnp.repeat(gvar, b2 // 2, axis=0).reshape(
                b2, *([1] * (x.ndim - 2)), c)
            if not self.is_initializing():
                ra_mean.value = (m * (m * ra_mean.value + (1 - m) * gmean[0])
                                 + (1 - m) * gmean[1])
                ra_var.value = (m * (m * ra_var.value + (1 - m) * gvar[0])
                                + (1 - m) * gvar[1])
        else:
            mean = jnp.mean(xf, axis=red)
            msq = jnp.mean(xf * xf, axis=red)
            var = jnp.maximum(msq - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        # same op association as flax nn.BatchNorm._normalize:
        # mul = rsqrt(var+eps)*scale, y = (x-mean)*mul + bias
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        return ((xf - mean) * mul + bias).astype(self.dtype)


import os as _os

# Read once at import (per-trace env reads go stale under jit caching;
# see nn/blocks.py).
_BF16_TRUNK = _os.environ.get("DAHITRA_BF16_TRUNK", "1") != "0"


def _bn_out_dtype(dtype):
    """BN output dtype for the trunk: the conv compute dtype (bf16 halves
    inter-block traffic; fp32 models unchanged). DAHITRA_BF16_TRUNK=0
    (read at import) restores fp32 BN outputs everywhere."""
    return dtype if _BF16_TRUNK else jnp.float32


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 pair: bool = False) -> jax.Array:
        identity = x
        y = nn.Conv(self.filters, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = PairBatchNorm(dtype=_bn_out_dtype(self.dtype), name="bn1")(y, not train, pair)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = PairBatchNorm(dtype=_bn_out_dtype(self.dtype), name="bn2")(y, not train, pair)
        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = nn.Conv(self.filters, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            identity = PairBatchNorm(dtype=_bn_out_dtype(self.dtype), name="down_bn")(identity, not train, pair)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    filters: int  # base width; output channels = 4 * filters
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 pair: bool = False) -> jax.Array:
        identity = x
        out_ch = self.filters * 4
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = PairBatchNorm(dtype=_bn_out_dtype(self.dtype), name="bn1")(y, not train, pair)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = PairBatchNorm(dtype=_bn_out_dtype(self.dtype), name="bn2")(y, not train, pair)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = PairBatchNorm(dtype=_bn_out_dtype(self.dtype), name="bn3")(y, not train, pair)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            identity = PairBatchNorm(dtype=_bn_out_dtype(self.dtype), name="down_bn")(identity, not train, pair)
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
    def __call__(self, x: jax.Array, train: bool = False,
                 pair: bool = False) -> jax.Array:
        cls = BasicBlock if self.block == "basic" else Bottleneck
        for i in range(self.num_blocks):
            x = cls(self.filters, stride=self.stride if i == 0 else 1,
                    dtype=self.dtype, name=f"block{i}")(x, train, pair)
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
    # True enables the space-to-depth stem rewrite (A/B knob; see
    # _stem_conv). Parameter tree is identical either way. Default False:
    # measured train-neutral / eval-negative in the full model
    # (benchmarks/artifacts/stacked_ab.json).
    s2d_stem: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        block, sizes = _CONFIGS[self.backbone]
        rswd = self.replace_stride_with_dilation
        # Param holder with nn.Conv's exact {kernel} tree; the kernel is
        # applied either as the plain 7x7/s2 conv or as its space-to-depth
        # rewrite (see _stem_conv).
        self.conv1 = _ConvParams((7, 7, self.in_channels, 64),
                                 use_bias=False, name="conv1")
        self.bn1 = PairBatchNorm(dtype=_bn_out_dtype(self.dtype), name="bn1")
        self.layer1 = ResNetLayer(64, sizes[0], 1, block, self.dtype, name="layer1")
        self.layer2 = ResNetLayer(128, sizes[1], 1 if rswd[0] else 2, block,
                                  self.dtype, name="layer2")
        self.layer3 = ResNetLayer(256, sizes[2], 1 if rswd[1] else 2, block,
                                  self.dtype, name="layer3")
        self.layer4 = ResNetLayer(512, sizes[3], 1 if rswd[2] else 2, block,
                                  self.dtype, name="layer4")

    def _stem_conv(self, x: jax.Array) -> jax.Array:
        """The 7x7/s2/p3 stem conv, space-to-depth rewritten when the input
        dims are even: pack (H, W, C) -> (H/2, W/2, 4C) and convolve with
        the exactly-equivalent 4x4 packed kernel (entries are copies of the
        7x7 kernel per _STEM_TAPS, asymmetric pad (2,1)). TPU win: the
        3-channel full-res conv (3/128 contraction sublanes, and its wgrad
        is the slowest conv in the b64 profile) becomes a 12-channel
        half-res conv. Exact to reassociation (the packed kernel's zero
        taps add exact zeros)."""
        k, _ = self.conv1()
        h, w = x.shape[1], x.shape[2]
        dn = ("NHWC", "HWIO", "NHWC")
        if not self.s2d_stem or h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), k.astype(self.dtype), (2, 2),
                ((3, 3), (3, 3)), dimension_numbers=dn)
        b, c = x.shape[0], x.shape[-1]
        t = x.reshape(b, h // 2, 2, w // 2, 2, c)
        t = t.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        taps = jnp.asarray(_STEM_TAPS)
        k4 = jnp.einsum("udr,vet,rtio->uvdeio", taps, taps,
                        k.astype(jnp.float32))
        k4 = k4.reshape(4, 4, 4 * c, 64).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            t.astype(self.dtype), k4, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=dn)

    def stem_preact(self, x: jax.Array, train: bool = False,
                    pair: bool = False) -> jax.Array:
        """conv1 -> bn1, WITHOUT the ReLU (the DAHiTra trunk taps this —
        networks.py:1120-1123 maxpools the pre-ReLU bn1 output)."""
        return self.bn1(self._stem_conv(x), not train, pair)

    def stem(self, x: jax.Array, train: bool = False,
             pair: bool = False) -> jax.Array:
        """conv1 -> bn1 -> relu -> maxpool (standard torchvision stem)."""
        return max_pool_3x3_s2(nn.relu(self.stem_preact(x, train, pair)))

    def __call__(self, x: jax.Array, train: bool = False,
                 num_stages: int = 4, pair: bool = False) -> jax.Array:
        """Standard sequential forward through ``num_stages`` layers.

        ``pair=True`` (train only): x is the [date1; date2] batch-stacked
        tensor and every BatchNorm runs grouped per-date statistics — the
        exact math of two sequential per-date passes (see PairBatchNorm)."""
        x = self.stem(x, train, pair)
        for i, layer in enumerate((self.layer1, self.layer2, self.layer3,
                                   self.layer4)[:num_stages]):
            x = layer(x, train, pair)
        return x
