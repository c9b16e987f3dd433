"""UNet + bottleneck-transformer change detectors.

Parity targets (reference /root/reference/models/networks.py):
  * UNet_Change_Transformer (:548-746, key ``unet_coupled_trans_256``):
    siamese resnet34 UNet; bottleneck channel attention
    (ChannelAttention_OnBottle 'max': 1x1-squeeze/excite on the global max,
    final ReLU not sigmoid — quirk preserved, :516-545) per date; tanh
    ChannelAttention fusion of the two dates (:419-431); a transformer over
    the fused bottleneck where TOKENS ARE CHANNELS (512 tokens of dim
    H*W = (img/32)^2, :694-698); decoder concatenating both dates' skips.
  * UNet_Change_Two_Transformer (:748-913, key
    ``unet_coupled_two_trans_256``): same trunk; bottleneck uses a spatial
    softmax gate on (enc5_1 - enc5_2) before the transformer (:842-852);
    a second transformer at 1/4 scale with dim (img/4)^2 (:879-889).
    Reference quirk NOT preserved: its forward calls self.ca_skip_2 which
    its __init__ comments out (:786-787 vs :879) — an AttributeError on
    every call. We define ca_skip_2 so the model actually runs; this is the
    minimal fix that keeps the written dataflow.

Decoder channel plan follows the reference's local ``decoder_filters``
[48, 64, 96, 128, 320] (:553 — not the self.decoder_filters attribute).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dahitra_tpu.nn.blocks import (ConvRelu, TransformerEncoder,
                                   max_pool_3x3_s2, upsample_nearest)
from dahitra_tpu.nn.resnet import ResNetTrunk

Dtype = Any

DEC = (48, 64, 96, 128, 320)


class ChannelAttentionFuse(nn.Module):
    """conv3x3(2C->C, no bias) + tanh (networks.py:419-431). The xBD zoo
    copy swaps tanh for ReLU ("changed tanh to relu",
    zoo/models.py:993-1003) — selected via ``activation``."""

    out_channels: int
    activation: str = "tanh"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        x = jnp.concatenate([a, b], axis=-1)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        return jnp.tanh(x) if self.activation == "tanh" else nn.relu(x)


class BottleneckChannelAttention(nn.Module):
    """Squeeze-excite on the global max with a final ReLU
    (networks.py:516-545, att_type='max')."""

    channels: int
    ratio: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        m = jnp.max(x, axis=(1, 2), keepdims=True)
        m = nn.Conv(self.channels // self.ratio, (1, 1), use_bias=False,
                    dtype=self.dtype, name="fc1")(m)
        m = nn.relu(m)
        m = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="fc2")(m)
        return nn.relu(m)


class _Encoder(nn.Module):
    """resnet34 stages as enc1..enc5 (networks.py:572-583)."""

    dtype: Dtype = jnp.float32

    def setup(self):
        self.trunk = ResNetTrunk(backbone="resnet34",
                                 replace_stride_with_dilation=(False, False, False),
                                 dtype=self.dtype, name="resnet")

    def __call__(self, x: jax.Array, train: bool = False):
        enc1 = nn.relu(self.trunk.stem_preact(x, train))       # 1/2, 64
        enc2 = self.trunk.layer1(max_pool_3x3_s2(enc1), train)   # 1/4, 64
        enc3 = self.trunk.layer2(enc2, train)                   # 1/8, 128
        enc4 = self.trunk.layer3(enc3, train)                   # 1/16, 256
        enc5 = self.trunk.layer4(enc4, train)                   # 1/32, 512
        return enc1, enc2, enc3, enc4, enc5


class _ChannelTokenTransformer(nn.Module):
    """Transformer over the channel axis: (B, H, W, C) -> tokens (B, C, H*W)."""

    seq_dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c).transpose(0, 2, 1)  # (B, C, HW)
        tokens = TransformerEncoder(dim=self.seq_dim, depth=self.depth,
                                    heads=self.heads, dim_head=self.dim_head,
                                    mlp_dim=self.mlp_dim, dropout=self.dropout,
                                    dtype=self.dtype, name="transformer")(
            tokens, deterministic)
        return tokens.transpose(0, 2, 1).reshape(b, h, w, c)


class UNetChangeTransformer(nn.Module):
    """``unet_coupled_trans_256`` (networks.py:548-746)."""

    output_nc: int = 2
    img_size: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        self.encoder = _Encoder(dtype=dt, name="encoder")
        self.ca_bottle_max = BottleneckChannelAttention(512, dtype=dt,
                                                        name="ca_bottle_max")
        self.ca_skip_5 = ChannelAttentionFuse(512, dtype=dt, name="ca_skip_5")
        dim = (self.img_size // 32) ** 2
        self.transformer = _ChannelTokenTransformer(
            seq_dim=dim, depth=3, heads=4, dim_head=64, mlp_dim=2 * dim,
            dropout=0.05, dtype=dt, name="transformer")
        self.conv6 = ConvRelu(DEC[4], dtype=dt, name="conv6")
        self.conv6_2 = ConvRelu(DEC[4], dtype=dt, name="conv6_2")
        self.conv7 = ConvRelu(DEC[3], dtype=dt, name="conv7")
        self.conv7_2 = ConvRelu(DEC[3], dtype=dt, name="conv7_2")
        self.conv8 = ConvRelu(DEC[2], dtype=dt, name="conv8")
        self.conv8_2 = ConvRelu(DEC[2], dtype=dt, name="conv8_2")
        self.conv9 = ConvRelu(DEC[1], dtype=dt, name="conv9")
        self.conv9_2 = ConvRelu(DEC[1], dtype=dt, name="conv9_2")
        self.conv10 = ConvRelu(DEC[0], dtype=dt, name="conv10")
        self.res = nn.Conv(self.output_nc, (1, 1), dtype=dt, name="res")

    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = False):
        det = not train
        e1_1, e2_1, e3_1, e4_1, e5_1 = self.encoder(x1, train)
        e1_2, e2_2, e3_2, e4_2, e5_2 = self.encoder(x2, train)

        e5_1 = self.ca_bottle_max(e5_1) * e5_1
        e5_2 = self.ca_bottle_max(e5_2) * e5_2
        enc5_c = self.ca_skip_5(e5_1, e5_2)
        enc5 = self.transformer(enc5_c, det)
        enc5 = self.ca_skip_5(enc5, enc5_c)

        d6 = self.conv6(upsample_nearest(enc5, 2))
        d6 = self.conv6_2(jnp.concatenate([d6, e4_1, e4_2], -1))
        d7 = self.conv7(upsample_nearest(d6, 2))
        d7 = self.conv7_2(jnp.concatenate([d7, e3_1, e3_2], -1))
        d8 = self.conv8(upsample_nearest(d7, 2))
        d8 = self.conv8_2(jnp.concatenate([d8, e2_1, e2_2], -1))
        d9 = self.conv9(upsample_nearest(d8, 2))
        d9 = self.conv9_2(jnp.concatenate([d9, e1_1, e1_2], -1))
        d10 = self.conv10(upsample_nearest(d9, 2))
        return self.res(d10)


class UNetChangeTwoTransformer(nn.Module):
    """``unet_coupled_two_trans_256`` (networks.py:748-913)."""

    output_nc: int = 2
    img_size: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        self.encoder = _Encoder(dtype=dt, name="encoder")
        self.ca_skip_5 = ChannelAttentionFuse(512, dtype=dt, name="ca_skip_5")
        self.ca_skip_2 = ChannelAttentionFuse(64, dtype=dt, name="ca_skip_2")
        dim5 = (self.img_size // 32) ** 2
        dim2 = (self.img_size // 4) ** 2
        self.transformer = _ChannelTokenTransformer(
            seq_dim=dim5, depth=3, heads=4, dim_head=64, mlp_dim=2 * 64,
            dropout=0.01, dtype=dt, name="transformer")
        self.transformer2 = _ChannelTokenTransformer(
            seq_dim=dim2, depth=2, heads=2, dim_head=64, mlp_dim=dim2,
            dropout=0.001, dtype=dt, name="transformer2")
        self.conv6 = ConvRelu(DEC[4], dtype=dt, name="conv6")
        self.conv6_2 = ConvRelu(DEC[4], dtype=dt, name="conv6_2")
        self.conv7 = ConvRelu(DEC[3], dtype=dt, name="conv7")
        self.conv7_2 = ConvRelu(DEC[3], dtype=dt, name="conv7_2")
        self.conv8 = ConvRelu(DEC[2], dtype=dt, name="conv8")
        self.conv8_2 = ConvRelu(DEC[2], dtype=dt, name="conv8_2")
        self.conv9 = ConvRelu(DEC[1], dtype=dt, name="conv9")
        self.conv9_2 = ConvRelu(DEC[1], dtype=dt, name="conv9_2")
        self.conv10 = ConvRelu(DEC[0], dtype=dt, name="conv10")
        self.res = nn.Conv(self.output_nc, (1, 1), dtype=dt, name="res")

    @staticmethod
    def _spatial_softmax_gate(fused: jax.Array, a: jax.Array,
                              b: jax.Array) -> jax.Array:
        """softmax over pixels of (a - b), elementwise-gating ``fused``
        (networks.py:846-850)."""
        bs, h, w, c = fused.shape
        diff = (a - b).reshape(bs, h * w, c).transpose(0, 2, 1)
        att = jax.nn.softmax(diff.astype(jnp.float32), axis=-1).astype(fused.dtype)
        tok = fused.reshape(bs, h * w, c).transpose(0, 2, 1)
        return (att * tok).transpose(0, 2, 1).reshape(bs, h, w, c)

    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = False):
        det = not train
        e1_1, e2_1, e3_1, e4_1, e5_1 = self.encoder(x1, train)
        e1_2, e2_2, e3_2, e4_2, e5_2 = self.encoder(x2, train)

        enc5 = self.ca_skip_5(e5_1, e5_2)
        enc5 = self._spatial_softmax_gate(enc5, e5_1, e5_2)
        enc5 = self.transformer(enc5, det)

        d6 = self.conv6(upsample_nearest(enc5, 2))
        d6 = self.conv6_2(jnp.concatenate([d6, e4_1, e4_2], -1))
        d7 = self.conv7(upsample_nearest(d6, 2))
        d7 = self.conv7_2(jnp.concatenate([d7, e3_1, e3_2], -1))

        enc2 = self.ca_skip_2(e2_1, e2_2)
        enc2 = self._spatial_softmax_gate(enc2, e2_1, e2_2)
        enc2 = self.transformer2(enc2, det)

        d8 = self.conv8(upsample_nearest(d7, 2))
        d8 = self.conv8_2(jnp.concatenate([d8, enc2], -1))
        d9 = self.conv9(upsample_nearest(d8, 2))
        d9 = self.conv9_2(jnp.concatenate([d9, e1_1, e1_2], -1))
        d10 = self.conv10(upsample_nearest(d9, 2))
        return self.res(d10)
