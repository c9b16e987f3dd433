"""FC-Siam-conc — fully-convolutional siamese UNet with skip concatenation.

Parity target: models/networks.py:916-1082 (class SiamUnet_conc): 4 encoder
stages (16/32/64/128 channels, conv-BN-ReLU-dropout x2-3 + 2x2 maxpool),
shared weights across dates; decoder upconvs (transposed conv stride 2) and
transposed 3x3 "deconv" stacks consuming the concatenation of both dates'
skip features; LogSoftmax output (preserved — the reference's CE losses
apply log-softmax again on top, and we match its training numerics by
feeding these as the "logits").

Dropout2d(p=0.2) after every conv follows the reference; spatial dropout
(whole-channel) semantics are used, matching torch's Dropout2d.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dahitra_tpu.nn.blocks import max_pool_2x2

Dtype = Any


class _ConvBNDrop(nn.Module):
    filters: int
    transpose: bool = False
    dtype: Dtype = jnp.float32
    rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch ConvTranspose2d(k3, stride 1, padding 1) is spatially
        # equivalent to a 3x3 SAME conv (kernel flipped — a reparameterization
        # the optimizer absorbs), so both paths use nn.Conv.
        x = nn.Conv(self.filters, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        x = nn.relu(x)
        # Dropout2d: drop whole channels.
        x = nn.Dropout(self.rate, broadcast_dims=(1, 2),
                       deterministic=not train)(x)
        return x


class _UpConv(nn.Module):
    """torch ConvTranspose2d(k3, stride 2, padding 1, output_padding 1):
    exact x2 upsample."""

    filters: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # padding ((1,2),(1,2)) + transpose_kernel reproduces torch
        # ConvTranspose2d(k3, s2, p1, output_padding=1) exactly (verified
        # numerically against torch).
        return nn.ConvTranspose(self.filters, (3, 3), strides=(2, 2),
                                padding=((1, 2), (1, 2)), transpose_kernel=True,
                                dtype=self.dtype, name="upconv")(x)


class SiamUnetConc(nn.Module):
    input_nbr: int = 3
    label_nbr: int = 2
    dtype: Dtype = jnp.float32

    def encode(self, x, train):
        """Returns per-stage pre-pool features (stage 1, 2, 3, 4)."""
        skips = []
        x = self.enc11(x, train)
        x = self.enc12(x, train)
        skips.append(x)
        x = max_pool_2x2(x)
        x = self.enc21(x, train)
        x = self.enc22(x, train)
        skips.append(x)
        x = max_pool_2x2(x)
        x = self.enc31(x, train)
        x = self.enc32(x, train)
        x = self.enc33(x, train)
        skips.append(x)
        x = max_pool_2x2(x)
        x = self.enc41(x, train)
        x = self.enc42(x, train)
        x = self.enc43(x, train)
        skips.append(x)
        x = max_pool_2x2(x)
        return x, skips

    def setup(self):
        dt = self.dtype
        self.enc11 = _ConvBNDrop(16, dtype=dt)
        self.enc12 = _ConvBNDrop(16, dtype=dt)
        self.enc21 = _ConvBNDrop(32, dtype=dt)
        self.enc22 = _ConvBNDrop(32, dtype=dt)
        self.enc31 = _ConvBNDrop(64, dtype=dt)
        self.enc32 = _ConvBNDrop(64, dtype=dt)
        self.enc33 = _ConvBNDrop(64, dtype=dt)
        self.enc41 = _ConvBNDrop(128, dtype=dt)
        self.enc42 = _ConvBNDrop(128, dtype=dt)
        self.enc43 = _ConvBNDrop(128, dtype=dt)

        self.upconv4 = _UpConv(128, dtype=dt)
        self.dec43 = _ConvBNDrop(128, transpose=True, dtype=dt)
        self.dec42 = _ConvBNDrop(128, transpose=True, dtype=dt)
        self.dec41 = _ConvBNDrop(64, transpose=True, dtype=dt)
        self.upconv3 = _UpConv(64, dtype=dt)
        self.dec33 = _ConvBNDrop(64, transpose=True, dtype=dt)
        self.dec32 = _ConvBNDrop(64, transpose=True, dtype=dt)
        self.dec31 = _ConvBNDrop(32, transpose=True, dtype=dt)
        self.upconv2 = _UpConv(32, dtype=dt)
        self.dec22 = _ConvBNDrop(32, transpose=True, dtype=dt)
        self.dec21 = _ConvBNDrop(16, transpose=True, dtype=dt)
        self.upconv1 = _UpConv(16, dtype=dt)
        self.dec12 = _ConvBNDrop(16, transpose=True, dtype=dt)
        self.dec11 = nn.Conv(self.label_nbr, (3, 3), padding=1, dtype=dt)

    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = False):
        x4p_1, skips1 = self.encode(x1, train)
        x4p_2, skips2 = self.encode(x2, train)

        x = self.upconv4(x4p_2)
        x = jnp.concatenate([x, skips1[3], skips2[3]], -1)
        x = self.dec41(self.dec42(self.dec43(x, train), train), train)

        x = self.upconv3(x)
        x = jnp.concatenate([x, skips1[2], skips2[2]], -1)
        x = self.dec31(self.dec32(self.dec33(x, train), train), train)

        x = self.upconv2(x)
        x = jnp.concatenate([x, skips1[1], skips2[1]], -1)
        x = self.dec21(self.dec22(x, train), train)

        x = self.upconv1(x)
        x = jnp.concatenate([x, skips1[0], skips2[0]], -1)
        x = self.dec11(self.dec12(x, train))
        return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)
