"""Mask discriminator for the GAN trainer.

Parity target: xBD_code/zoo/model_transformer_encoding.py:454-463 — a 3x3
conv (5 -> 3 channels, NO padding) followed by a full resnet18 classifier
producing 1000 logits (the reference reuses the ImageNet head as the GAN
label space, judged against full ones/zeros tensors, train_GAN.py:87-88).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dahitra_tpu.nn.resnet import ResNetTrunk

Dtype = Any


class Discriminator(nn.Module):
    input_nc: int = 5
    num_logits: int = 1000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, masks: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(3, (3, 3), padding=0, dtype=self.dtype,
                    name="pre_process")(masks)
        trunk = ResNetTrunk(backbone="resnet18",
                            replace_stride_with_dilation=(False, False, False),
                            dtype=self.dtype, name="backbone")
        x = trunk(x, train, num_stages=4)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return nn.Dense(self.num_logits, dtype=self.dtype, name="fc")(x)
