"""BIT — Bitemporal Image Transformer change detector.

Parity target: reference models/networks.py:260-392 (class BASE_Transformer).
ResNet features -> semantic tokenizer (4-8 tokens per date) -> one shared
transformer over the concatenated tokens of both dates (learned positional
embedding, shape (1, 2L, 32)) -> per-date cross-attention decoder projecting
tokens back onto pixels -> |f1 - f2| -> x4 bilinear upsample -> classifier.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dahitra_tpu.nn.blocks import (
    SemanticTokenizer,
    TransformerDecoder,
    TransformerEncoder,
    TwoLayerConv,
    upsample_bilinear,
    upsample_nearest,
)
from dahitra_tpu.nn.resnet import ResNetTrunk

Dtype = Any


class BIT(nn.Module):
    output_nc: int = 2
    token_len: int = 4
    resnet_stages_num: int = 4
    enc_depth: int = 1
    dec_depth: int = 1  # reference ctor default (networks.py:266)
    dim_head: int = 64
    decoder_dim_head: int = 64
    heads: int = 8
    backbone: str = "resnet18"
    with_pos: Optional[str] = "learned"
    with_decoder_pos: Optional[str] = None
    decoder_softmax: bool = True
    if_upsample_2x: bool = True
    token_trans: bool = True
    with_decoder: bool = True
    output_sigmoid: bool = False
    decoder_pos_size: int = 64  # 256 // 4 (networks.py:295)
    dtype: Dtype = jnp.float32

    DIM: int = 32  # feature/transformer width (networks.py:289)

    def setup(self):
        self.trunk = ResNetTrunk(backbone=self.backbone,
                                 replace_stride_with_dilation=(False, True, True),
                                 dtype=self.dtype, name="resnet")
        self.conv_pred = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                                 name="conv_pred")
        self.tokenizer = SemanticTokenizer(self.token_len, dtype=self.dtype,
                                           name="tokenizer")
        if self.with_pos == "learned":
            self.pos_embedding = self.param(
                "pos_embedding", nn.initializers.normal(1.0),
                (1, self.token_len * 2, self.DIM))
        if self.with_decoder_pos in ("learned", "fix"):
            self.pos_embedding_decoder = self.param(
                "pos_embedding_decoder", nn.initializers.normal(1.0),
                (1, self.decoder_pos_size, self.decoder_pos_size, self.DIM))
        self.transformer = TransformerEncoder(
            dim=self.DIM, depth=self.enc_depth, heads=self.heads,
            dim_head=self.dim_head, mlp_dim=2 * self.DIM, dtype=self.dtype,
            name="transformer")
        self.transformer_decoder = TransformerDecoder(
            dim=self.DIM, depth=self.dec_depth, heads=self.heads,
            dim_head=self.decoder_dim_head, mlp_dim=2 * self.DIM,
            softmax=self.decoder_softmax, dtype=self.dtype,
            name="transformer_decoder")
        self.classifier = TwoLayerConv(self.output_nc, dtype=self.dtype,
                                       name="classifier")

    def forward_single(self, x: jax.Array, train: bool) -> jax.Array:
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

    def _decode(self, x: jax.Array, tokens: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        if self.with_decoder_pos in ("learned", "fix"):
            x = x + self.pos_embedding_decoder
        seq = x.reshape(b, h * w, c)
        seq = self.transformer_decoder(seq, tokens)
        return seq.reshape(b, h, w, c)

    def __call__(self, x1: jax.Array, x2: jax.Array = None,
                 train: bool = False) -> jax.Array:
        if x2 is None:
            # xBD 6-channel convention (xBD_code/zoo/models.py:1549-1552).
            x1, x2 = x1[..., :3], x1[..., 3:]
        f1 = self.forward_single(x1, train)
        f2 = self.forward_single(x2, train)
        t1 = self.tokenizer(f1)
        t2 = self.tokenizer(f2)
        if self.token_trans:
            tokens = jnp.concatenate([t1, t2], axis=1)
            if self.with_pos == "learned":
                tokens = tokens + self.pos_embedding
            tokens = self.transformer(tokens)
            t1, t2 = jnp.split(tokens, 2, axis=1)
        if self.with_decoder:
            f1 = self._decode(f1, t1)
            f2 = self._decode(f2, t2)
        else:
            # Simple decoder: add the summed tokens to every pixel
            # (networks.py:349-356).
            f1 = f1 + jnp.sum(t1, axis=1)[:, None, None, :]
            f2 = f2 + jnp.sum(t2, axis=1)[:, None, None, :]
        x = jnp.abs(f1 - f2)
        if not self.if_upsample_2x:
            x = upsample_nearest(x, 2)
        x = upsample_bilinear(x, 4)
        x = self.classifier(x, train)
        if self.output_sigmoid:
            x = nn.sigmoid(x)
        return x
