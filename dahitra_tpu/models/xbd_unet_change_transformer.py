"""xBD 6-channel UNet_Change_Transformer(_BiT) — the ensemble models used by
the test predictor (xBD_code/predict_test_cls.py:39-55).

Parity targets (reference /root/reference/xBD_code/zoo/models.py):
  * UNet_Change_Transformer (:1094-1226 — NB: that whole class sits inside
    a module-level triple-quoted string, i.e. dead code; the predictor even
    imports _BiT but instantiates UNet_Change_Transformer(), a NameError —
    predict_test_cls.py:21,41. Reconstructed here and oracle-tested by
    exec'ing the commented block): siamese resnet34 trunk on the split
    6-channel input; ReLU ChannelAttention fusion of the two dates at every
    skip level (the zoo copy swaps tanh for ReLU, :993-1003); plain UNet
    decoder (filters [48, 64, 96, 160, 320]) to 5 damage channels. Its
    bottleneck transformer is never called — conv-only at runtime.
  * UNet_Change_Transformer_BiT (:1228-1368): adds the ReLU-gated
    bottleneck channel attention per date, then a channel-token transformer
    (tokens = 512 channels, dim = (img/32)^2, depth 8, heads 4,
    dim_head = dim, mlp dim^2, :1277-1285) fused back via ChannelAttention;
    decoder filters [48, 64, 96, 128, 320].
  Quirk preserved: the finest skip is fused with ca_skip_2 rather than
  ca_skip_1 in both variants (:1205, :1352).
Forward parity for both variants: tests/test_oracle_parity.py.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dahitra_tpu.nn.blocks import ConvRelu, max_pool_3x3_s2, upsample_nearest
from dahitra_tpu.nn.resnet import ResNetTrunk
from dahitra_tpu.models.unet_change_transformer import (
    BottleneckChannelAttention, ChannelAttentionFuse, _ChannelTokenTransformer)

Dtype = Any

# Decoder widths differ between the variants' LOCAL decoder_filters:
# plain (zoo/models.py:1098) uses 160 at index 3, _BiT (:1235) uses 128.
DEC = (48, 64, 96, 160, 320)
DEC_BIT = (48, 64, 96, 128, 320)


class XBDUNetChangeTransformer(nn.Module):
    output_nc: int = 5
    img_size: int = 1024
    use_bit: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        self.trunk = ResNetTrunk(backbone="resnet34",
                                 replace_stride_with_dilation=(False, False, False),
                                 dtype=dt, name="resnet")
        self.ca_skip_5 = ChannelAttentionFuse(512, activation="relu",
                                              dtype=dt, name="ca_skip_5")
        self.ca_skip_4 = ChannelAttentionFuse(256, activation="relu",
                                              dtype=dt, name="ca_skip_4")
        self.ca_skip_3 = ChannelAttentionFuse(128, activation="relu",
                                              dtype=dt, name="ca_skip_3")
        self.ca_skip_2 = ChannelAttentionFuse(64, activation="relu",
                                              dtype=dt, name="ca_skip_2")
        if self.use_bit:
            self.ca_bottle_max = BottleneckChannelAttention(
                512, dtype=dt, name="ca_bottle_max")
            # zoo/models.py:1277-1285: Transformer(dim=64, depth=8, heads=4,
            # dim_head=64, mlp_dim=dim**2, dropout=0.05) — the hardcoded
            # dim 64 assumes 256px crops ((256/32)^2); we scale with
            # img_size and keep the rest.
            dim = (self.img_size // 32) ** 2
            self.transformer = _ChannelTokenTransformer(
                seq_dim=dim, depth=8, heads=4, dim_head=dim,
                mlp_dim=dim * dim, dropout=0.05, dtype=dt, name="transformer")
        dec = DEC_BIT if self.use_bit else DEC
        self.conv6 = ConvRelu(dec[4], dtype=dt, name="conv6")
        self.conv6_2 = ConvRelu(dec[4], dtype=dt, name="conv6_2")
        self.conv7 = ConvRelu(dec[3], dtype=dt, name="conv7")
        self.conv7_2 = ConvRelu(dec[3], dtype=dt, name="conv7_2")
        self.conv8 = ConvRelu(dec[2], dtype=dt, name="conv8")
        self.conv8_2 = ConvRelu(dec[2], dtype=dt, name="conv8_2")
        self.conv9 = ConvRelu(dec[1], dtype=dt, name="conv9")
        self.conv9_2 = ConvRelu(dec[1], dtype=dt, name="conv9_2")
        self.conv10 = ConvRelu(dec[0], dtype=dt, name="conv10")
        self.res = nn.Conv(self.output_nc, (1, 1), dtype=dt, name="res")

    def _encode(self, x, train):
        enc1 = nn.relu(self.trunk.stem_preact(x, train))
        enc2 = self.trunk.layer1(max_pool_3x3_s2(enc1), train)
        enc3 = self.trunk.layer2(enc2, train)
        enc4 = self.trunk.layer3(enc3, train)
        enc5 = self.trunk.layer4(enc4, train)
        return enc1, enc2, enc3, enc4, enc5

    def __call__(self, x6: jax.Array, x2=None, train: bool = False):
        if x2 is None:
            x_1, x_2 = x6[..., :3], x6[..., 3:]
        else:
            x_1, x_2 = x6, x2
        e1_1, e2_1, e3_1, e4_1, e5_1 = self._encode(x_1, train)
        e1_2, e2_2, e3_2, e4_2, e5_2 = self._encode(x_2, train)

        if self.use_bit:
            e5_1 = self.ca_bottle_max(e5_1) * e5_1
            e5_2 = self.ca_bottle_max(e5_2) * e5_2
            enc5 = self.ca_skip_5(e5_1, e5_2)
            enc5_t = self.transformer(enc5, not train)
            enc5 = self.ca_skip_5(enc5_t, enc5)
        else:
            enc5 = self.ca_skip_5(e5_1, e5_2)

        enc4 = self.ca_skip_4(e4_1, e4_2)
        d6 = self.conv6(upsample_nearest(enc5, 2))
        d6 = self.conv6_2(jnp.concatenate([d6, enc4], -1))
        enc3 = self.ca_skip_3(e3_1, e3_2)
        d7 = self.conv7(upsample_nearest(d6, 2))
        d7 = self.conv7_2(jnp.concatenate([d7, enc3], -1))
        enc2 = self.ca_skip_2(e2_1, e2_2)
        d8 = self.conv8(upsample_nearest(d7, 2))
        d8 = self.conv8_2(jnp.concatenate([d8, enc2], -1))
        enc1 = self.ca_skip_2(e1_1, e1_2)  # quirk: ca_skip_2 reused (:1205)
        d9 = self.conv9(upsample_nearest(d8, 2))
        d9 = self.conv9_2(jnp.concatenate([d9, enc1], -1))
        d10 = self.conv10(upsample_nearest(d9, 2))
        return self.res(d10)
