"""DPN92 UNets from the xView2 first-place solution.

Parity targets (reference /root/reference/xBD_code/zoo/models.py:395-489 and
the pretrainedmodels DPN it builds on):
  * DPN92: init block 7x7/s2 conv-BN-ReLU (64ch) + 3x3/s2 maxpool; 4 dual-
    path stages with k_sec (3, 4, 20, 3), inc (16, 32, 24, 128), residual
    widths bw (256, 512, 1024, 2048), grouped 3x3 (groups 32), R widths
    (96, 192, 384, 768); pre-activation BN-ReLU-Conv ordering. Stage output
    channels: 336 / 704 / 1552 / 2688 (residual bw + dense inc*(k_sec+2)).
  * Dpn92_Unet_Loc/Double (models.py:395-489): UNet decoder with SCSE
    (concat=True, channel-doubling) gates after every skip merge, decoder
    filters [32, 48, 64, 128, 256]; Double shares the core over pre/post and
    concats before the 1x1 head.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dahitra_tpu.nn.blocks import ConvRelu, max_pool_3x3_s2, upsample_nearest
from dahitra_tpu.models.senet_unet import SCSEModule

Dtype = Any

K_SEC = (3, 4, 20, 3)
INC = (16, 32, 24, 128)
BW = (256, 512, 1024, 2048)
R = (96, 192, 384, 768)
GROUPS = 32


def _bnact(x, train, name):
    x = nn.BatchNorm(use_running_average=not train, momentum=0.999,
                     epsilon=1e-3, dtype=jnp.float32, name=name)(x)
    return nn.relu(x)


class DualPathBlock(nn.Module):
    """Pre-activation dual-path block: residual (bw) + dense (inc) paths."""

    r: int
    bw: int
    inc: int
    block_type: str  # 'proj' | 'down' | 'normal'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, res_dense: Tuple[jax.Array, jax.Array],
                 train: bool = False):
        resid, dense = res_dense
        x_in = jnp.concatenate([resid, dense], -1) if dense is not None else resid
        stride = 2 if self.block_type == "down" else 1

        if self.block_type in ("proj", "down"):
            s = _bnact(x_in, train, "bn_w")
            s = nn.Conv(self.bw + 2 * self.inc, (1, 1), strides=stride,
                        use_bias=False, dtype=self.dtype, name="conv_w")(s)
            s_res, s_dense = s[..., :self.bw], s[..., self.bw:]
        else:
            s_res, s_dense = resid, dense

        y = _bnact(x_in, train, "bn_a")
        y = nn.Conv(self.r, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_a")(y)
        y = _bnact(y, train, "bn_b")
        y = nn.Conv(self.r, (3, 3), strides=stride, padding=1,
                    feature_group_count=GROUPS, use_bias=False,
                    dtype=self.dtype, name="conv_b")(y)
        y = _bnact(y, train, "bn_c")
        y = nn.Conv(self.bw + self.inc, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv_c")(y)

        resid_out = s_res + y[..., :self.bw]
        dense_out = jnp.concatenate([s_dense, y[..., self.bw:]], -1)
        return resid_out, dense_out


class DPN92Trunk(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """Returns (enc1..enc5) at 1/2 .. 1/32."""
        dt = self.dtype
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=dt, name="init_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.999,
                         epsilon=1e-3, dtype=jnp.float32, name="init_bn")(x)
        enc1 = nn.relu(x)                       # 1/2, 64
        x = max_pool_3x3_s2(enc1)               # 1/4

        feats = []
        state = (x, None)
        for stage in range(4):
            first = "proj" if stage == 0 else "down"
            state = DualPathBlock(R[stage], BW[stage], INC[stage], first,
                                  dtype=dt, name=f"s{stage}_b0")(state, train)
            for b in range(1, K_SEC[stage]):
                state = DualPathBlock(R[stage], BW[stage], INC[stage],
                                      "normal", dtype=dt,
                                      name=f"s{stage}_b{b}")(state, train)
            feats.append(jnp.concatenate(state, -1))
        enc2, enc3, enc4, enc5 = feats
        return enc1, enc2, enc3, enc4, enc5


DPN_DEC = (32, 48, 64, 128, 256)


class _DPNUnetCore(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        d = DPN_DEC
        enc1, enc2, enc3, enc4, enc5 = DPN92Trunk(dtype=dt, name="trunk")(
            x, train)
        # Each skip merge: ConvRelu then SCSE(concat) doubling channels
        # (models.py:402-409); the next up-conv consumes 2x channels.
        y = ConvRelu(d[4], dtype=dt, name="conv6")(upsample_nearest(enc5, 2))
        y = ConvRelu(d[4], dtype=dt, name="conv6_2")(
            jnp.concatenate([y, enc4], -1))
        y = SCSEModule(dtype=dt, name="scse6")(y)
        y = ConvRelu(d[3], dtype=dt, name="conv7")(upsample_nearest(y, 2))
        y = ConvRelu(d[3], dtype=dt, name="conv7_2")(
            jnp.concatenate([y, enc3], -1))
        y = SCSEModule(dtype=dt, name="scse7")(y)
        y = ConvRelu(d[2], dtype=dt, name="conv8")(upsample_nearest(y, 2))
        y = ConvRelu(d[2], dtype=dt, name="conv8_2")(
            jnp.concatenate([y, enc2], -1))
        y = SCSEModule(dtype=dt, name="scse8")(y)
        y = ConvRelu(d[1], dtype=dt, name="conv9")(upsample_nearest(y, 2))
        y = ConvRelu(d[1], dtype=dt, name="conv9_2")(
            jnp.concatenate([y, enc1], -1))
        y = SCSEModule(dtype=dt, name="scse9")(y)
        return ConvRelu(d[0], dtype=dt, name="conv10")(upsample_nearest(y, 2))


class Dpn92UnetLoc(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d10 = _DPNUnetCore(dtype=self.dtype, name="core")(x, train)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="res")(d10)


class Dpn92UnetDouble(nn.Module):
    output_nc: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2=None, train: bool = False):
        if x2 is None:
            x1, x2 = x1[..., :3], x1[..., 3:]
        core = _DPNUnetCore(dtype=self.dtype, name="core")
        out = jnp.concatenate([core(x1, train), core(x2, train)], -1)
        return nn.Conv(self.output_nc, (1, 1), dtype=self.dtype,
                       name="res")(out)
