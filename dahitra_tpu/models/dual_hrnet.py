"""Dual-HRNet — the xView2-baseline two-stream HRNet-W32.

Parity target: xBD_code/dual_hrnet.py (+ dual_hrnet_config.yaml). Two
HRNet-W32 streams — localization on the pre image, classification on the
post image — with per-stage cross-stream fusion: after each stage's
transition, both streams' branch features are concatenated and projected
back per stream by 1x1 conv+BN+ReLU fuse layers (dual_hrnet.py:609-622,
:716-754). Split heads: loc 2 classes, cls 4 classes (:560-562).

HRNet-W32 structure (yaml): stem 2x(3x3/s2 conv-BN) -> 1/4; stage1 = 4
Bottlenecks (64->256); stage2 2 branches [32, 64] x1 module; stage3 3
branches [32, 64, 128] x4 modules; stage4 4 branches [32, 64, 128, 256] x3
modules; each module = 4 BasicBlocks per branch + all-to-all fusion
(1x1+BN+bilinear up for coarser->finer, chained 3x3/s2+BN(+ReLU) for
finer->coarser, dual_hrnet.py:241-314).

Quirk preserved: DualHRNet's own stem runs conv1-bn1-conv2-relu-bn2-relu —
NO ReLU after bn1 (dual_hrnet.py:662-672), unlike the single-stream
HighResolutionNet.forward.

BN momentum is 0.01 (dual_hrnet.py:25) -> flax momentum 0.99.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

BN_MOM = 0.99  # torch momentum 0.01

STAGE2_CH = (32, 64)
STAGE3_CH = (32, 64, 128)
STAGE4_CH = (32, 64, 128, 256)
STAGE3_MODULES = 4
STAGE4_MODULES = 3
BLOCKS_PER_BRANCH = 4


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOM,
                        epsilon=1e-5, dtype=jnp.float32, name=name)


def _resize_bilinear(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")


class HRBasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.filters, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _bn(train, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _bn(train, "bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = nn.Conv(self.filters, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            identity = _bn(train, "down_bn")(identity)
        return nn.relu(y + identity)


class HRBottleneck(nn.Module):
    filters: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out_ch = self.filters * 4
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(_bn(train, "bn1")(y))
        y = nn.Conv(self.filters, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_bn(train, "bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = _bn(train, "bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            identity = _bn(train, "down_bn")(identity)
        return nn.relu(y + identity)


class HRModule(nn.Module):
    """Parallel branches + all-to-all fusion (dual_hrnet.py:170-314)."""

    channels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jax.Array], train: bool = False) -> List[jax.Array]:
        n = len(self.channels)
        ys = []
        for i, x in enumerate(xs):
            for b in range(BLOCKS_PER_BRANCH):
                x = HRBasicBlock(self.channels[i], dtype=self.dtype,
                                 name=f"branch{i}_block{b}")(x, train)
            ys.append(x)
        if n == 1:
            return ys

        fused = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    t = ys[j]
                elif j > i:
                    # coarser -> finer: 1x1 conv + BN, bilinear upsample.
                    t = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"fuse{i}_{j}_conv")(ys[j])
                    t = _bn(train, f"fuse{i}_{j}_bn")(t)
                    t = _resize_bilinear(t, ys[i].shape[1], ys[i].shape[2])
                else:
                    # finer -> coarser: chain of 3x3/s2 conv+BN(+ReLU).
                    t = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        t = nn.Conv(ch, (3, 3), strides=2, padding=1,
                                    use_bias=False, dtype=self.dtype,
                                    name=f"fuse{i}_{j}_conv{k}")(t)
                        t = _bn(train, f"fuse{i}_{j}_bn{k}")(t)
                        if not last:
                            t = nn.relu(t)
                acc = t if acc is None else acc + t
            fused.append(nn.relu(acc))
        return fused


class Transition(nn.Module):
    """New-branch creation / channel adaptation (dual_hrnet.py:406-440)."""

    pre_channels: Sequence[int]
    cur_channels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jax.Array], train: bool = False) -> List[jax.Array]:
        out = []
        n_pre = len(self.pre_channels)
        for i, ch in enumerate(self.cur_channels):
            if i < n_pre:
                if ch != self.pre_channels[i]:
                    t = nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                                dtype=self.dtype, name=f"trans{i}_conv")(xs[i])
                    t = nn.relu(_bn(train, f"trans{i}_bn")(t))
                    out.append(t)
                else:
                    out.append(xs[i])
            else:
                t = xs[-1]
                for j in range(i + 1 - n_pre):
                    last = j == i - n_pre
                    och = ch if last else self.pre_channels[-1]
                    t = nn.Conv(och, (3, 3), strides=2, padding=1,
                                use_bias=False, dtype=self.dtype,
                                name=f"trans{i}_conv{j}")(t)
                    t = nn.relu(_bn(train, f"trans{i}_bn{j}")(t))
                out.append(t)
        return out


class HRNetStream(nn.Module):
    """One HRNet-W32 stream, stage-addressable for cross-stream fusion."""

    n_classes: int
    dtype: Dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        self.conv1 = nn.Conv(64, (3, 3), strides=2, padding=1, use_bias=False,
                             dtype=dt, name="conv1")
        self.bn1 = nn.BatchNorm(momentum=BN_MOM, epsilon=1e-5,
                                dtype=jnp.float32, name="bn1")
        self.conv2 = nn.Conv(64, (3, 3), strides=2, padding=1, use_bias=False,
                             dtype=dt, name="conv2")
        self.bn2 = nn.BatchNorm(momentum=BN_MOM, epsilon=1e-5,
                                dtype=jnp.float32, name="bn2")
        self.layer1 = [HRBottleneck(64, dtype=dt, name=f"layer1_block{i}")
                       for i in range(4)]
        self.transition1 = Transition((256,), STAGE2_CH, dt, name="transition1")
        self.stage2 = [HRModule(STAGE2_CH, dt, name="stage2_m0")]
        self.transition2 = Transition(STAGE2_CH, STAGE3_CH, dt,
                                      name="transition2")
        self.stage3 = [HRModule(STAGE3_CH, dt, name=f"stage3_m{i}")
                       for i in range(STAGE3_MODULES)]
        self.transition3 = Transition(STAGE3_CH, STAGE4_CH, dt,
                                      name="transition3")
        self.stage4 = [HRModule(STAGE4_CH, dt, name=f"stage4_m{i}")
                       for i in range(STAGE4_MODULES)]
        total = sum(STAGE4_CH)
        self.last_conv1 = nn.Conv(total, (1, 1), dtype=dt, name="last_conv1")
        self.last_bn = nn.BatchNorm(momentum=BN_MOM, epsilon=1e-5,
                                    dtype=jnp.float32, name="last_bn")
        self.last_conv2 = nn.Conv(self.n_classes, (1, 1), dtype=dt,
                                  name="last_conv2")

    def stem_stage1(self, x, train):
        """DualHRNet quirk: no ReLU after bn1 (dual_hrnet.py:662-672)."""
        x = self.bn1(self.conv1(x), use_running_average=not train)
        x = self.conv2(x)
        x = nn.relu(x)
        x = self.bn2(x, use_running_average=not train)
        x = nn.relu(x)
        for blk in self.layer1:
            x = blk(x, train)
        return x

    def run_stage(self, idx: int, xs, train):
        for m in (self.stage2, self.stage3, self.stage4)[idx - 2]:
            xs = m(xs, train)
        return xs

    def head(self, xs, train):
        h, w = xs[0].shape[1], xs[0].shape[2]
        cat = jnp.concatenate(
            [xs[0]] + [_resize_bilinear(t, h, w) for t in xs[1:]], axis=-1)
        y = self.last_conv1(cat)
        y = nn.relu(self.last_bn(y, use_running_average=not train))
        return self.last_conv2(y)


class DualHRNet(nn.Module):
    """Two fused HRNet streams; returns {'loc': (B,h,w,2), 'cls': (B,h,w,4)}
    at 1/4 input resolution (the reference upsamples in its loss/eval)."""

    dtype: Dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        self.loc_net = HRNetStream(2, dt, name="loc_net")
        self.cls_net = HRNetStream(4, dt, name="cls_net")
        self.fuse_loc = [
            _FuseList(STAGE2_CH, dt, name="fuse_loc_stage1"),
            _FuseList(STAGE3_CH, dt, name="fuse_loc_stage2"),
            _FuseList(STAGE4_CH, dt, name="fuse_loc_stage3"),
        ]
        self.fuse_cls = [
            _FuseList(STAGE2_CH, dt, name="fuse_cls_stage1"),
            _FuseList(STAGE3_CH, dt, name="fuse_cls_stage2"),
            _FuseList(STAGE4_CH, dt, name="fuse_cls_stage3"),
        ]

    def __call__(self, x6: jax.Array, x2=None, train: bool = False) -> dict:
        if x2 is None:
            x_pre, x_post = x6[..., :3], x6[..., 3:]
        else:
            x_pre, x_post = x6, x2
        a = self.loc_net.stem_stage1(x_pre, train)
        b = self.cls_net.stem_stage1(x_post, train)
        a_list = self.loc_net.transition1([a], train)
        b_list = self.cls_net.transition1([b], train)

        for stage_idx, (fl, fc) in enumerate(zip(self.fuse_loc, self.fuse_cls)):
            cat = [jnp.concatenate([p, q], -1) for p, q in zip(a_list, b_list)]
            a_list = fl(cat, train)
            b_list = fc(cat, train)
            a_list = self.loc_net.run_stage(stage_idx + 2, a_list, train)
            b_list = self.cls_net.run_stage(stage_idx + 2, b_list, train)
            if stage_idx < 2:
                trans_a = (self.loc_net.transition2, self.loc_net.transition3)[stage_idx]
                trans_b = (self.cls_net.transition2, self.cls_net.transition3)[stage_idx]
                a_list = trans_a(a_list, train)
                b_list = trans_b(b_list, train)

        loc = self.loc_net.head(a_list, train)
        cls = self.cls_net.head(b_list, train)
        return {"loc": loc, "cls": cls}


class _FuseList(nn.Module):
    """Per-branch 1x1 conv+BN+ReLU cross-stream fusion (dual_hrnet.py:609-622)."""

    channels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jax.Array], train: bool = False) -> List[jax.Array]:
        out = []
        for i, (x, ch) in enumerate(zip(xs, self.channels)):
            t = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"fuse{i}_conv")(x)
            t = _bn(train, f"fuse{i}_bn")(t)
            out.append(nn.relu(t))
        return out
