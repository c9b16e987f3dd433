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
    """One HRNet-W32 stream, stage-addressable for cross-stream fusion.

    ``head_width`` sets the channel width of the last_layer head
    (mask_last_layer's ``last_inp_channels``, dual_hrnet.py:384-402);
    0 means the default concat width sum(stage4 channels) = 480."""

    n_classes: int
    dtype: Dtype = jnp.float32
    head_width: int = 0

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
        total = self.head_width or sum(STAGE4_CH)
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
        if isinstance(xs, (list, tuple)):
            h, w = xs[0].shape[1], xs[0].shape[2]
            cat = jnp.concatenate(
                [xs[0]] + [_resize_bilinear(t, h, w) for t in xs[1:]],
                axis=-1)
        else:
            cat = xs  # FPN path: branches already fused to one map
        y = self.last_conv1(cat)
        y = nn.relu(self.last_bn(y, use_running_average=not train))
        return self.last_conv2(y)


class _FPN(nn.Module):
    """FPN upsampling head (dual_hrnet.py:634-663, :706-711): branch 0 is
    conv3x3+GroupNorm(ch/8 groups)+ReLU; branch i>0 chains
    (conv3x3 ch[idx]->ch[idx-1], GN, ReLU, bilinear x2) from idx=i down
    to 1; branch outputs are SUMMED into one finest-resolution map."""

    channels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jax.Array]) -> jax.Array:
        ch = self.channels
        y = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name="fpn0_conv")(xs[0])
        y = nn.GroupNorm(num_groups=ch[0] // 8, epsilon=1e-5,
                         dtype=jnp.float32, name="fpn0_gn")(y)
        out = nn.relu(y)
        for br in range(1, len(ch)):
            t = xs[br]
            for k, idx in enumerate(range(br, 0, -1)):
                t = nn.Conv(ch[idx - 1], (3, 3), padding=1, dtype=self.dtype,
                            name=f"fpn{br}_conv{k}")(t)
                t = nn.GroupNorm(num_groups=ch[idx - 1] // 8, epsilon=1e-5,
                                 dtype=jnp.float32, name=f"fpn{br}_gn{k}")(t)
                t = nn.relu(t)
                t = _resize_bilinear(t, t.shape[1] * 2, t.shape[2] * 2)
            out = out + t
        return out


class DualHRNet(nn.Module):
    """Two fused HRNet streams; returns {'loc': (B,h,w,2), 'cls': (B,h,w,4)}
    at 1/4 input resolution (the reference upsamples in its loss/eval).

    ``use_fpn`` enables the reference's USE_FPN branch (dead in the shipped
    dual_hrnet_config.yaml:20, and BROKEN upstream: mask_last_layer() sizes
    the head for the 480-ch concat while the FPN emits 32 ch, so torch
    crashes on a channel mismatch — dual_hrnet.py:384-402 vs :706-711).
    We apply the minimal fix, a 32-ch head (mask_last_layer(32)), mirrored
    in the torch oracle of tests/test_oracle_parity.py."""

    dtype: Dtype = jnp.float32
    use_fpn: bool = False

    def setup(self):
        dt = self.dtype
        hw = STAGE4_CH[0] if self.use_fpn else 0
        self.loc_net = HRNetStream(2, dt, head_width=hw, name="loc_net")
        self.cls_net = HRNetStream(4, dt, head_width=hw, name="cls_net")
        if self.use_fpn:
            self.fpn_loc = _FPN(STAGE4_CH, dt, name="fpn_loc")
            self.fpn_cls = _FPN(STAGE4_CH, dt, name="fpn_cls")
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

        if self.use_fpn:
            a_list = self.fpn_loc(a_list)
            b_list = self.fpn_cls(b_list)
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
