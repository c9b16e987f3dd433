"""Primitive NN blocks, implemented once (the reference duplicates these
across models/help_funcs.py, xBD_code/zoo/model_transformer*.py and
xBD_code/zoo/models.py:1586-1752).

Layout is NHWC (TPU-native); sequences are (B, N, C). Parameters are fp32;
``dtype`` selects the computation precision (bfloat16 keeps matmuls on the
MXU at full rate; softmax and layer norms accumulate in fp32).

Behavioral parity notes (reference /root/reference/models/help_funcs.py):
  * Attention/Cross_Attention scale is ``dim ** -0.5`` on the *model* dim,
    not the head dim (help_funcs.py:71,122) — replicated.
  * PreNorm2 normalizes query and memory with the SAME LayerNorm instance
    (help_funcs.py:43-49) — replicated via a shared submodule.
  * Cross_Attention supports the no-softmax mode (help_funcs.py:102-105).
  * FeedForward = Linear-GELU-Dropout-Linear-Dropout (help_funcs.py:52-63).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# Feature-gate env vars are read ONCE at import time: reading os.environ
# inside a traced __call__ looks configurable but goes stale the moment a
# jit cache exists (flipping the var mid-process silently has no effect),
# so the value is pinned here where that is explicit. Prefer the module
# fields (TransformerDecoder.fast_vjp / .pallas) for programmatic control.
_FAST_VJP_DEFAULT = os.environ.get("DAHITRA_FAST_VJP", "1") != "0"


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbor upsample (torch nn.Upsample default mode)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), method="nearest")


def upsample_bilinear(x: jax.Array, factor: int = 4) -> jax.Array:
    """Bilinear upsample with half-pixel centers (torch align_corners=False)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), method="bilinear")


# M[d, r, k] = 1 iff tap k of a 3x3 SAME conv over a nearest-2x upsampled
# axis, for output phase d, lands on kernel row r of the equivalent
# phase-space conv at the ORIGINAL resolution. Derivation: output row
# R = 2i+d reads upsampled rows R-1, R, R+1, i.e. original rows
# floor((2i+d+k)/2) for k in {-1,0,1}: d=0 -> {i-1, i, i}; d=1 -> {i, i, i+1}.
# numpy constant (not jnp) so it never captures a trace.
import numpy as _np

_PHASE_TAPS = _np.asarray(
    [[[1, 0, 0], [0, 1, 1], [0, 0, 0]],
     [[0, 0, 0], [1, 1, 0], [0, 0, 1]]], _np.float32)


def _phase_tap_matrices() -> _np.ndarray:
    return _PHASE_TAPS


def depth_to_space2(t: jax.Array) -> jax.Array:
    """(B, H, W, 2, 2, C) phase tensor -> (B, 2H, 2W, C)."""
    b, h, w, _, _, c = t.shape
    return t.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


class PhaseUpConv(nn.Module):
    """``conv3x3_SAME(nearest_up2(x)) [+bias] [+ReLU]`` as ONE conv at the
    input resolution.

    The nearest-upsampled image repeats every source pixel 2x2, so each of
    the four output phases (di, dj) sees at most 2x2 distinct source pixels;
    grouping the repeated taps gives an exact phase-space kernel
    ``K[r,c,i,(di,dj,o)] = sum_{kr,kc} M[di,r,kr] M[dj,c,kc] W[kr,kc,i,o]``.
    TPU win: the MXU output-lane dim becomes 4*features (128 for the DAHiTra
    heads' 32) instead of 32, and the (2H, 2W) upsampled input is never
    materialized in HBM. Parameter tree ({kernel, bias}, HWIO (3,3,Cin,Cout))
    is identical to the nn.Conv it replaces, so torch import and checkpoints
    are unchanged. Exact algebraic rewrite (fp32 tap sums) of the reference's
    ``relu(conv(Upsample(x)))`` pattern (networks.py:1330-1351); equivalence
    is asserted in tests/test_blocks.py.
    """

    features: int
    relu: bool = True
    fused: bool = True
    # True: return the phase-PACKED tensor (B, H, W, 2*2*features) with
    # channel order (di, dj, f) instead of depth-to-spacing to (2H, 2W, f).
    # Consumers that stay in phase space (PhasePackedConv) avoid the 4x-res
    # HBM round-trip entirely.
    packed_out: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        if not self.fused:
            y = jax.lax.conv_general_dilated(
                upsample_nearest(x, 2).astype(self.dtype),
                kernel.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + bias.astype(self.dtype)
            return nn.relu(y) if self.relu else y
        m = _phase_tap_matrices()
        k4 = jnp.einsum("urk,vcl,klio->rciuvo", m, m,
                        kernel.astype(jnp.float32))
        k4 = k4.reshape(3, 3, c_in, 4 * self.features).astype(self.dtype)
        t = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k4, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        t = t + jnp.tile(bias, 4).astype(self.dtype)
        if self.relu:
            t = nn.relu(t)
        if self.packed_out:
            return t
        b, h, w, _ = t.shape
        return depth_to_space2(t.reshape(b, h, w, 2, 2, self.features))


# A[p, kr, u+1, di] = 1 iff full-res kernel row kr for output phase p lands
# on phase-space kernel row u with input phase di: source full-res row
# R = p + kr - 1 = 2u + di (u in {-1,0,1}, di in {0,1}). numpy constant so
# it never captures a trace.
_PHASE_PACK_TAPS = _np.zeros((2, 3, 3, 2), _np.float32)
for _p in range(2):
    for _kr in range(3):
        _R = _p + _kr - 1
        _PHASE_PACK_TAPS[_p, _kr, _R // 2 + 1, _R % 2] = 1.0
del _p, _kr, _R


class PhasePackedConv(nn.Module):
    """A stride-1 3x3 SAME conv at FULL resolution, evaluated directly on a
    phase-packed half-resolution input (B, H, W, 2*2*c_in), channel order
    (di, dj, c) — the layout PhaseUpConv(packed_out=True) emits.

    Exact rewrite: full-res output row 2i+p reads rows 2i+p-1..2i+p+1,
    which in phase space are rows i-1..i+1 at phases given by
    _PHASE_PACK_TAPS, so the equivalent kernel is 3x3 over 4*c_in inputs
    emitting 4*c_out phase outputs. Every phase-kernel entry is a plain
    copy of a full-res kernel entry (the tap map is a 0/1 bijection per
    (p, kr)), so there is no precomputation rounding.

    TPU win (b64 DAHiTra head): the classifier's (B, 256, 256, 32) input
    never materializes — the 3x3x32->2 conv (2/128 output lanes, 32/128
    contraction) becomes 3x3x128->8 at half resolution, and the final
    depth-to-space moves 16x fewer bytes than the pre-classifier feature
    map. Parameter tree ({kernel (3,3,c_in,c_out), bias}) is identical to
    the nn.Conv it replaces (torch import unchanged).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        """t: (B, H, W, 4*c_in) packed. Returns (B, 2H, 2W, features)."""
        c_in = t.shape[-1] // 4
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        a = jnp.asarray(_PHASE_PACK_TAPS)
        k4 = jnp.einsum("prud,qcve,rcio->uvdeipqo", a, a,
                        kernel.astype(jnp.float32))
        k4 = k4.reshape(3, 3, 4 * c_in, 4 * self.features).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            t.astype(self.dtype), k4, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.tile(bias, 4).astype(self.dtype)
        b, h, w, _ = y.shape
        return depth_to_space2(y.reshape(b, h, w, 2, 2, self.features))


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) on NHWC.

    Kept as plain lax.reduce_window after THREE measured alternatives lost
    on a v5e: stride-2-slice and pair-reshape max variants beat it
    standalone but regressed the fused eval forward (42.7 -> 46.7/47.9 ms
    at batch 128), and a custom_vjp that kept this forward while routing
    the backward through the pair-reshape chain regressed the b64
    train-step backward further still (116 -> 150 ms) — XLA's
    SelectAndScatter gradient is already the fastest option here.
    """
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def max_pool_3x3_s2_ceil(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(3, stride=2, ceil_mode=True) — NO padding, windows
    aligned at 0 with the last (clipped) window kept (the senet backbones'
    Caffe-compatible pool, xBD_code/zoo/senet.py:362-364)."""
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - 3) // 2) + 1
    out_w = -(-(w - 3) // 2) + 1
    pad_h = max((out_h - 1) * 2 + 3 - h, 0)
    pad_w = max((out_w - 1) * 2 + 3 - w, 0)
    init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x, init, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """torch F.max_pool2d(kernel_size=2, stride=2).

    Non-overlapping windows: a free (H/2, 2, W/2, 2) reshape + max is the
    canonical TPU form, and its gradient is elementwise selects instead of
    reduce_window's SelectAndScatter. Odd trailing rows/cols are sliced off
    first — torch floors odd dims (discarding the partial window), so the
    slice is exact parity, and it is a no-op for even shapes."""
    b, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2, :]
    t = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(t, axis=(2, 4))


class _ConvParams(nn.Module):
    """Parameter holder with nn.Conv's exact {kernel[, bias]} tree and
    initializers, for call paths that need to reinterpret the kernel
    (TwoLayerConv's batch-grouped pair form) while keeping checkpoints and
    torch import byte-identical."""

    shape: Tuple[int, ...]
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = (self.param("bias", nn.initializers.zeros_init(),
                        (self.shape[-1],)) if self.use_bias else None)
        return k, b


class TwoLayerConv(nn.Module):
    """conv3x3(bias=False)-BN-ReLU-conv3x3 head (help_funcs.py:7-15).

    ``pair_stacked=True`` call form: the input is the [date1; date2]
    BATCH-stacked (2B, H, W, C) tensor and the module computes exactly
    ``TwoLayerConv(cat(date1, date2, channels))`` without materializing the
    channel concat: conv1 over cat channels is linear, so
    ``conv(cat(a, b), W) = conv(a, W[:, :, :C]) + conv(b, W[:, :, C:])``,
    and one batch-grouped conv evaluates both partial convs from the
    stacked layout (profile_ops.json: the (2B, 128, 128, 64) split + the
    (B, 128, 128, 128) concat this removes were ~2 ms of the b64 train
    step). The partial sums are re-added in fp32 — the only numeric
    difference is contraction reassociation (~1e-6 rel fp32).
    """

    out_channels: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 pair_stacked: bool = False) -> jax.Array:
        from dahitra_tpu.nn.resnet import PairBatchNorm, _bn_out_dtype

        k = self.kernel_size
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        dn = ("NHWC", "HWIO", "NHWC")
        c_cat = 2 * x.shape[-1] if pair_stacked else x.shape[-1]
        k1, _ = _ConvParams((k, k, c_cat, c_cat), use_bias=False,
                            name="conv1")()
        if pair_stacked:
            c = x.shape[-1]
            kg = jnp.concatenate([k1[:, :, :c, :], k1[:, :, c:, :]],
                                 axis=-1).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kg, (1, 1), pad,
                dimension_numbers=dn, batch_group_count=2)
            x = (y[..., :c_cat].astype(jnp.float32)
                 + y[..., c_cat:].astype(jnp.float32))
        else:
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), k1.astype(self.dtype), (1, 1), pad,
                dimension_numbers=dn)
        # PairBatchNorm(pair=False) == nn.BatchNorm (fp32 stats), with the
        # output in the conv compute dtype — conv2 casts anyway, so bf16
        # mode just stops carrying an fp32 intermediate.
        x = PairBatchNorm(dtype=_bn_out_dtype(self.dtype), name="bn")(
            x, not train)
        x = nn.relu(x)
        k2, b2 = _ConvParams((k, k, c_cat, self.out_channels),
                             name="conv2")()
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k2.astype(self.dtype), (1, 1), pad,
            dimension_numbers=dn)
        return x + b2.astype(self.dtype)


class ConvRelu(nn.Module):
    """conv3x3(padding 1)-ReLU (networks.py:408-416)."""

    out_channels: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    padding=1, dtype=self.dtype, name="conv")(x)
        return nn.relu(x)


class ConvReluBN(nn.Module):
    """conv3x3-BN-ReLU (networks.py:396-405)."""

    out_channels: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from dahitra_tpu.nn.resnet import PairBatchNorm, _bn_out_dtype

        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    padding=1, dtype=self.dtype, name="conv")(x)
        x = PairBatchNorm(dtype=_bn_out_dtype(self.dtype), name="bn")(
            x, not train)
        return nn.relu(x)


class FeedForward(nn.Module):
    """Linear-GELU-Dropout-Linear-Dropout (help_funcs.py:52-63)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


def _split_heads(t: jax.Array, heads: int) -> jax.Array:
    b, n, hd = t.shape
    return t.reshape(b, n, heads, hd // heads).transpose(0, 2, 1, 3)


def _merge_heads(t: jax.Array) -> jax.Array:
    b, h, n, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, n, h * d)


class MultiHeadSelfAttention(nn.Module):
    """MHSA with fused qkv projection (help_funcs.py:117-151).

    Quirk preserved: attention logits are scaled by ``dim ** -0.5`` on the
    model dim, not the per-head dim (help_funcs.py:122).
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_split_heads(t, self.heads) for t in (q, k, v))
        scale = self.dim ** -0.5
        dots = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32) * scale
        attn = jax.nn.softmax(dots, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = _merge_heads(out)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out


class CrossAttention(nn.Module):
    """Query from x, key/value from memory m (help_funcs.py:66-114).

    ``softmax=False`` leaves raw dot products as the mixing weights — a BIT
    ablation mode (help_funcs.py:102-105).
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    softmax: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, m: jax.Array, deterministic: bool = True) -> jax.Array:
        inner = self.heads * self.dim_head
        to_q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")
        to_k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")
        to_v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")
        to_out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")
        scale = self.dim ** -0.5
        k = to_k(m)
        v = to_v(m)
        n_kv = k.shape[-2]

        if n_kv <= 16 and x.shape[-2] > 4 * n_kv:
            # Small-memory reassociation (the BIT/DAHiTra regime: 4-8
            # semantic tokens vs thousands of pixel queries). Folding the
            # projections through the tiny token axis —
            #   dots = x (Wq Kᵀ),   out = attn (V W_out) + b_out
            # — avoids ever materializing the (n, heads*dim_head) expanded
            # Q and pre-output tensors, which otherwise dominate HBM
            # traffic (measured 8x decoder speedup at 4096 queries). Exact
            # same math as the standard path, reassociated.
            # Cast like the standard path's Dense layers would (the LN
            # feeding us is fp32; without this the einsums promote the
            # whole residual stream to fp32).
            x = x.astype(self.dtype)
            dim_in = x.shape[-1]
            hl = self.heads * n_kv
            w_q = to_q(jnp.eye(dim_in, dtype=self.dtype))  # = kernel (no bias)
            w_q = w_q.reshape(dim_in, self.heads, self.dim_head)
            kh = k.reshape(*k.shape[:-1], self.heads, self.dim_head)
            vh = v.reshape(*v.shape[:-1], self.heads, self.dim_head)
            # Keep every (n, .)-sized tensor with heads*n_kv as the MINOR
            # dim: a (b, h, n, n_kv) layout leaves the softmax/exp passes
            # on 4-wide lanes (4/128 vector-lane utilization); flattened,
            # the same math runs on hl-wide rows. Same FLOPs, exact same
            # per-group softmax (the full-row max shift is constant within
            # each head's token group).
            a = jnp.einsum("chd,bjhd->bchj", w_q, kh).reshape(
                *kh.shape[:1], dim_in, hl)
            dots = jnp.einsum("bnc,bcm->bnm", x, a).astype(jnp.float32) * scale
            if self.softmax:
                # Max shift PER head group (a reshape view, still flattened
                # for the matmuls): a global row max would underflow every
                # head whose logits sit >~88 below another head's max,
                # zeroing its denom and producing NaNs.
                mx = jnp.max(dots.reshape(*dots.shape[:-1], self.heads, n_kv),
                             axis=-1, keepdims=True)
                e = jnp.exp(dots - jnp.broadcast_to(
                    mx, (*dots.shape[:-1], self.heads, n_kv)).reshape(dots.shape))
                sseg = jnp.asarray(
                    _np.kron(_np.eye(self.heads, dtype=_np.float32),
                             _np.ones((n_kv, n_kv), _np.float32)))
                # e stays fp32 through the segment-sum (the matmul is tiny);
                # casting it to bf16 first cost ~0.4% rounding on the
                # attention weights vs the standard path's fp32 softmax.
                denom = jax.lax.dot_general(
                    e, sseg, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                attn = e / denom
            else:
                attn = dots
            attn = attn.astype(x.dtype)
            b_out = to_out(jnp.zeros((1, inner), self.dtype))
            w_out = (to_out(jnp.eye(inner, dtype=self.dtype)) - b_out)
            w_out = w_out.reshape(self.heads, self.dim_head, self.dim)
            z = jnp.einsum("bjhd,hdc->bhjc", vh, w_out).reshape(
                *vh.shape[:1], hl, self.dim)
            out = jnp.einsum("bnm,bmc->bnc", attn, z) + b_out
            return nn.Dropout(self.dropout, deterministic=deterministic)(out)

        q = to_q(x)
        q, k, v = (_split_heads(t, self.heads) for t in (q, k, v))
        dots = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32) * scale
        if self.softmax:
            attn = jax.nn.softmax(dots, axis=-1)
        else:
            attn = dots
        attn = attn.astype(q.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = _merge_heads(out)
        out = to_out(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out


class TransformerEncoder(nn.Module):
    """depth x [x += MHSA(LN(x)); x += FF(LN(x))] (help_funcs.py:154-167)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        for i in range(self.depth):
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"attn_norm_{i}")(x)
            x = x + MultiHeadSelfAttention(
                self.dim, self.heads, self.dim_head, self.dropout, self.dtype,
                name=f"attn_{i}")(h, deterministic)
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"ff_norm_{i}")(x)
            x = x + FeedForward(self.dim, self.mlp_dim, self.dropout, self.dtype,
                                name=f"ff_{i}")(h, deterministic)
        return x


class TransformerDecoder(nn.Module):
    """depth x [x += CrossAttn(LN(x), LN(m)); x += FF(LN(x))].

    PreNorm2 quirk preserved: the query and the memory share one LayerNorm's
    parameters per layer (help_funcs.py:43-49,170-186).

    (Perf note: a lane-folded variant — 4 pixels packed into the 128-wide
    minor dim, LN stats and the per-token-group softmax done via
    block-structured matmuls, per-layer weights kron-lifted to 128x128 —
    was implemented and measured SLOWER on a v5e chip at batch 32-128
    (b128 forward 49.6 -> 69.1 ms): XLA already packs 32-wide rows into
    vector registers for elementwise work, so the fold only added matmul
    FLOPs. Kept out; the small-memory reassociation in CrossAttention is
    the win that stands.)
    """

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    softmax: bool = True
    # True = route qualifying shapes (softmax mode, <=128 head*token lanes,
    # tileable n) through the fused VMEM-resident Pallas kernel
    # (pallas/fused_decoder.py), with plain-path gradients via custom_vjp.
    # None currently means False: with the residual stream kept in bf16
    # (see CrossAttention's cast), the XLA plain path measures 2.98 ms vs
    # the kernel's 6.2 ms at (B32, N4096, d8) on a v5e — XLA's fusion of
    # the tiny-matmul chain wins once no fp32 promotion inflates it.
    pallas: Optional[bool] = None
    # None/True = run qualifying shapes through nn/decoder_vjp.decoder_stack:
    # same forward math, hand-written backward (bf16 residuals, recomputed
    # LN/GELU, fused weight-side reductions) — XLA autodiff's backward for
    # this stack runs 3-4x its forward (see decoder_vjp module docstring).
    fast_vjp: Optional[bool] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        self.attn_norm = [nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
                          for _ in range(self.depth)]
        self.attn = [CrossAttention(self.dim, self.heads, self.dim_head,
                                    self.dropout, self.softmax, self.dtype)
                     for _ in range(self.depth)]
        self.ff_norm = [nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
                        for _ in range(self.depth)]
        self.ff = [FeedForward(self.dim, self.mlp_dim, self.dropout,
                               self.dtype) for _ in range(self.depth)]

    def _packed_params(self):
        from dahitra_tpu.pallas.fused_decoder import pack_decoder_params

        tree = {}
        for i in range(self.depth):
            tree[f"attn_norm_{i}"] = self.attn_norm[i].variables["params"]
            tree[f"attn_{i}"] = self.attn[i].variables["params"]
            tree[f"ff_norm_{i}"] = self.ff_norm[i].variables["params"]
            tree[f"ff_{i}"] = self.ff[i].variables["params"]
        return pack_decoder_params(tree, self.depth)

    def __call__(self, x: jax.Array, m: jax.Array, deterministic: bool = True) -> jax.Array:
        from dahitra_tpu.pallas.fused_decoder import (make_fused_decoder,
                                                      pick_tile)

        tile = pick_tile(x.shape[-2])
        use_pallas = bool(self.pallas)
        use_pallas = (use_pallas and not self.is_initializing()
                      and self.softmax
                      and (deterministic or self.dropout == 0.0)
                      and tile is not None
                      and self.heads * m.shape[-2] <= 128
                      and x.shape[-1] == self.dim)
        if use_pallas:
            fn = make_fused_decoder(self.depth, self.heads, tile, self.dtype)
            return fn(x, m, self._packed_params()).astype(x.dtype)
        n_kv = m.shape[-2]
        use_fast = self.fast_vjp is not False and _FAST_VJP_DEFAULT
        use_fast = (use_fast and not self.is_initializing()
                    and self.softmax
                    and (deterministic or self.dropout == 0.0)
                    and n_kv <= 16 and x.shape[-2] > 4 * n_kv
                    and self.heads * n_kv <= 128
                    and x.shape[-1] == self.dim)
        if use_fast:
            # _auto n-chunks the call above ~2^18 rows, where XLA's fused
            # kernels degrade ~2x (see decoder_vjp.decoder_stack_auto).
            from dahitra_tpu.nn.decoder_vjp import decoder_stack_auto

            # Deliberately returns self.dtype (bf16 in bf16 mode) WITHOUT
            # casting back to x.dtype: the plain path's residual stream is
            # silently fp32 only because the fp32 decoder pos-embedding add
            # promotes it; keeping the stream and output bf16 is measured
            # optimization history (ledger items 5/7 — it also keeps the
            # top-down head's backward bf16). Forward/grad parity at bf16
            # tolerances is pinned by tests/test_decoder_vjp.py.
            return decoder_stack_auto(x.astype(self.dtype),
                                      m.astype(self.dtype),
                                      self._packed_params(), self.depth,
                                      self.heads, self.dtype)
        for i in range(self.depth):
            norm = self.attn_norm[i]
            x = x + self.attn[i](norm(x), norm(m), deterministic)
            x = x + self.ff[i](self.ff_norm[i](x), deterministic)
        return x


class SemanticTokenizer(nn.Module):
    """Spatial-attention token pooling (networks.py:312-319, :1273-1280).

    A 1x1 conv produces L per-pixel logits; a softmax over the *pixel* axis
    turns each into an attention map, and tokens are the attention-weighted
    sums of the feature map: ``einsum('bnl,bnc->blc')``. One fused
    matmul+softmax+matmul chain — XLA keeps it on the MXU.
    """

    token_len: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        logits = nn.Conv(self.token_len, (1, 1), use_bias=False, dtype=self.dtype,
                         name="conv_token")(x)
        logits = logits.reshape(b, h * w, self.token_len)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=1).astype(x.dtype)
        tokens = jnp.einsum("bnl,bnc->blc", attn, x.reshape(b, h * w, c))
        return tokens
