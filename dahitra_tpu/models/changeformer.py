"""ChangeFormerV6 — SegFormer-style siamese change detector.

Parity target: models/ChangeFormer.py:1330-1687 (EncoderTransformer_v3 +
DecoderTransformer_v3 + ChangeFormerV6):
  * Encoder: 4 stages of OverlapPatchEmbed (7x7/s4 then 7x7/s2 for V6's
    patch_size=7 pass-through, :1341-1348) + spatial-reduction attention
    blocks (sr_ratios 8/4/2/1, heads 1/2/4/8, dims 64/128/320/512, depths
    3/3/4/3, mlp ratio 4, qkv bias, LN eps 1e-6, dropout 0.1, stochastic
    depth linearly ramped to 0.1).
  * Mix-FFN: Linear -> 3x3 depthwise conv -> GELU -> Linear (:260-295,
    :512-522).
  * Decoder (:1463-1619): per-scale linear embed to 256, conv_diff on the
    concatenation of both dates (:1129-1137), intermediate prediction heads
    per scale, top-down bilinear +2x additions, linear fuse (1x1 conv + BN,
    no activation, :1504-1508), two transpose-conv x2 upsamples each
    followed by a ResidualBlock with 0.1-scaled second conv
    (ChangeFormerBaseNetworks.py:98-121), final 3x3 conv.
  * Returns the LIST of multi-scale logits [p4, p3, p2, p1, full]; the
    evaluator consumes [-1] (models/evaluator.py:161-162).

Everything stays NHWC; attention flattens spatial dims locally.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _resize_bilinear(x: jax.Array, h: int, w: int) -> jax.Array:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")


class OverlapPatchEmbed(nn.Module):
    patch_size: int
    stride: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.patch_size
        x = nn.Conv(self.embed_dim, (k, k), strides=self.stride,
                    padding=k // 2, dtype=self.dtype, name="proj")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        return x


class MixFFN(nn.Module):
    """fc1 -> depthwise 3x3 -> GELU -> fc2 (ChangeFormer Mlp + DWConv)."""

    hidden: int
    out: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.Conv(self.hidden, (3, 3), padding=1,
                    feature_group_count=self.hidden, dtype=self.dtype,
                    name="dwconv")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class SRAttention(nn.Module):
    """Spatial-reduction attention (ChangeFormer.py:298-358)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, h, w, c = x.shape
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, h * w, self.num_heads, hd).transpose(0, 2, 1, 3)

        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                            strides=self.sr_ratio, dtype=self.dtype,
                            name="sr")(x)
            kv_in = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                 name="sr_norm")(kv_in)
        n_kv = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(self.dim * 2, use_bias=True, dtype=self.dtype,
                      name="kv")(kv_in).reshape(b, n_kv, 2, self.num_heads, hd)
        k = kv[:, :, 0].transpose(0, 2, 1, 3)
        v = kv[:, :, 1].transpose(0, 2, 1, 3)

        scale = hd ** -0.5
        attn = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class SegformerBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int = 4
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        def droppath(r, branch):
            if self.drop_path == 0.0 or deterministic:
                return branch
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            return branch * mask / keep

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        x = x + droppath(self.drop_path, SRAttention(
            self.dim, self.num_heads, self.sr_ratio, self.attn_drop,
            self.drop, dtype=self.dtype, name="attn")(h, deterministic))
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        x = x + droppath(self.drop_path, MixFFN(
            self.dim * self.mlp_ratio, self.dim, self.drop, dtype=self.dtype,
            name="mlp")(h, deterministic))
        return x


class EncoderTransformerV3(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    depths: Sequence[int] = (3, 3, 4, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    patch_size: int = 7
    drop: float = 0.1
    attn_drop: float = 0.1
    drop_path_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        det = not train
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        outs = []
        cur = 0
        for s in range(4):
            x = OverlapPatchEmbed(
                patch_size=7 if s == 0 else self.patch_size,
                stride=4 if s == 0 else 2,
                embed_dim=self.embed_dims[s], dtype=self.dtype,
                name=f"patch_embed{s + 1}")(x)
            for i in range(self.depths[s]):
                x = SegformerBlock(
                    self.embed_dims[s], self.num_heads[s], self.sr_ratios[s],
                    4, self.drop, self.attn_drop, dpr[cur + i],
                    dtype=self.dtype, name=f"block{s + 1}_{i}")(x, det)
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name=f"norm{s + 1}")(x)
            outs.append(x)
            cur += self.depths[s]
        return outs


class ConvDiff(nn.Module):
    """conv3-ReLU-BN-conv3-ReLU (ChangeFormer.py:1129-1137)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(x)
        return nn.relu(x)


class MakePrediction(nn.Module):
    """conv3(in->out)-ReLU-BN(out)-conv3(out->out) (ChangeFormer.py:1139-1146).

    The channel squeeze happens in conv1 — BN runs over the (tiny) output
    width, matching the reference exactly."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv2")(x)


class ResidualBlock01(nn.Module):
    """conv-ReLU-conv*0.1 + residual (ChangeFormerBaseNetworks.py:108-121)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        y = nn.relu(nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name="conv1")(x))
        y = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y) * 0.1
        return x + y


class UpsampleConvX2(nn.Module):
    """torch ConvTranspose2d(k4, s2, p1): exact x2 upsample."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # padding ((2,2),(2,2)) + transpose_kernel reproduces torch
        # ConvTranspose2d(k4, s2, p1) exactly (verified vs torch).
        return nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                                padding=((2, 2), (2, 2)), transpose_kernel=True,
                                dtype=self.dtype, name="conv")(x)


class DecoderTransformerV3(nn.Module):
    in_channels: Sequence[int] = (64, 128, 320, 512)
    embedding_dim: int = 256
    output_nc: int = 2
    decoder_softmax: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats1: List[jax.Array], feats2: List[jax.Array],
                 train: bool = False) -> List[jax.Array]:
        e = self.embedding_dim
        c1_1, c2_1, c3_1, c4_1 = feats1
        c1_2, c2_2, c3_2, c4_2 = feats2
        h1, w1 = c1_1.shape[1], c1_1.shape[2]

        outputs = []
        prev = None
        cs_up = []
        # Coarse-to-fine: stage indices 4, 3, 2, 1.
        pairs = [(c4_1, c4_2, "4"), (c3_1, c3_2, "3"), (c2_1, c2_2, "2"),
                 (c1_1, c1_2, "1")]
        for a, b, tag in pairs:
            # One linear embed per scale, shared across both dates
            # (the reference applies self.linear_cN to both, :1560-1561).
            lin = nn.Dense(e, dtype=self.dtype, name=f"linear_c{tag}")
            ea, eb = lin(a), lin(b)
            d = ConvDiff(e, dtype=self.dtype, name=f"diff_c{tag}")(
                jnp.concatenate([ea, eb], axis=-1), train)
            if prev is not None:
                d = d + _resize_bilinear(prev, d.shape[1], d.shape[2])
            outputs.append(MakePrediction(self.output_nc, dtype=self.dtype,
                                          name=f"make_pred_c{tag}")(d, train))
            prev = d
            cs_up.append(d if tag == "1" else _resize_bilinear(d, h1, w1))

        fused = jnp.concatenate(cs_up, axis=-1)
        fused = nn.Conv(e, (1, 1), dtype=self.dtype, name="linear_fuse")(fused)
        fused = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="linear_fuse_bn")(fused)

        x = UpsampleConvX2(e, dtype=self.dtype, name="convd2x")(fused)
        x = ResidualBlock01(dtype=self.dtype, name="dense_2x")(x)
        x = UpsampleConvX2(e, dtype=self.dtype, name="convd1x")(x)
        x = ResidualBlock01(dtype=self.dtype, name="dense_1x")(x)
        cp = nn.Conv(self.output_nc, (3, 3), padding=1, dtype=self.dtype,
                     name="change_probability")(x)
        outputs.append(cp)
        if self.decoder_softmax:
            outputs = [nn.sigmoid(o) for o in outputs]
        return outputs


class ConvProjectionBase(nn.Module):
    """Difference-image decoder (ChangeFormer.py:590-641): transpose-conv x2
    ladder with 0.1-scaled residual blocks and per-scale skip additions."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, di: List[jax.Array]) -> jax.Array:
        def crop_to(x, ref):
            return x[:, :ref.shape[1], :ref.shape[2], :]

        y = UpsampleConvX2(320, dtype=self.dtype, name="convd16x")(di[3])
        y = ResidualBlock01(dtype=self.dtype, name="dense_4")(crop_to(y, di[2]))
        y = y + di[2]
        y = UpsampleConvX2(128, dtype=self.dtype, name="convd8x")(y)
        y = ResidualBlock01(dtype=self.dtype, name="dense_3")(crop_to(y, di[1]))
        y = y + di[1]
        y = UpsampleConvX2(64, dtype=self.dtype, name="convd4x")(y)
        y = ResidualBlock01(dtype=self.dtype, name="dense_2")(crop_to(y, di[0]))
        y = y + di[0]
        y = UpsampleConvX2(16, dtype=self.dtype, name="convd2x")(y)
        y = ResidualBlock01(dtype=self.dtype, name="dense_1")(y)
        y = UpsampleConvX2(8, dtype=self.dtype, name="convd1x")(y)
        return y


class ChangeFormerV1(nn.Module):
    """models/ChangeFormer.py:643-674 — the basic ChangeFormer: the Tenc
    SegFormer encoder (depths 3/4/6/3, qkv bias, stage-2+ patch size 3,
    ChangeFormer.py:524-530; the V1 encoder also constructs intra-patch
    blocks its forward never calls, :52-60 — not materialized here), per-
    scale absolute feature differences, conv-projection ladder, 3x3 head.
    """

    output_nc: int = 2
    decoder_softmax: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = EncoderTransformerV3(
            embed_dims=(64, 128, 320, 512), num_heads=(1, 2, 4, 8),
            depths=(3, 4, 6, 3), sr_ratios=(8, 4, 2, 1), patch_size=3,
            drop=0.0, attn_drop=0.0, drop_path_rate=0.1, dtype=self.dtype,
            name="Tenc")
        self.convproj = ConvProjectionBase(dtype=self.dtype, name="convproj")
        self.head = nn.Conv(self.output_nc, (3, 3), padding=1,
                            dtype=self.dtype, name="change_probability")

    def __call__(self, x1: jax.Array, x2: jax.Array,
                 train: bool = False) -> jax.Array:
        f1 = self.encoder(x1, train)
        f2 = self.encoder(x2, train)
        di = [jnp.abs(a - b) for a, b in zip(f1, f2)]
        cp = self.head(self.convproj(di))
        if self.decoder_softmax:
            cp = jax.nn.softmax(cp, axis=-1)
        return cp


class ChangeFormerV6(nn.Module):
    """models/ChangeFormer.py:1657-1687."""

    output_nc: int = 2
    embed_dim: int = 256
    decoder_softmax: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = EncoderTransformerV3(
            embed_dims=(64, 128, 320, 512), num_heads=(1, 2, 4, 8),
            depths=(3, 3, 4, 3), sr_ratios=(8, 4, 2, 1), patch_size=7,
            drop=0.1, attn_drop=0.1, drop_path_rate=0.1, dtype=self.dtype,
            name="Tenc")
        self.decoder = DecoderTransformerV3(
            in_channels=(64, 128, 320, 512), embedding_dim=self.embed_dim,
            output_nc=self.output_nc, decoder_softmax=self.decoder_softmax,
            dtype=self.dtype, name="TDec")

    def __call__(self, x1: jax.Array, x2: jax.Array,
                 train: bool = False) -> List[jax.Array]:
        f1 = self.encoder(x1, train)
        f2 = self.encoder(x2, train)
        return self.decoder(f1, f2, train)
