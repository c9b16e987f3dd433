"""DAHiTra — hierarchical-transformer UNet change detector (the paper model,
``newUNetTrans``).

Parity target: reference models/networks.py:1085-1357 (ResNet_UNet +
BASE_Transformer_UNet). Architecture:

  * Shared resnet18 trunk returning 4 scales — 1/2 (64ch), 1/4 (64ch),
    1/8 (128ch), 1/16 (256ch). Two trunk quirks are replicated exactly:
      - the 1/2-scale tap is ReLU(bn1) but the maxpool consumes the
        PRE-ReLU bn1 output (networks.py:1120-1123);
      - an extra 3x3/s2 maxpool sits between layer2 and layer3
        (networks.py:1128), which is why layer3 (stride-1 per
        replace_stride_with_dilation) lands at 1/16.
  * At each of the 3 coarse scales, a transformer-difference module
    (networks.py:1297-1318): 1x1-conv squeeze to 32ch (shared across
    dates), semantic tokens per date (token_len 4), joint transformer
    encode over the concatenated tokens (+learned pos emb), then the "V3"
    difference decode — each date is FIRST decoded through the
    cross-attention decoder with its own tokens (networks.py:1308-1310),
    then diff_token = |t2 - t1|, diff_x = conv3x3 of cat(x1_dec, x2_dec),
    and a final decoder pass; the learned per-scale decoder positional
    embedding is added on every decoder call. (The xBD copy skips the
    per-date decodes — see TransDiffModule.decode_dates.)
    Forward parity vs the reference is asserted in
    tests/test_oracle_parity.py.
  * Top-down fusion with nearest x2 upsamples and 3x3 convs
    (networks.py:1321-1357); the finest (1/2) level contributes through a
    conv-only TwoLayerConv2d on cat(a, b).

The reference also constructs a 4th (finest) transformer module that its
forward never calls (networks.py:1233-1236); we do not materialize those
dead parameters.

Scale table (enc heads, dec depth, dec heads, dim_head) from
networks.py:1221-1238; all widths are 32.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dahitra_tpu.nn.blocks import (
    PhasePackedConv,
    PhaseUpConv,
    SemanticTokenizer,
    TransformerDecoder,
    TransformerEncoder,
    TwoLayerConv,
    max_pool_3x3_s2,
    upsample_nearest,
)
from dahitra_tpu.nn.resnet import ResNetTrunk

Dtype = Any

# Read once at import (a per-trace os.environ read goes stale under jit
# caching; see nn/blocks.py). DAHITRA_PAIR_BN=0 restores the two-pass
# per-date trunk (the exact-equivalence reference for tests/test_pair_bn).
import os as _os  # noqa: E402

_PAIR_BN_DEFAULT = _os.environ.get("DAHITRA_PAIR_BN", "1") != "0"


class TransDiffModule(nn.Module):
    """Per-scale transformer difference module (networks.py:1297-1318)."""

    dim: int = 32
    token_len: int = 4
    enc_depth: int = 1
    enc_heads: int = 4
    enc_dim_head: int = 64
    dec_depth: int = 4
    dec_heads: int = 4
    dec_dim_head: int = 64
    pos_size: int = 16
    with_pos: bool = True
    with_decoder_pos: bool = True
    decoder_softmax: bool = True
    # LEVIR V3 decodes EACH date through the cross-attention decoder before
    # the diff decode (networks.py:1308-1310); the xBD copy comments those
    # two lines out (model_transformer_encoding.py:394-396).
    decode_dates: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.conv_squeeze = nn.Conv(self.dim, (1, 1), use_bias=False,
                                    dtype=self.dtype, name="conv_squeeze")
        self.tokenizer = SemanticTokenizer(self.token_len, dtype=self.dtype,
                                           name="tokenizer")
        if self.with_pos:
            self.pos_embedding = self.param(
                "pos_embedding", nn.initializers.normal(1.0),
                (1, self.token_len * 2, self.dim))
        if self.with_decoder_pos:
            self.pos_embedding_decoder = self.param(
                "pos_embedding_decoder", nn.initializers.normal(1.0),
                (1, self.pos_size, self.pos_size, self.dim))
        self.transformer = TransformerEncoder(
            dim=self.dim, depth=self.enc_depth, heads=self.enc_heads,
            dim_head=self.enc_dim_head, mlp_dim=self.dim, dtype=self.dtype,
            name="transformer")
        self.decoder = TransformerDecoder(
            dim=self.dim, depth=self.dec_depth, heads=self.dec_heads,
            dim_head=self.dec_dim_head, mlp_dim=self.dim,
            softmax=self.decoder_softmax, dtype=self.dtype, name="decoder")
        self.conv_decode = nn.Conv(self.dim, (3, 3), padding=1, use_bias=False,
                                   dtype=self.dtype, name="conv_decode")

    def _decode(self, x: jax.Array, tokens: jax.Array) -> jax.Array:
        """_forward_transformer_decoder (networks.py:1286-1294): the decoder
        positional embedding is added on EVERY decoder call."""
        b, h, w, c = x.shape
        if self.with_decoder_pos:
            x = x + self.pos_embedding_decoder
        seq = self.decoder(x.reshape(b, h * w, c), tokens)
        return seq.reshape(b, h, w, c)

    def __call__(self, x1: jax.Array, x2: jax.Array = None) -> jax.Array:
        # TPU shaping: both dates run the (BN-free) squeeze/tokenizer/decoder
        # as ONE batch-stacked pass — numerically identical to per-date
        # calls, but the tiny dim-32 matmuls see 2x the batch on the MXU and
        # XLA fuses one pipeline instead of two. When the caller already has
        # the [date1; date2] batch-stacked tensor (DAHiTraUNet's pair-BN
        # train / eval trunk), it passes it as x1 with x2=None — the
        # split + re-concat round-trip was ~1.5 ms of the b64 train step
        # (profile_ops.json 'split').
        if x2 is None:
            b = x1.shape[0] // 2
            x12s = x1
        else:
            b = x1.shape[0]
            x12s = jnp.concatenate([x1, x2], axis=0)
        x12 = nn.relu(self.conv_squeeze(x12s))
        t12 = self.tokenizer(x12)
        t1, t2 = t12[:b], t12[b:]
        tokens = jnp.concatenate([t1, t2], axis=1)
        if self.with_pos:
            tokens = tokens + self.pos_embedding
        tokens = self.transformer(tokens)
        t1, t2 = jnp.split(tokens, 2, axis=1)
        # V3 difference decoding (networks.py:1305-1318).
        if self.decode_dates:
            xd = self._decode(x12, jnp.concatenate([t1, t2], axis=0))
            x1d, x2d = xd[:b], xd[b:]
        else:
            x1d, x2d = x12[:b], x12[b:]
        diff_token = jnp.abs(t2 - t1)
        diff_x = self.conv_decode(jnp.concatenate([x1d, x2d], axis=-1))
        return self._decode(diff_x, diff_token)


class DAHiTraUNet(nn.Module):
    """``newUNetTrans`` (networks.py:163-165): token_len 4, enc_depth 1,
    learned token & decoder positional embeddings, img_size 256 baseline.

    ``input_nc=6`` accepts the xBD convention of a single 6-channel
    concatenated pre|post tensor (split internally), matching
    xBD_code/zoo/model_transformer_encoding.py:409-449.
    """

    output_nc: int = 2
    input_nc: int = 3
    token_len: int = 4
    enc_depth: int = 1
    dim_head: int = 64
    decoder_dim_head: int = 64
    backbone: str = "resnet18"
    img_size: int = 256
    decoder_softmax: bool = True
    with_pos: bool = True
    with_decoder_pos: bool = True
    # xBD-variant quirk (xBD_code/zoo/model_transformer_encoding.py:358-384):
    # the layer-index dispatch there only matches at the coarsest scale, so
    # token/decoder positional embeddings are applied ONLY at level 5. The
    # xBD copy also comments out the per-date decoder passes of V3
    # (model_transformer_encoding.py:394-396), so it uses decode_dates=False.
    pos_coarsest_only: bool = False
    # None = env default (DAHITRA_PAIR_BN, read at import). False restores
    # the reference's two-pass per-date trunk in train mode — the exact
    # equivalence baseline PairBatchNorm is tested against.
    pair_bn: Optional[bool] = None
    # True (default): classifier runs as a PhasePackedConv on conv_layer2's
    # phase-packed output — exact rewrite (see nn/blocks.PhasePackedConv).
    # False restores the materialized (2H, 2W, 32) head for A/Bs.
    fused_head: bool = True
    # True: the [date1; date2] batch-stacked trunk outputs flow STACKED
    # into the trans modules and the batch-grouped conv_layer2_0 (no
    # per-date split + re-concat); False (default) is the round-4 split
    # form. Both are exact to fp32 reassociation. MEASURED NEGATIVE
    # (benchmarks/ab_stacked.py, artifacts/stacked_ab.json): train b64
    # is bit-for-bit neutral (66.6 ms/step all variants — the 3.3 ms of
    # split/concat ops the rewrite removes was fully overlapped), and
    # eval b128 is 8-10% SLOWER stacked: the 2x-batch trans modules land
    # the decoder in the known-bad b256 XLA scheduling regime
    # (docs/ARCHITECTURE.md item 12).
    stacked_heads: bool = False
    # A/B knob for the space-to-depth stem rewrite (nn/resnet._stem_conv).
    # Same verdict (stacked_ab.json): train-neutral, eval -2.5%.
    s2d_stem: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.trunk = ResNetTrunk(backbone=self.backbone,
                                 replace_stride_with_dilation=(False, True, True),
                                 s2d_stem=self.s2d_stem,
                                 dtype=self.dtype, name="resnet")
        s = self.img_size
        # (enc_heads, dec_depth, dec_heads, pos_size) per coarse scale;
        # scale index 1 = 1/4 (layer "3"), 2 = 1/8 ("4"), 3 = 1/16 ("5").
        fine_pos = not self.pos_coarsest_only
        self.trans_3 = TransDiffModule(
            enc_depth=self.enc_depth, enc_heads=8, enc_dim_head=self.dim_head,
            dec_depth=8, dec_heads=8, dec_dim_head=self.decoder_dim_head,
            pos_size=s // 4, with_pos=self.with_pos and fine_pos,
            with_decoder_pos=self.with_decoder_pos and fine_pos,
            decoder_softmax=self.decoder_softmax, dtype=self.dtype,
            decode_dates=not self.pos_coarsest_only, name="trans_3")
        self.trans_4 = TransDiffModule(
            enc_depth=self.enc_depth, enc_heads=4, enc_dim_head=self.dim_head,
            dec_depth=4, dec_heads=4, dec_dim_head=self.decoder_dim_head,
            pos_size=s // 8, with_pos=self.with_pos and fine_pos,
            with_decoder_pos=self.with_decoder_pos and fine_pos,
            decoder_softmax=self.decoder_softmax, dtype=self.dtype,
            decode_dates=not self.pos_coarsest_only, name="trans_4")
        self.trans_5 = TransDiffModule(
            enc_depth=self.enc_depth, enc_heads=4, enc_dim_head=self.dim_head,
            dec_depth=4, dec_heads=4, dec_dim_head=self.decoder_dim_head,
            pos_size=s // 16, with_pos=self.with_pos,
            with_decoder_pos=self.with_decoder_pos,
            decoder_softmax=self.decoder_softmax, dtype=self.dtype,
            decode_dates=not self.pos_coarsest_only, name="trans_5")
        self.conv_layer2_0 = TwoLayerConv(32, dtype=self.dtype, name="conv_layer2_0")
        # The reference's relu(conv3x3(Upsample2x(.))) heads
        # (networks.py:1330-1351) run as phase-space convs at the PRE-upsample
        # resolution — exact rewrite, 4x fewer input reads, full MXU lanes.
        self.conv_layer2 = PhaseUpConv(32, packed_out=self.fused_head,
                                       dtype=self.dtype, name="conv_layer2")
        self.conv_layer3 = PhaseUpConv(32, dtype=self.dtype, name="conv_layer3")
        self.conv_layer4 = PhaseUpConv(32, dtype=self.dtype, name="conv_layer4")
        if self.fused_head:
            # conv_layer2 stays phase-packed and the classifier consumes it
            # as a PhasePackedConv: the (B, 2H, 2W, 32) pre-classifier map
            # never touches HBM and the 3x3x32->nc conv (2/128 output
            # lanes) becomes 3x3x128->4nc. Same parameter tree as nn.Conv.
            self.classifier = PhasePackedConv(self.output_nc,
                                              dtype=self.dtype,
                                              name="classifier")
        else:
            self.classifier = nn.Conv(self.output_nc, (3, 3), padding=1,
                                      dtype=self.dtype, name="classifier")

    def forward_single(self, x: jax.Array, train: bool, pair: bool = False
                       ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """4-scale trunk (networks.py:1118-1138).

        The reference source reads as if the maxpool consumed the PRE-ReLU
        bn1 output (``x_2 = relu(x); x_2_pool = maxpool(x)``), but the
        trunk's ``nn.ReLU(inplace=True)`` mutates ``x`` first, so the
        effective stem is the standard post-ReLU pooling — verified
        numerically in tests/test_oracle_parity.py."""
        pre = self.trunk.stem_preact(x, train, pair)
        x_2 = nn.relu(pre)                      # 1/2, 64ch
        x_pool = max_pool_3x3_s2(x_2)           # pools POST-ReLU (inplace)
        x_4 = self.trunk.layer1(x_pool, train, pair)  # 1/4, 64ch
        x_8 = self.trunk.layer2(x_4, train, pair)     # 1/8, 128ch
        x_8p = max_pool_3x3_s2(x_8)             # extra pool -> 1/16
        x_16 = self.trunk.layer3(x_8p, train, pair)   # 1/16, 256ch
        return x_2, x_4, x_8, x_16

    def __call__(self, x1: jax.Array, x2: jax.Array = None,
                 train: bool = False) -> jax.Array:
        if x2 is None:
            # xBD 6-channel convention: x1 = cat(pre, post) on channels.
            x1, x2 = x1[..., :3], x1[..., 3:]
        pair_ok = _PAIR_BN_DEFAULT if self.pair_bn is None else self.pair_bn
        if not train or pair_ok:
            # One [date1; date2] batch-stacked trunk pass. Eval BN uses
            # running stats (per-sample), so stacking is numerically
            # identical; in train mode PairBatchNorm computes the SAME
            # per-date statistics (and the same sequential running-stat
            # update) the reference's twin forward_single calls produce
            # (tests/test_pair_bn.py pins equality with the two-pass path).
            # The stacked tensors flow STACKED into the trans modules and
            # the pair head — no per-date split + re-concat round-trips
            # (profile_ops.json: ~3 ms of the b64 train step).
            f2, f4, f8, f16 = self.forward_single(
                jnp.concatenate([x1, x2], axis=0), train, pair=train)

            if self.stacked_heads:
                out5 = upsample_nearest(self.trans_5(f16), 2)
                out4 = self.conv_layer4(self.trans_4(f8) + out5)
                out3 = self.conv_layer3(self.trans_3(f4) + out4)
                out2 = self.conv_layer2_0(f2, train, pair_stacked=True)
            else:
                (a2, b2), (a4, b4), (a8, b8), (a16, b16) = (
                    jnp.split(t, 2, axis=0) for t in (f2, f4, f8, f16))
                out5 = upsample_nearest(self.trans_5(a16, b16), 2)
                out4 = self.conv_layer4(self.trans_4(a8, b8) + out5)
                out3 = self.conv_layer3(self.trans_3(a4, b4) + out4)
                out2 = self.conv_layer2_0(
                    jnp.concatenate([a2, b2], axis=-1), train)
        else:
            a2, a4, a8, a16 = self.forward_single(x1, train)
            b2, b4, b8, b16 = self.forward_single(x2, train)

            # Level 5 (1/16): 256ch -> 32ch (networks.py:1326-1329).
            out5 = upsample_nearest(self.trans_5(a16, b16), 2)
            # Level 4 (1/8): 128ch (networks.py:1331-1336). conv_layer4/3/2
            # are PhaseUpConv = relu(conv3x3(upsample2x(.))) in one fused op.
            out4 = self.conv_layer4(self.trans_4(a8, b8) + out5)
            # Level 3 (1/4): 64ch (networks.py:1338-1344).
            out3 = self.conv_layer3(self.trans_3(a4, b4) + out4)
            # Level 2 (1/2): conv-only fusion of both dates
            # (networks.py:1346-1351).
            out2 = self.conv_layer2_0(jnp.concatenate([a2, b2], axis=-1),
                                      train)
        out2 = self.conv_layer2(out2 + out3)

        return self.classifier(out2)
