"""PyTorch checkpoint import: reference state_dicts -> our param pytrees.

Covers:
  * torchvision-style ResNet trunks (``conv1/bn1/layerN.M.*``), the naming
    used by the vendored models/resnet.py — enables loading ImageNet
    pretrained weights, which are load-bearing for the reference's accuracy
    (models/networks.py:187-194).
  * The reference DAHiTra (``newUNetTrans``) state_dict
    (models/networks.py:1142-1357 naming) and BIT (networks.py:260-310).

Conventions converted:
  * Conv2d weight (O, I, kH, kW) -> flax kernel (kH, kW, I, O).
  * Linear weight (O, I) -> flax kernel (I, O).
  * BatchNorm weight/bias -> params scale/bias; running_mean/var ->
    batch_stats mean/var.
  * NCHW positional embeddings (1, C, H, W) -> NHWC (1, H, W, C).
  * ``module.``-prefixed keys (DataParallel) are stripped, like the
    reference's own loaders (xBD_code/train.py:450-456).

Loading a .pt file requires torch (CPU build is available in this image);
``state_dict_to_numpy`` isolates that dependency.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def state_dict_to_numpy(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_G_state_dict", "state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {k[len("module."):] if k.startswith("module.") else k:
            v.detach().numpy() for k, v in ckpt.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_resnet_trunk(sd: Dict[str, np.ndarray], prefix: str = ""
                         ) -> Tuple[dict, dict]:
    """torchvision resnet state_dict (optionally under ``prefix``) ->
    (params, batch_stats) subtrees matching nn/resnet.py's ResNetTrunk."""
    params: dict = {}
    stats: dict = {}

    def bn(src: str, dst: Tuple[str, ...]):
        _set(params, dst + ("scale",), sd[prefix + src + ".weight"])
        _set(params, dst + ("bias",), sd[prefix + src + ".bias"])
        _set(stats, dst + ("mean",), sd[prefix + src + ".running_mean"])
        _set(stats, dst + ("var",), sd[prefix + src + ".running_var"])

    _set(params, ("conv1", "kernel"), _conv(sd[prefix + "conv1.weight"]))
    bn("bn1", ("bn1",))
    li = 1
    while prefix + f"layer{li}.0.conv1.weight" in sd:
        bi = 0
        while prefix + f"layer{li}.{bi}.conv1.weight" in sd:
            src = f"layer{li}.{bi}"
            dst = (f"layer{li}", f"block{bi}")
            n_convs = 3 if prefix + f"{src}.conv3.weight" in sd else 2
            for ci in range(1, n_convs + 1):
                _set(params, dst + (f"conv{ci}", "kernel"),
                     _conv(sd[prefix + f"{src}.conv{ci}.weight"]))
                bn(f"{src}.bn{ci}", dst + (f"bn{ci}",))
            if prefix + f"{src}.downsample.0.weight" in sd:
                _set(params, dst + ("down_conv", "kernel"),
                     _conv(sd[prefix + f"{src}.downsample.0.weight"]))
                bn(f"{src}.downsample.1", dst + ("down_bn",))
            bi += 1
        li += 1
    return params, stats


def import_torchvision_trunk(path: str) -> dict:
    """Raw torchvision resnet state_dict (.pth) -> trunk-only variables.

    The reference's xBD zoo ctors build their encoders with
    ``pretrained=True`` (xBD_code/zoo/models.py:586-597) and that ImageNet
    warm start survives the ctor kaiming init (it only re-inits the decoder
    convs, :638-646) — it is load-bearing for the published xBD numbers.
    This converts the raw torchvision file ONCE into a checkpoint whose
    tree places the trunk at params/core/resnet — the subtree every
    Res34_Unet variant here uses (models/res34_unet.py) — so
    ``xbd_train --warm_start_from`` size-filters it in exactly like the
    reference's state_dict copy (train.py:446-462): trunk leaves match and
    load, everything else keeps its fresh init.
    """
    sd = state_dict_to_numpy(path)
    if "conv1.weight" not in sd or "layer1.0.conv1.weight" not in sd:
        raise ValueError(
            "not a torchvision resnet state_dict (expected conv1.weight / "
            "layer1.*.conv1.weight keys); for whole-model reference "
            "checkpoints use --net_G instead of --trunk_only")
    p, s = convert_resnet_trunk(sd)
    return {"params": {"core": {"resnet": p}},
            "batch_stats": {"core": {"resnet": s}}}


def _convert_transformer(sd, prefix: str, depth: int, params: dict,
                         dst_prefix: Tuple[str, ...]):
    """reference help_funcs Transformer -> our TransformerEncoder names."""
    for i in range(depth):
        base = f"{prefix}.layers.{i}"
        _set(params, dst_prefix + (f"attn_norm_{i}", "scale"),
             sd[f"{base}.0.fn.norm.weight"])
        _set(params, dst_prefix + (f"attn_norm_{i}", "bias"),
             sd[f"{base}.0.fn.norm.bias"])
        _set(params, dst_prefix + (f"attn_{i}", "to_qkv", "kernel"),
             _linear(sd[f"{base}.0.fn.fn.to_qkv.weight"]))
        _set(params, dst_prefix + (f"attn_{i}", "to_out", "kernel"),
             _linear(sd[f"{base}.0.fn.fn.to_out.0.weight"]))
        _set(params, dst_prefix + (f"attn_{i}", "to_out", "bias"),
             sd[f"{base}.0.fn.fn.to_out.0.bias"])
        _set(params, dst_prefix + (f"ff_norm_{i}", "scale"),
             sd[f"{base}.1.fn.norm.weight"])
        _set(params, dst_prefix + (f"ff_norm_{i}", "bias"),
             sd[f"{base}.1.fn.norm.bias"])
        for (tl, fl) in (("net.0", "fc1"), ("net.3", "fc2")):
            _set(params, dst_prefix + (f"ff_{i}", fl, "kernel"),
                 _linear(sd[f"{base}.1.fn.fn.{tl}.weight"]))
            _set(params, dst_prefix + (f"ff_{i}", fl, "bias"),
                 sd[f"{base}.1.fn.fn.{tl}.bias"])


def _convert_decoder(sd, prefix: str, depth: int, params: dict,
                     dst_prefix: Tuple[str, ...]):
    """reference TransformerDecoder -> our TransformerDecoder names."""
    for i in range(depth):
        base = f"{prefix}.layers.{i}"
        _set(params, dst_prefix + (f"attn_norm_{i}", "scale"),
             sd[f"{base}.0.fn.norm.weight"])
        _set(params, dst_prefix + (f"attn_norm_{i}", "bias"),
             sd[f"{base}.0.fn.norm.bias"])
        for t in ("to_q", "to_k", "to_v"):
            _set(params, dst_prefix + (f"attn_{i}", t, "kernel"),
                 _linear(sd[f"{base}.0.fn.fn.{t}.weight"]))
        _set(params, dst_prefix + (f"attn_{i}", "to_out", "kernel"),
             _linear(sd[f"{base}.0.fn.fn.to_out.0.weight"]))
        _set(params, dst_prefix + (f"attn_{i}", "to_out", "bias"),
             sd[f"{base}.0.fn.fn.to_out.0.bias"])
        _set(params, dst_prefix + (f"ff_norm_{i}", "scale"),
             sd[f"{base}.1.fn.norm.weight"])
        _set(params, dst_prefix + (f"ff_norm_{i}", "bias"),
             sd[f"{base}.1.fn.norm.bias"])
        for (tl, fl) in (("net.0", "fc1"), ("net.3", "fc2")):
            _set(params, dst_prefix + (f"ff_{i}", fl, "kernel"),
                 _linear(sd[f"{base}.1.fn.fn.{tl}.weight"]))
            _set(params, dst_prefix + (f"ff_{i}", fl, "bias"),
                 sd[f"{base}.1.fn.fn.{tl}.bias"])


def _bn_pair(sd, src, params, stats, dst):
    _set(params, dst + ("scale",), sd[src + ".weight"])
    _set(params, dst + ("bias",), sd[src + ".bias"])
    _set(stats, dst + ("mean",), sd[src + ".running_mean"])
    _set(stats, dst + ("var",), sd[src + ".running_var"])


def convert_dahitra(sd: Dict[str, np.ndarray], xbd: bool = False
                    ) -> Tuple[dict, dict]:
    """Reference BASE_Transformer_UNet state_dict -> DAHiTraUNet variables.

    LEVIR naming: models/networks.py:1142-1357. The xBD variant
    (model_transformer_encoding.py) has pos embeddings only at the coarsest
    scale (xbd=True skips the fine-scale ones).
    """
    params: dict = {}
    stats: dict = {}
    p_trunk, s_trunk = convert_resnet_trunk(sd, "resnet.")
    params["resnet"] = p_trunk
    stats["resnet"] = s_trunk

    # (our name, ref suffix, enc depth, dec depth)
    scales = [("trans_5", "5", 1, 4), ("trans_4", "4", 1, 4),
              ("trans_3", "3", 1, 8)]
    for ours, ref, enc_d, dec_d in scales:
        _set(params, (ours, "conv_squeeze", "kernel"),
             _conv(sd[f"conv_squeeze_{ref}.0.weight"]))
        _set(params, (ours, "tokenizer", "conv_token", "kernel"),
             _conv(sd[f"conv_token_{ref}.weight"]))
        _set(params, (ours, "conv_decode", "kernel"),
             _conv(sd[f"conv_decode_{ref}.weight"]))
        # xBD quirk: the forward's layer-index dispatch
        # (model_transformer_encoding.py:358-378) adds the suffix-3 pos
        # embeddings at the COARSEST scale (our trans_5) and none elsewhere.
        pos_ref = ("3" if ref == "5" else None) if xbd else ref
        if pos_ref is not None and f"pos_embedding_{pos_ref}" in sd:
            _set(params, (ours, "pos_embedding"),
                 sd[f"pos_embedding_{pos_ref}"])
        if pos_ref is not None and f"pos_embedding_decoder_{pos_ref}" in sd:
            _set(params, (ours, "pos_embedding_decoder"),
                 np.transpose(sd[f"pos_embedding_decoder_{pos_ref}"],
                              (0, 2, 3, 1)))
        _convert_transformer(sd, f"transformer_{ref}", enc_d, params,
                             (ours, "transformer"))
        _convert_decoder(sd, f"transformer_decoder_{ref}", dec_d, params,
                         (ours, "decoder"))

    # Head convs (networks.py:1240-1249).
    _set(params, ("conv_layer2_0", "conv1", "kernel"),
         _conv(sd["conv_layer2_0.0.weight"]))
    _bn_pair(sd, "conv_layer2_0.1", params, stats, ("conv_layer2_0", "bn"))
    _set(params, ("conv_layer2_0", "conv2", "kernel"),
         _conv(sd["conv_layer2_0.3.weight"]))
    _set(params, ("conv_layer2_0", "conv2", "bias"), sd["conv_layer2_0.3.bias"])
    for n in ("conv_layer2", "conv_layer3", "conv_layer4"):
        _set(params, (n, "kernel"), _conv(sd[f"{n}.0.weight"]))
        _set(params, (n, "bias"), sd[f"{n}.0.bias"])
    _set(params, ("classifier", "kernel"), _conv(sd["classifier.weight"]))
    _set(params, ("classifier", "bias"), sd["classifier.bias"])
    return params, stats


def convert_bit(sd: Dict[str, np.ndarray], enc_depth: int = 1,
                dec_depth: int = 8) -> Tuple[dict, dict]:
    """Reference BASE_Transformer state_dict -> BIT variables
    (networks.py:260-310 naming)."""
    params: dict = {}
    stats: dict = {}
    p_trunk, s_trunk = convert_resnet_trunk(sd, "resnet.")
    params["resnet"] = p_trunk
    stats["resnet"] = s_trunk
    _set(params, ("conv_pred", "kernel"), _conv(sd["conv_pred.weight"]))
    _set(params, ("conv_pred", "bias"), sd["conv_pred.bias"])
    _set(params, ("tokenizer", "conv_token", "kernel"), _conv(sd["conv_a.weight"]))
    if "pos_embedding" in sd:
        _set(params, ("pos_embedding",), sd["pos_embedding"])
    if "pos_embedding_decoder" in sd:
        _set(params, ("pos_embedding_decoder",),
             np.transpose(sd["pos_embedding_decoder"], (0, 2, 3, 1)))
    _convert_transformer(sd, "transformer", enc_depth, params, ("transformer",))
    _convert_decoder(sd, "transformer_decoder", dec_depth, params,
                     ("transformer_decoder",))
    # classifier = TwoLayerConv2d (help_funcs.py:7-15): Sequential 0,1,3.
    _set(params, ("classifier", "conv1", "kernel"), _conv(sd["classifier.0.weight"]))
    _bn_pair(sd, "classifier.1", params, stats, ("classifier", "bn"))
    _set(params, ("classifier", "conv2", "kernel"), _conv(sd["classifier.3.weight"]))
    _set(params, ("classifier", "conv2", "bias"), sd["classifier.3.bias"])
    return params, stats


def _wrapped_trunk_sd(sd: Dict[str, np.ndarray], prefix: str = ""
                      ) -> Dict[str, np.ndarray]:
    """Re-key a zoo-style wrapped trunk — conv1=Sequential(conv, bn, relu)
    ('conv1.0/conv1.1'), conv2=Sequential(maxpool, layer1) ('conv2.1.*'),
    conv3..5 = layer2..4 — back to torchvision names for
    convert_resnet_trunk (the wrapping at zoo/models.py:586-597 and
    networks.py:572-583)."""
    trunk_sd = {"conv1.weight": sd[prefix + "conv1.0.weight"]}
    for suf in ("weight", "bias", "running_mean", "running_var"):
        trunk_sd[f"bn1.{suf}"] = sd[prefix + f"conv1.1.{suf}"]
    for li, src in ((1, "conv2.1"), (2, "conv3"), (3, "conv4"), (4, "conv5")):
        for k, v in sd.items():
            if k.startswith(prefix + src + "."):
                trunk_sd[f"layer{li}." + k[len(prefix + src) + 1:]] = v
    return trunk_sd


def _conv_relu(sd: Dict[str, np.ndarray], name: str) -> dict:
    """ConvRelu Sequential(conv, relu) ('<name>.layer.0') -> our ConvRelu."""
    return {"conv": {"kernel": _conv(sd[f"{name}.layer.0.weight"]),
                     "bias": sd[f"{name}.layer.0.bias"]}}


_DEC_CONVS = ("conv6", "conv6_2", "conv7", "conv7_2", "conv8", "conv8_2",
              "conv9", "conv9_2", "conv10")


def convert_res34_unet(sd: Dict[str, np.ndarray], double: bool = True
                       ) -> Tuple[dict, dict]:
    """Res34_Unet_Loc/Double state_dict -> our Res34UnetLoc/Double variables
    (xBD_code/zoo/models.py:491-646 naming)."""
    params: dict = {}
    stats: dict = {}
    p_trunk, s_trunk = convert_resnet_trunk(_wrapped_trunk_sd(sd))
    core_p: dict = {"resnet": p_trunk}
    core_s: dict = {"resnet": s_trunk}
    for n in _DEC_CONVS:
        core_p[n] = _conv_relu(sd, n)
    params["core"] = core_p
    stats["core"] = core_s
    params["res"] = {"kernel": _conv(sd["res.weight"]), "bias": sd["res.bias"]}
    return params, stats


def _ct_as_conv(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d(k, stride 1, padding k//2) equals a SAME conv
    with spatially flipped taps and in/out swapped; convert its weight
    (in, out, kh, kw) to a flax Conv kernel (kh, kw, in, out)."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def convert_resnet_cd(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """ResNet change detector (networks.py:176-257, 'base_resnet18')."""
    params: dict = {}
    stats: dict = {}
    p_trunk, s_trunk = convert_resnet_trunk(sd, "resnet.")
    params["resnet"] = p_trunk
    stats["resnet"] = s_trunk
    _conv_b(sd, "conv_pred", params, ("conv_pred",))
    _conv_b(sd, "classifier.0", params, ("classifier", "conv1"))
    _bn_pair(sd, "classifier.1", params, stats, ("classifier", "bn"))
    _conv_b(sd, "classifier.3", params, ("classifier", "conv2"))
    return params, stats


def convert_siam_unet_conc(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """SiamUnet_conc (networks.py:916-1082, 'siamUnet_conc').

    Encoder convNM/bnNM -> encNM; decoder ConvTranspose2d(k3, s1, p1)
    convNMd -> our SAME-conv decNM with flipped taps (_ct_as_conv);
    stride-2 upconvN keep their transposed-conv form."""
    params: dict = {}
    stats: dict = {}
    enc_names = ("11", "12", "21", "22", "31", "32", "33", "41", "42", "43")
    for nm in enc_names:
        _conv_b(sd, f"conv{nm}", params, (f"enc{nm}", "conv"))
        _bn_pair(sd, f"bn{nm}", params, stats, (f"enc{nm}", "bn"))
    for s in ("4", "3", "2", "1"):
        _set(params, (f"upconv{s}", "upconv", "kernel"),
             _conv(sd[f"upconv{s}.weight"]))
        _set(params, (f"upconv{s}", "upconv", "bias"), sd[f"upconv{s}.bias"])
    dec_names = ("43", "42", "41", "33", "32", "31", "22", "21", "12")
    for nm in dec_names:
        _set(params, (f"dec{nm}", "conv", "kernel"),
             _ct_as_conv(sd[f"conv{nm}d.weight"]))
        _set(params, (f"dec{nm}", "conv", "bias"), sd[f"conv{nm}d.bias"])
        _bn_pair(sd, f"bn{nm}d", params, stats, (f"dec{nm}", "bn"))
    _set(params, ("dec11", "kernel"), _ct_as_conv(sd["conv11d.weight"]))
    _set(params, ("dec11", "bias"), sd["conv11d.bias"])
    return params, stats


def convert_res34_double_modified(sd: Dict[str, np.ndarray]
                                  ) -> Tuple[dict, dict]:
    """Res34_Unet_Double_Modified (zoo/models.py:854-991): the shared core
    plus the nine 1x1 fusion convs (conv1d_1..conv1d_9, biased)."""
    params, stats = convert_res34_unet(sd)
    for i in range(1, 10):
        _set(params, (f"conv1d_{i}", "kernel"),
             _conv(sd[f"conv1d_{i}.weight"]))
        _set(params, (f"conv1d_{i}", "bias"), sd[f"conv1d_{i}.bias"])
    return params, stats


def convert_unet_change_transformer(sd: Dict[str, np.ndarray],
                                    two: bool = False) -> Tuple[dict, dict]:
    """UNet_Change_Transformer (networks.py:548-746, 'unet_coupled_trans_256')
    or UNet_Change_Two_Transformer (:748-913, 'unet_coupled_two_trans_256')
    state_dict -> our variables.

    Dead modules the reference constructs but never calls (ca_skip_4/3/1,
    ca_bottle_avg_min, linearb, transformer_decoder, classifier, conv0) are
    ignored. For the two-transformer variant the reference's forward needs a
    ``ca_skip_2`` its __init__ comments out (AttributeError on every call);
    a checkpoint can only carry that key if it was added back, so its
    absence raises KeyError here.
    """
    params: dict = {}
    stats: dict = {}
    p_trunk, s_trunk = convert_resnet_trunk(_wrapped_trunk_sd(sd))
    params["encoder"] = {"resnet": p_trunk}
    stats["encoder"] = {"resnet": s_trunk}
    params["ca_skip_5"] = {"conv1": {"kernel": _conv(sd["ca_skip_5.conv1.weight"])}}
    if two:
        params["ca_skip_2"] = {"conv1": {"kernel": _conv(sd["ca_skip_2.conv1.weight"])}}
        _convert_transformer(sd, "transformer", 3, params,
                             ("transformer", "transformer"))
        _convert_transformer(sd, "transformer2", 2, params,
                             ("transformer2", "transformer"))
    else:
        params["ca_bottle_max"] = {
            "fc1": {"kernel": _conv(sd["ca_bottle_max.fc1.weight"])},
            "fc2": {"kernel": _conv(sd["ca_bottle_max.fc2.weight"])},
        }
        _convert_transformer(sd, "transformer", 3, params,
                             ("transformer", "transformer"))
    for n in _DEC_CONVS:
        params[n] = _conv_relu(sd, n)
    params["res"] = {"kernel": _conv(sd["res.weight"]), "bias": sd["res.bias"]}
    return params, stats


def convert_se_unet(sd: Dict[str, np.ndarray], arch: str) -> Tuple[dict, dict]:
    """SeResNext50/SeNet154 Unet Loc/Double state_dicts
    (xBD_code/zoo/models.py:72-148, 649-722 wrapping of zoo/senet.py
    backbones) -> our SeResNext50Unet*/SeNet154Unet* variables.

    Wrapping: conv1 = Sequential(layer0 convs/bns/relus), conv2 =
    Sequential(pool, layer1), conv3..5 = layer2..4; blocks carry
    conv1-3/bn1-3, se_module.fc1/fc2 (biased 1x1s), optional
    downsample.0/.1.
    """
    assert arch in ("se_resnext50", "senet154")
    params: dict = {}
    stats: dict = {}
    core_p: dict = {}
    core_s: dict = {}
    if arch == "se_resnext50":
        _conv_b(sd, "conv1.0", core_p, ("stem_conv1",))
        _bn_pair(sd, "conv1.1", core_p, core_s, ("stem_bn1",))
        blocks = (3, 4, 6, 3)
    else:
        for i, idx in enumerate((0, 3, 6)):
            _conv_b(sd, f"conv1.{idx}", core_p, (f"stem_conv{i + 1}",))
            _bn_pair(sd, f"conv1.{idx + 1}", core_p, core_s,
                     (f"stem_bn{i + 1}",))
        blocks = (3, 8, 36, 3)
    for li, src in ((1, "conv2.1"), (2, "conv3"), (3, "conv4"), (4, "conv5")):
        for b in range(blocks[li - 1]):
            base = f"{src}.{b}"
            dst = (f"layer{li}_block{b}",)
            for ci in (1, 2, 3):
                _conv_b(sd, f"{base}.conv{ci}", core_p, dst + (f"conv{ci}",))
                _bn_pair(sd, f"{base}.bn{ci}", core_p, core_s,
                         dst + (f"bn{ci}",))
            _conv_b(sd, f"{base}.se_module.fc1", core_p, dst + ("se", "fc1"))
            _conv_b(sd, f"{base}.se_module.fc2", core_p, dst + ("se", "fc2"))
            if f"{base}.downsample.0.weight" in sd:
                _conv_b(sd, f"{base}.downsample.0", core_p,
                        dst + ("down_conv",))
                _bn_pair(sd, f"{base}.downsample.1", core_p, core_s,
                         dst + ("down_bn",))
    for n in _DEC_CONVS:
        core_p[n] = _conv_relu(sd, n)
    params["core"] = core_p
    stats["core"] = core_s
    params["res"] = {"kernel": _conv(sd["res.weight"]), "bias": sd["res.bias"]}
    return params, stats


def _ln(sd, src, params, dst):
    _set(params, dst + ("scale",), sd[src + ".weight"])
    _set(params, dst + ("bias",), sd[src + ".bias"])


def _lin(sd, src, params, dst, bias=True):
    _set(params, dst + ("kernel",), _linear(sd[src + ".weight"]))
    if bias and src + ".bias" in sd:
        _set(params, dst + ("bias",), sd[src + ".bias"])


def _conv_b(sd, src, params, dst):
    _set(params, dst + ("kernel",), _conv(sd[src + ".weight"]))
    if src + ".bias" in sd:
        _set(params, dst + ("bias",), sd[src + ".bias"])


def convert_changeformer(sd: Dict[str, np.ndarray], v6: bool = True
                         ) -> Tuple[dict, dict]:
    """ChangeFormerV6 (models/ChangeFormer.py:1657-1687) or V1 (:643-674)
    state_dict -> our variables.

    V6 naming: Tenc_x2 (EncoderTransformer_v3: patch_embedN.{proj,norm},
    blockN.i.{norm1, attn.{q,kv,proj,sr,norm}, norm2,
    mlp.{fc1, dwconv.dwconv, fc2}}, normN) and TDec_x2
    (DecoderTransformer_v3: linear_cN.proj, diff_cN Sequential(conv,relu,bn,
    conv,relu), make_pred_cN, linear_fuse Sequential(conv,bn),
    convd2x/convd1x UpsampleConvLayer(ConvTranspose 'conv2d'),
    dense_2x/dense_1x Sequential(ResidualBlock).0.{conv1,conv2}.conv2d,
    change_probability.conv2d).
    V1 naming: Tenc (depths 3/4/6/3; its dead intra-patch
    patch_block/pnorm modules are skipped), convproj
    (convd16x..convd1x + dense_4..dense_1), change_probability.
    ConvTranspose2d weights (in, out, kh, kw) convert with the same
    (2, 3, 1, 0) transpose for flax transpose_kernel=True.
    """
    params: dict = {}
    stats: dict = {}
    depths = (3, 3, 4, 3) if v6 else (3, 4, 6, 3)
    sr_ratios = (8, 4, 2, 1)
    ep = "Tenc_x2" if v6 else "Tenc"
    enc: dict = {}
    for s in range(4):
        pe = f"patch_embed{s + 1}"
        _conv_b(sd, f"{ep}.{pe}.proj", enc, (pe, "proj"))
        _ln(sd, f"{ep}.{pe}.norm", enc, (pe, "norm"))
        for i in range(depths[s]):
            base = f"{ep}.block{s + 1}.{i}"
            dst = (f"block{s + 1}_{i}",)
            _ln(sd, f"{base}.norm1", enc, dst + ("norm1",))
            _ln(sd, f"{base}.norm2", enc, dst + ("norm2",))
            _lin(sd, f"{base}.attn.q", enc, dst + ("attn", "q"))
            _lin(sd, f"{base}.attn.kv", enc, dst + ("attn", "kv"))
            _lin(sd, f"{base}.attn.proj", enc, dst + ("attn", "proj"))
            if sr_ratios[s] > 1:
                _conv_b(sd, f"{base}.attn.sr", enc, dst + ("attn", "sr"))
                _ln(sd, f"{base}.attn.norm", enc, dst + ("attn", "sr_norm"))
            _lin(sd, f"{base}.mlp.fc1", enc, dst + ("mlp", "fc1"))
            _conv_b(sd, f"{base}.mlp.dwconv.dwconv", enc,
                    dst + ("mlp", "dwconv"))
            _lin(sd, f"{base}.mlp.fc2", enc, dst + ("mlp", "fc2"))
        _ln(sd, f"{ep}.norm{s + 1}", enc, (f"norm{s + 1}",))
    params["Tenc"] = enc

    if not v6:
        cp: dict = {}
        for name in ("convd16x", "convd8x", "convd4x", "convd2x", "convd1x"):
            _conv_b(sd, f"convproj.{name}.conv2d", cp, (name, "conv"))
        for name in ("dense_4", "dense_3", "dense_2", "dense_1"):
            _conv_b(sd, f"convproj.{name}.0.conv1.conv2d", cp, (name, "conv1"))
            _conv_b(sd, f"convproj.{name}.0.conv2.conv2d", cp, (name, "conv2"))
        params["convproj"] = cp
        _conv_b(sd, "change_probability.conv2d", params,
                ("change_probability",))
        return params, stats

    dec: dict = {}
    dec_stats: dict = {}
    for tag in ("4", "3", "2", "1"):
        _lin(sd, f"TDec_x2.linear_c{tag}.proj", dec, (f"linear_c{tag}",))
        for mod, pref in ((f"diff_c{tag}", f"TDec_x2.diff_c{tag}"),
                          (f"make_pred_c{tag}", f"TDec_x2.make_pred_c{tag}")):
            _conv_b(sd, f"{pref}.0", dec, (mod, "conv1"))
            _bn_pair(sd, f"{pref}.2", dec, dec_stats, (mod, "bn"))
            _conv_b(sd, f"{pref}.3", dec, (mod, "conv2"))
    _conv_b(sd, "TDec_x2.linear_fuse.0", dec, ("linear_fuse",))
    _bn_pair(sd, "TDec_x2.linear_fuse.1", dec, dec_stats,
             ("linear_fuse_bn",))
    for name in ("convd2x", "convd1x"):
        _conv_b(sd, f"TDec_x2.{name}.conv2d", dec, (name, "conv"))
    for name in ("dense_2x", "dense_1x"):
        _conv_b(sd, f"TDec_x2.{name}.0.conv1.conv2d", dec, (name, "conv1"))
        _conv_b(sd, f"TDec_x2.{name}.0.conv2.conv2d", dec, (name, "conv2"))
    _conv_b(sd, "TDec_x2.change_probability.conv2d", dec,
            ("change_probability",))
    params["TDec"] = dec
    stats["TDec"] = dec_stats
    return params, stats


def convert_xbd_unet_change_transformer(sd: Dict[str, np.ndarray],
                                        bit: bool = False) -> Tuple[dict, dict]:
    """xBD 6-channel UNet_Change_Transformer (zoo/models.py:1094-1226) /
    _BiT (:1228-1368) -> our XBDUNetChangeTransformer variables. The
    non-BiT variant's bottleneck transformer is dead code (its forward
    comments it out) and is skipped."""
    params: dict = {}
    stats: dict = {}
    p_trunk, s_trunk = convert_resnet_trunk(_wrapped_trunk_sd(sd))
    params["resnet"] = p_trunk
    stats["resnet"] = s_trunk
    for tag in ("5", "4", "3", "2"):
        params[f"ca_skip_{tag}"] = {
            "conv1": {"kernel": _conv(sd[f"ca_skip_{tag}.conv1.weight"])}}
    if bit:
        params["ca_bottle_max"] = {
            "fc1": {"kernel": _conv(sd["ca_bottle_max.fc1.weight"])},
            "fc2": {"kernel": _conv(sd["ca_bottle_max.fc2.weight"])},
        }
        _convert_transformer(sd, "transformer", 8, params,
                             ("transformer", "transformer"))
    for n in _DEC_CONVS:
        params[n] = _conv_relu(sd, n)
    params["res"] = {"kernel": _conv(sd["res.weight"]), "bias": sd["res.bias"]}
    return params, stats


_HR_STAGE_CH = {2: (32, 64), 3: (32, 64, 128), 4: (32, 64, 128, 256)}
_HR_STAGE_MODS = {2: 1, 3: 4, 4: 3}


def convert_dual_hrnet(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """DualHRNet state_dict (xBD_code/dual_hrnet.py:323-797, W32 config)
    -> our DualHRNet variables.

    Naming: per stream (loc_net/cls_net) — conv1/bn1/conv2/bn2 stem,
    layer1.{b} Bottlenecks, transitions.{t}.{i} (flat Sequential(conv,bn)
    for channel adaptation, nested chains for new branches),
    stage{s}.{m}.branches.{b}.{k} BasicBlocks and fuse_layers.{i}.{j}
    (conv+bn for coarse->fine, chains for fine->coarse), last_layer.{0,1,3};
    plus the cross-stream fuse_{loc,cls}_stage{1,2,3}.{i} lists.
    """
    params: dict = {}
    stats: dict = {}
    for stream in ("loc_net", "cls_net"):
        sp: dict = {}
        ss: dict = {}
        _conv_b(sd, f"{stream}.conv1", sp, ("conv1",))
        _bn_pair(sd, f"{stream}.bn1", sp, ss, ("bn1",))
        _conv_b(sd, f"{stream}.conv2", sp, ("conv2",))
        _bn_pair(sd, f"{stream}.bn2", sp, ss, ("bn2",))
        for b in range(4):
            base = f"{stream}.layer1.{b}"
            dst = (f"layer1_block{b}",)
            for ci in (1, 2, 3):
                _conv_b(sd, f"{base}.conv{ci}", sp, dst + (f"conv{ci}",))
                _bn_pair(sd, f"{base}.bn{ci}", sp, ss, dst + (f"bn{ci}",))
            if f"{base}.downsample.0.weight" in sd:
                _conv_b(sd, f"{base}.downsample.0", sp, dst + ("down_conv",))
                _bn_pair(sd, f"{base}.downsample.1", sp, ss,
                         dst + ("down_bn",))
        for t in range(3):
            tname = f"transition{t + 1}"
            for i in range(len(_HR_STAGE_CH[t + 2])):
                base = f"{stream}.transitions.{t}.{i}"
                if f"{base}.0.weight" in sd:  # flat channel-adapting conv
                    _conv_b(sd, f"{base}.0", sp, (tname, f"trans{i}_conv"))
                    _bn_pair(sd, f"{base}.1", sp, ss, (tname, f"trans{i}_bn"))
                else:  # new-branch downsample chain (or None: no keys)
                    j = 0
                    while f"{base}.{j}.0.weight" in sd:
                        _conv_b(sd, f"{base}.{j}.0", sp,
                                (tname, f"trans{i}_conv{j}"))
                        _bn_pair(sd, f"{base}.{j}.1", sp, ss,
                                 (tname, f"trans{i}_bn{j}"))
                        j += 1
        for s, chs in _HR_STAGE_CH.items():
            n = len(chs)
            for m in range(_HR_STAGE_MODS[s]):
                mbase = f"{stream}.stage{s}.{m}"
                mdst = (f"stage{s}_m{m}",)
                for b in range(n):
                    for k in range(4):
                        bb = f"{mbase}.branches.{b}.{k}"
                        bd = mdst + (f"branch{b}_block{k}",)
                        for ci in (1, 2):
                            _conv_b(sd, f"{bb}.conv{ci}", sp,
                                    bd + (f"conv{ci}",))
                            _bn_pair(sd, f"{bb}.bn{ci}", sp, ss,
                                     bd + (f"bn{ci}",))
                for i in range(n):
                    for j in range(n):
                        if j == i:
                            continue
                        fb = f"{mbase}.fuse_layers.{i}.{j}"
                        if j > i:
                            _conv_b(sd, f"{fb}.0", sp,
                                    mdst + (f"fuse{i}_{j}_conv",))
                            _bn_pair(sd, f"{fb}.1", sp, ss,
                                     mdst + (f"fuse{i}_{j}_bn",))
                        else:
                            for k in range(i - j):
                                _conv_b(sd, f"{fb}.{k}.0", sp,
                                        mdst + (f"fuse{i}_{j}_conv{k}",))
                                _bn_pair(sd, f"{fb}.{k}.1", sp, ss,
                                         mdst + (f"fuse{i}_{j}_bn{k}",))
        _conv_b(sd, f"{stream}.last_layer.0", sp, ("last_conv1",))
        _bn_pair(sd, f"{stream}.last_layer.1", sp, ss, ("last_bn",))
        _conv_b(sd, f"{stream}.last_layer.3", sp, ("last_conv2",))
        params[stream] = sp
        stats[stream] = ss

    for fuse in ("fuse_loc_stage1", "fuse_loc_stage2", "fuse_loc_stage3",
                 "fuse_cls_stage1", "fuse_cls_stage2", "fuse_cls_stage3"):
        n = len(_HR_STAGE_CH[int(fuse[-1]) + 1])
        fp: dict = {}
        fs: dict = {}
        for i in range(n):
            _conv_b(sd, f"{fuse}.{i}.0", fp, (f"fuse{i}_conv",))
            _bn_pair(sd, f"{fuse}.{i}.1", fp, fs, (f"fuse{i}_bn",))
        params[fuse] = fp
        stats[fuse] = fs

    # Optional USE_FPN branch (dual_hrnet.py:634-663): branch 0 is a flat
    # Sequential(conv, GN, ReLU); branch i>0 nests one Sequential(conv, GN,
    # ReLU, Upsample) per chain step. GroupNorm has no running stats.
    for fpn in ("fpn_loc", "fpn_cls"):
        if f"{fpn}.0.0.weight" not in sd:
            continue
        fp = {}
        _conv_b(sd, f"{fpn}.0.0", fp, ("fpn0_conv",))
        _set(fp, ("fpn0_gn", "scale"), sd[f"{fpn}.0.1.weight"])
        _set(fp, ("fpn0_gn", "bias"), sd[f"{fpn}.0.1.bias"])
        for br in range(1, len(_HR_STAGE_CH[4])):
            for k in range(br):
                _conv_b(sd, f"{fpn}.{br}.{k}.0", fp,
                        (f"fpn{br}_conv{k}",))
                _set(fp, (f"fpn{br}_gn{k}", "scale"),
                     sd[f"{fpn}.{br}.{k}.1.weight"])
                _set(fp, (f"fpn{br}_gn{k}", "bias"),
                     sd[f"{fpn}.{br}.{k}.1.bias"])
        params[fpn] = fp
    return params, stats


def import_reference_checkpoint(path: str, net_g: str):
    """Load a reference .pt and convert by model key. Returns
    {"params": ..., "batch_stats": ...}."""
    sd = state_dict_to_numpy(path)
    if net_g == "newUNetTrans":
        params, stats = convert_dahitra(sd, xbd=False)
    elif net_g in ("xbd_dahitra", "xbd_adapt_dahitra"):
        params, stats = convert_dahitra(sd, xbd=True)
    elif net_g == "base_resnet18":
        params, stats = convert_resnet_cd(sd)
    elif net_g == "siamUnet_conc":
        params, stats = convert_siam_unet_conc(sd)
    elif net_g.startswith("base_transformer"):
        # 'e2d4' must win over 'dd8': base_transformer_pos_s4_dd8_t8_e2d4
        # is enc_depth 2 / dec_depth 4 (networks.py:148-150).
        dec_depth = 4 if "e2d4" in net_g else (8 if "dd8" in net_g else 1)
        enc_depth = 2 if "e2d4" in net_g else 1
        params, stats = convert_bit(sd, enc_depth, dec_depth)
    elif net_g in ("siamUnet", "xbd_res34_double", "xbd_adapt_res34"):
        params, stats = convert_res34_unet(sd, double=True)
    elif net_g in ("xbd_res34_loc", "xbd_res34_single"):
        params, stats = convert_res34_unet(sd, double=False)
    elif net_g == "xbd_res34_double_modified":
        params, stats = convert_res34_double_modified(sd)
    elif net_g == "unet_coupled_trans_256":
        params, stats = convert_unet_change_transformer(sd, two=False)
    elif net_g == "unet_coupled_two_trans_256":
        params, stats = convert_unet_change_transformer(sd, two=True)
    elif net_g in ("changeFormerV6", "changeformerV6"):
        params, stats = convert_changeformer(sd, v6=True)
    elif net_g in ("changeFormer", "changeformer"):
        params, stats = convert_changeformer(sd, v6=False)
    elif net_g in ("xbd_seresnext50_loc", "xbd_seresnext50_double"):
        params, stats = convert_se_unet(sd, "se_resnext50")
    elif net_g in ("xbd_senet154_loc", "xbd_senet154_double"):
        params, stats = convert_se_unet(sd, "senet154")
    elif net_g in ("dual_hrnet", "dual_hrnet_fpn"):
        params, stats = convert_dual_hrnet(sd)
        if net_g == "dual_hrnet_fpn" and "fpn_loc" not in params:
            raise ValueError(
                "checkpoint has no fpn_loc/fpn_cls weights (and its head "
                "is the 480-ch concat, not the 32-ch FPN head) — import "
                "it as --net_G dual_hrnet instead")
    elif net_g == "xbd_unet_change_transformer":
        params, stats = convert_xbd_unet_change_transformer(sd, bit=False)
    elif net_g == "xbd_unet_change_transformer_bit":
        params, stats = convert_xbd_unet_change_transformer(sd, bit=True)
    elif net_g == "xbd_bit":
        # zoo BASE_Transformer (xBD_code/train.py:54-62): 6-ch input split
        # internally, output_nc 5, enc_depth 1, dec_depth 8; weight layout
        # identical to the LEVIR BIT (oracle: tests/test_oracle_parity.py).
        params, stats = convert_bit(sd, enc_depth=1, dec_depth=8)
    elif net_g in ("xbd_dpn92_loc", "xbd_dpn92_double"):
        raise NotImplementedError(
            "the reference's Dpn92 UNets are unconstructable as shipped: "
            "zoo/models.py:256 uses an undefined 'dpn92' symbol (NameError "
            "at construction), so no reference checkpoint of them can "
            "exist to import")
    else:
        raise NotImplementedError(f"no torch importer for {net_g}")
    return {"params": params, "batch_stats": stats}
