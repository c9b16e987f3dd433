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


def convert_res34_unet(sd: Dict[str, np.ndarray], double: bool = True
                       ) -> Tuple[dict, dict]:
    """Res34_Unet_Loc/Double state_dict -> our Res34UnetLoc/Double variables.

    Reference naming (xBD_code/zoo/models.py:491-646): the trunk is wrapped
    as conv1=Sequential(conv, bn, relu) ('conv1.0/conv1.1'),
    conv2=Sequential(maxpool, layer1) ('conv2.1.<block>'), conv3..5 =
    layer2..4; decoder ConvRelu blocks are Sequential(conv, relu)
    ('convN.layer.0'); head is 'res'.
    """
    params: dict = {}
    stats: dict = {}

    trunk_sd = {"conv1.weight": sd["conv1.0.weight"]}
    for suf in ("weight", "bias", "running_mean", "running_var"):
        trunk_sd[f"bn1.{suf}"] = sd[f"conv1.1.{suf}"]
    for li, src in ((1, "conv2.1"), (2, "conv3"), (3, "conv4"), (4, "conv5")):
        for k, v in sd.items():
            if k.startswith(src + "."):
                trunk_sd[f"layer{li}." + k[len(src) + 1:]] = v
    p_trunk, s_trunk = convert_resnet_trunk(trunk_sd)
    core_p: dict = {"resnet": p_trunk}
    core_s: dict = {"resnet": s_trunk}
    for n in ("conv6", "conv6_2", "conv7", "conv7_2", "conv8", "conv8_2",
              "conv9", "conv9_2", "conv10"):
        core_p[n] = {"conv": {"kernel": _conv(sd[f"{n}.layer.0.weight"]),
                              "bias": sd[f"{n}.layer.0.bias"]}}
    params["core"] = core_p
    stats["core"] = core_s
    params["res"] = {"kernel": _conv(sd["res.weight"]), "bias": sd["res.bias"]}
    return params, stats


def import_reference_checkpoint(path: str, net_g: str):
    """Load a reference .pt and convert by model key. Returns
    {"params": ..., "batch_stats": ...}."""
    sd = state_dict_to_numpy(path)
    if net_g == "newUNetTrans":
        params, stats = convert_dahitra(sd, xbd=False)
    elif net_g == "xbd_dahitra":
        params, stats = convert_dahitra(sd, xbd=True)
    elif net_g.startswith("base_transformer"):
        dec_depth = 8 if "dd8" in net_g else (4 if "e2d4" in net_g else 1)
        enc_depth = 2 if "e2d4" in net_g else 1
        params, stats = convert_bit(sd, enc_depth, dec_depth)
    elif net_g in ("siamUnet", "xbd_res34_double", "xbd_adapt_res34"):
        params, stats = convert_res34_unet(sd, double=True)
    elif net_g == "xbd_res34_loc":
        params, stats = convert_res34_unet(sd, double=False)
    else:
        raise NotImplementedError(f"no torch importer for {net_g}")
    return {"params": params, "batch_stats": stats}
