"""Torch checkpoint importer tests.

The resnet-trunk import is verified functionally: a generic torch forward
driven by a synthetic torchvision-style state_dict must match our
ResNetTrunk with converted weights. The DAHiTra/BIT converters are verified
by round-trip: a reference-named state_dict synthesized from our param tree
converts back to the identical tree.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dahitra_tpu.core.torch_import import (convert_bit, convert_dahitra,

                                           convert_resnet_trunk)


pytestmark = pytest.mark.slow  # compile-heavy


def make_resnet18_state_dict(seed=0):
    """Synthetic torchvision-resnet18 state_dict (random weights)."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = (rng.normal(size=(o, i, k, k)) * 0.05).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = [(64, 64), (128, 64), (256, 128), (512, 256)]
    for li, (c_out, c_in) in enumerate(chans, start=1):
        for bi in range(2):
            cin = c_in if bi == 0 else c_out
            conv(f"layer{li}.{bi}.conv1", c_out, cin, 3)
            bn(f"layer{li}.{bi}.bn1", c_out)
            conv(f"layer{li}.{bi}.conv2", c_out, c_out, 3)
            bn(f"layer{li}.{bi}.bn2", c_out)
            if bi == 0 and c_in != c_out:
                conv(f"layer{li}.{bi}.downsample.0", c_out, cin, 1)
                bn(f"layer{li}.{bi}.downsample.1", c_out)
    return sd


def torch_trunk_forward(sd, x, strides=(1, 2, 2, 2)):
    """Generic eval-mode resnet-basicblock forward driven by a state_dict."""

    def bn(name, t):
        return F.batch_norm(t, torch.tensor(sd[name + ".running_mean"]),
                            torch.tensor(sd[name + ".running_var"]),
                            torch.tensor(sd[name + ".weight"]),
                            torch.tensor(sd[name + ".bias"]), False, 0.0, 1e-5)

    t = F.conv2d(x, torch.tensor(sd["conv1.weight"]), stride=2, padding=3)
    t = F.relu(bn("bn1", t))
    t = F.max_pool2d(t, 3, 2, 1)
    for li, stride in enumerate(strides, start=1):
        for bi in range(2):
            src = f"layer{li}.{bi}"
            s = stride if bi == 0 else 1
            idn = t
            y = F.conv2d(t, torch.tensor(sd[src + ".conv1.weight"]),
                         stride=s, padding=1)
            y = F.relu(bn(src + ".bn1", y))
            y = F.conv2d(y, torch.tensor(sd[src + ".conv2.weight"]), padding=1)
            y = bn(src + ".bn2", y)
            if src + ".downsample.0.weight" in sd:
                idn = F.conv2d(t, torch.tensor(sd[src + ".downsample.0.weight"]),
                               stride=s)
                idn = bn(src + ".downsample.1", idn)
            t = F.relu(y + idn)
    return t


def test_trunk_import_functional_parity():
    from dahitra_tpu.nn.resnet import ResNetTrunk

    sd = make_resnet18_state_dict()
    params, stats = convert_resnet_trunk(sd)
    trunk = ResNetTrunk(backbone="resnet18",
                        replace_stride_with_dilation=(False, True, True))
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    ours = trunk.apply({"params": params, "batch_stats": stats},
                       jnp.array(x), False, 4)
    # replace_stride_with_dilation=(F,T,T) -> strides (1, 2, 1, 1).
    ref = torch_trunk_forward(sd, torch.tensor(x).permute(0, 3, 1, 2),
                              strides=(1, 2, 1, 1))
    # atol 5e-3: the s2d stem rewrite reassociates the 7x7 contraction
    # (exact-zero taps added), and through 4 stages of ReLU/residuals a
    # single near-zero activation can drift ~4e-3 absolute.
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-3, atol=5e-3)


def _emit_reference_names(params, stats):
    """Invert our DAHiTra param tree into a reference-named state_dict."""
    sd = {}

    def conv_inv(w):
        return np.transpose(np.asarray(w), (3, 2, 0, 1))

    def lin_inv(w):
        return np.transpose(np.asarray(w), (1, 0))

    # Trunk.
    tp, ts = params["resnet"], stats["resnet"]
    sd["resnet.conv1.weight"] = conv_inv(tp["conv1"]["kernel"])
    for bnn, dst in [("bn1", ("bn1",))]:
        sd["resnet.bn1.weight"] = np.asarray(tp["bn1"]["scale"])
        sd["resnet.bn1.bias"] = np.asarray(tp["bn1"]["bias"])
        sd["resnet.bn1.running_mean"] = np.asarray(ts["bn1"]["mean"])
        sd["resnet.bn1.running_var"] = np.asarray(ts["bn1"]["var"])
    for li in range(1, 5):
        lname = f"layer{li}"
        if lname not in tp:
            continue
        for bname, bp in tp[lname].items():
            bi = bname.replace("block", "")
            base = f"resnet.layer{li}.{bi}"
            for ci in ("conv1", "conv2"):
                sd[f"{base}.{ci}.weight"] = conv_inv(bp[ci]["kernel"])
            for bnn in ("bn1", "bn2"):
                st = ts[lname][bname][bnn]
                sd[f"{base}.{bnn}.weight"] = np.asarray(bp[bnn]["scale"])
                sd[f"{base}.{bnn}.bias"] = np.asarray(bp[bnn]["bias"])
                sd[f"{base}.{bnn}.running_mean"] = np.asarray(st["mean"])
                sd[f"{base}.{bnn}.running_var"] = np.asarray(st["var"])
            if "down_conv" in bp:
                sd[f"{base}.downsample.0.weight"] = conv_inv(bp["down_conv"]["kernel"])
                st = ts[lname][bname]["down_bn"]
                sd[f"{base}.downsample.1.weight"] = np.asarray(bp["down_bn"]["scale"])
                sd[f"{base}.downsample.1.bias"] = np.asarray(bp["down_bn"]["bias"])
                sd[f"{base}.downsample.1.running_mean"] = np.asarray(st["mean"])
                sd[f"{base}.downsample.1.running_var"] = np.asarray(st["var"])

    # Transformer scales.
    for ours, ref, enc_d, dec_d in [("trans_5", "5", 1, 4), ("trans_4", "4", 1, 4),
                                    ("trans_3", "3", 1, 8)]:
        sp = params[ours]
        sd[f"conv_squeeze_{ref}.0.weight"] = conv_inv(sp["conv_squeeze"]["kernel"])
        sd[f"conv_token_{ref}.weight"] = conv_inv(sp["tokenizer"]["conv_token"]["kernel"])
        sd[f"conv_decode_{ref}.weight"] = conv_inv(sp["conv_decode"]["kernel"])
        if "pos_embedding" in sp:
            sd[f"pos_embedding_{ref}"] = np.asarray(sp["pos_embedding"])
        if "pos_embedding_decoder" in sp:
            sd[f"pos_embedding_decoder_{ref}"] = np.transpose(
                np.asarray(sp["pos_embedding_decoder"]), (0, 3, 1, 2))
        for i in range(enc_d):
            tpre = f"transformer_{ref}.layers.{i}"
            tr = sp["transformer"]
            sd[f"{tpre}.0.fn.norm.weight"] = np.asarray(tr[f"attn_norm_{i}"]["scale"])
            sd[f"{tpre}.0.fn.norm.bias"] = np.asarray(tr[f"attn_norm_{i}"]["bias"])
            sd[f"{tpre}.0.fn.fn.to_qkv.weight"] = lin_inv(tr[f"attn_{i}"]["to_qkv"]["kernel"])
            sd[f"{tpre}.0.fn.fn.to_out.0.weight"] = lin_inv(tr[f"attn_{i}"]["to_out"]["kernel"])
            sd[f"{tpre}.0.fn.fn.to_out.0.bias"] = np.asarray(tr[f"attn_{i}"]["to_out"]["bias"])
            sd[f"{tpre}.1.fn.norm.weight"] = np.asarray(tr[f"ff_norm_{i}"]["scale"])
            sd[f"{tpre}.1.fn.norm.bias"] = np.asarray(tr[f"ff_norm_{i}"]["bias"])
            sd[f"{tpre}.1.fn.fn.net.0.weight"] = lin_inv(tr[f"ff_{i}"]["fc1"]["kernel"])
            sd[f"{tpre}.1.fn.fn.net.0.bias"] = np.asarray(tr[f"ff_{i}"]["fc1"]["bias"])
            sd[f"{tpre}.1.fn.fn.net.3.weight"] = lin_inv(tr[f"ff_{i}"]["fc2"]["kernel"])
            sd[f"{tpre}.1.fn.fn.net.3.bias"] = np.asarray(tr[f"ff_{i}"]["fc2"]["bias"])
        for i in range(dec_d):
            dpre = f"transformer_decoder_{ref}.layers.{i}"
            de = sp["decoder"]
            sd[f"{dpre}.0.fn.norm.weight"] = np.asarray(de[f"attn_norm_{i}"]["scale"])
            sd[f"{dpre}.0.fn.norm.bias"] = np.asarray(de[f"attn_norm_{i}"]["bias"])
            for t in ("to_q", "to_k", "to_v"):
                sd[f"{dpre}.0.fn.fn.{t}.weight"] = lin_inv(de[f"attn_{i}"][t]["kernel"])
            sd[f"{dpre}.0.fn.fn.to_out.0.weight"] = lin_inv(de[f"attn_{i}"]["to_out"]["kernel"])
            sd[f"{dpre}.0.fn.fn.to_out.0.bias"] = np.asarray(de[f"attn_{i}"]["to_out"]["bias"])
            sd[f"{dpre}.1.fn.norm.weight"] = np.asarray(de[f"ff_norm_{i}"]["scale"])
            sd[f"{dpre}.1.fn.norm.bias"] = np.asarray(de[f"ff_norm_{i}"]["bias"])
            sd[f"{dpre}.1.fn.fn.net.0.weight"] = lin_inv(de[f"ff_{i}"]["fc1"]["kernel"])
            sd[f"{dpre}.1.fn.fn.net.0.bias"] = np.asarray(de[f"ff_{i}"]["fc1"]["bias"])
            sd[f"{dpre}.1.fn.fn.net.3.weight"] = lin_inv(de[f"ff_{i}"]["fc2"]["kernel"])
            sd[f"{dpre}.1.fn.fn.net.3.bias"] = np.asarray(de[f"ff_{i}"]["fc2"]["bias"])

    # Heads.
    sd["conv_layer2_0.0.weight"] = conv_inv(params["conv_layer2_0"]["conv1"]["kernel"])
    st = stats["conv_layer2_0"]["bn"]
    sd["conv_layer2_0.1.weight"] = np.asarray(params["conv_layer2_0"]["bn"]["scale"])
    sd["conv_layer2_0.1.bias"] = np.asarray(params["conv_layer2_0"]["bn"]["bias"])
    sd["conv_layer2_0.1.running_mean"] = np.asarray(st["mean"])
    sd["conv_layer2_0.1.running_var"] = np.asarray(st["var"])
    sd["conv_layer2_0.3.weight"] = conv_inv(params["conv_layer2_0"]["conv2"]["kernel"])
    sd["conv_layer2_0.3.bias"] = np.asarray(params["conv_layer2_0"]["conv2"]["bias"])
    for n in ("conv_layer2", "conv_layer3", "conv_layer4"):
        sd[f"{n}.0.weight"] = conv_inv(params[n]["kernel"])
        sd[f"{n}.0.bias"] = np.asarray(params[n]["bias"])
    sd["classifier.weight"] = conv_inv(params["classifier"]["kernel"])
    sd["classifier.bias"] = np.asarray(params["classifier"]["bias"])
    return sd


def test_dahitra_import_round_trip():
    from dahitra_tpu.models import DAHiTraUNet

    model = DAHiTraUNet(output_nc=2, img_size=64)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, True))(key, x, x)
    params0 = jax.device_get(variables["params"])
    stats0 = jax.device_get(variables["batch_stats"])

    sd = _emit_reference_names(params0, stats0)
    params1, stats1 = convert_dahitra(sd)

    # Trees must match leaf-for-leaf.
    flat0 = jax.tree_util.tree_leaves_with_path(params0)
    flat1dict = dict(jax.tree_util.tree_leaves_with_path(params1))
    assert len(flat0) == len(flat1dict)
    for path, leaf in flat0:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat1dict[path]),
                                   atol=1e-6, err_msg=str(path))
    # Imported model must run.
    out = model.apply({"params": params1, "batch_stats": stats1}, x, x, False)
    assert out.shape == (1, 64, 64, 2)


def test_res34_unet_import_loads_and_runs():
    """Synthetic Res34_Unet_Loc-style state_dict converts into a runnable
    Res34UnetLoc (xBD_code/zoo/models.py:491-563 naming)."""
    from dahitra_tpu.core.torch_import import convert_res34_unet
    from dahitra_tpu.models.res34_unet import Res34UnetLoc

    rng = np.random.default_rng(7)
    sd = {}

    def conv(name, o, i, k, bias=False):
        sd[name + ".weight"] = (rng.normal(size=(o, i, k, k)) * 0.05).astype(np.float32)
        if bias:
            sd[name + ".bias"] = rng.normal(size=o).astype(np.float32) * 0.1

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1.0", 64, 3, 7)
    bn("conv1.1", 64)
    # resnet34 layers: sizes (3, 4, 6, 3).
    plan = [("conv2.1", 64, 64, 3), ("conv3", 128, 64, 4),
            ("conv4", 256, 128, 6), ("conv5", 512, 256, 3)]
    for src, c_out, c_in, blocks in plan:
        for bi in range(blocks):
            cin = c_in if bi == 0 else c_out
            conv(f"{src}.{bi}.conv1", c_out, cin, 3)
            bn(f"{src}.{bi}.bn1", c_out)
            conv(f"{src}.{bi}.conv2", c_out, c_out, 3)
            bn(f"{src}.{bi}.bn2", c_out)
            if bi == 0 and cin != c_out:
                conv(f"{src}.{bi}.downsample.0", c_out, cin, 1)
                bn(f"{src}.{bi}.downsample.1", c_out)
    dec = [("conv6", 320, 512), ("conv6_2", 320, 320 + 256),
           ("conv7", 160, 320), ("conv7_2", 160, 160 + 128),
           ("conv8", 96, 160), ("conv8_2", 96, 96 + 64),
           ("conv9", 64, 96), ("conv9_2", 64, 64 + 64),
           ("conv10", 48, 64)]
    for name, o, i in dec:
        conv(f"{name}.layer.0", o, i, 3, bias=True)
    conv("res", 1, 48, 1, bias=True)

    params, stats = convert_res34_unet(sd, double=False)
    model = Res34UnetLoc()
    x = jnp.zeros((1, 64, 64, 3))
    out = model.apply({"params": params, "batch_stats": stats}, x, False)
    assert out.shape == (1, 64, 64, 1)
    # All keys consumed into a tree the model accepts without re-init.
    assert np.isfinite(np.asarray(out)).all()


def test_state_dict_to_numpy_unwraps_and_strips_prefix(tmp_path):
    """The reference saves either {model_G_state_dict: ...}
    (models/trainer.py:150-158) or {state_dict: ...} with DataParallel's
    'module.' prefix (xBD_code/train.py:298-303, :450-456); the loader
    must unwrap both and strip the prefix."""
    from dahitra_tpu.core.torch_import import state_dict_to_numpy

    w = torch.arange(6, dtype=torch.float32).reshape(2, 3)
    for wrapper, prefix in (("model_G_state_dict", ""),
                            ("state_dict", "module."),
                            (None, "")):
        inner = {prefix + "lin.weight": w}
        ckpt = inner if wrapper is None else {wrapper: inner, "epoch": 3}
        p = tmp_path / f"{wrapper}.pt"
        torch.save(ckpt, str(p))
        out = state_dict_to_numpy(str(p))
        assert list(out) == ["lin.weight"]
        np.testing.assert_array_equal(out["lin.weight"], w.numpy())
