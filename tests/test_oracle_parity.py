"""Forward parity against the ACTUAL reference implementation.

The strongest accuracy evidence available in this no-dataset environment:
instantiate the reference torch models (random weights), convert their
state_dicts with core/torch_import.py, and assert our forward outputs match
to ~1e-3 fp32 on fixed inputs. This also de-circularizes the importer tests
(round-1 DAHiTra/BIT import tests round-tripped through our own emitter).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahitra_tpu.core.torch_import import (convert_bit, convert_dahitra,
                                           convert_res34_unet,
                                           convert_unet_change_transformer)
from dahitra_tpu.models import define_g

from ref_oracle import load_reference, sd_numpy, torch_forward_nhwc

pytestmark = pytest.mark.slow  # reference-instantiation + compile heavy


def _apply(net_g, variables, *inputs, img_size=256):
    model = define_g(net_g, img_size=img_size)
    out = model.apply(variables, *[jnp.asarray(x) for x in inputs],
                      train=False)
    if isinstance(out, (list, tuple)):
        return [np.asarray(o) for o in out]
    return np.asarray(out)


def test_bit_forward_parity():
    """BASE_Transformer (networks.py:260-392), 'base_transformer_pos_s4'."""
    import torch

    rn = load_reference().networks
    torch.manual_seed(0)
    net = rn.BASE_Transformer(input_nc=3, output_nc=2, token_len=4,
                              resnet_stages_num=4, with_pos='learned').eval()
    variables = {}
    p, s = convert_bit(sd_numpy(net), enc_depth=1, dec_depth=1)
    variables = {"params": p, "batch_stats": s}
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    b = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    ref = torch_forward_nhwc(net, a, b)
    ours = _apply("base_transformer_pos_s4", variables, a, b, img_size=64)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_bit_dd8_forward_parity():
    """'base_transformer_pos_s4_dd8' (enc_depth 1, dec_depth 8)."""
    import torch

    rn = load_reference().networks
    torch.manual_seed(1)
    net = rn.BASE_Transformer(input_nc=3, output_nc=2, token_len=4,
                              resnet_stages_num=4, with_pos='learned',
                              enc_depth=1, dec_depth=8).eval()
    p, s = convert_bit(sd_numpy(net), enc_depth=1, dec_depth=8)
    rng = np.random.default_rng(1)
    a = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    b = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    ref = torch_forward_nhwc(net, a, b)
    ours = _apply("base_transformer_pos_s4_dd8",
                  {"params": p, "batch_stats": s}, a, b, img_size=64)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_dahitra_forward_parity():
    """BASE_Transformer_UNet (networks.py:1142-1357), 'newUNetTrans'.

    Runs at the reference's native 256px — its decoder pos embeddings are
    sized for 256 inputs (networks.py:1211-1215)."""
    import torch

    rn = load_reference().networks
    torch.manual_seed(2)
    net = rn.BASE_Transformer_UNet(
        input_nc=3, output_nc=2, token_len=4, resnet_stages_num=4,
        with_pos='learned', with_decoder_pos='learned',
        enc_depth=1, dec_depth=8).eval()
    p, s = convert_dahitra(sd_numpy(net), xbd=False)
    rng = np.random.default_rng(2)
    a = rng.normal(size=(1, 256, 256, 3)).astype(np.float32)
    b = rng.normal(size=(1, 256, 256, 3)).astype(np.float32)
    ref = torch_forward_nhwc(net, a, b)
    ours = _apply("newUNetTrans", {"params": p, "batch_stats": s}, a, b)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_xbd_dahitra_forward_parity():
    """xBD BASE_Transformer_UNet (model_transformer_encoding.py:242-449),
    'xbd_dahitra'. Quirks under test: pos embeddings only at the coarsest
    scale AND sourced from the suffix-3 parameters (:358-378); per-date V3
    decoder passes commented out (:394-396).

    The reference hardcodes the coarsest decoder pos embedding for 1024px
    inputs; we shrink that one parameter to 16x16 so the oracle runs at
    256px (same code paths, 20x less CPU)."""
    import torch
    import torch.nn as nn

    from ref_oracle import load_xbd_zoo

    zoo = load_xbd_zoo()
    torch.manual_seed(4)
    net = zoo.model_transformer_encoding.BASE_Transformer_UNet(
        input_nc=3, output_nc=5, token_len=4, resnet_stages_num=4,
        with_pos='learned', with_decoder_pos='learned',
        enc_depth=1, dec_depth=8).eval()
    net.pos_embedding_decoder_3 = nn.Parameter(torch.randn(1, 32, 16, 16))
    p, s = convert_dahitra(sd_numpy(net), xbd=True)
    rng = np.random.default_rng(4)
    x6 = rng.normal(size=(1, 256, 256, 6)).astype(np.float32)
    import torch as _t
    with _t.no_grad():
        ref = net(_t.from_numpy(
            np.transpose(x6, (0, 3, 1, 2)).copy()))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    ours = _apply("xbd_dahitra", {"params": p, "batch_stats": s}, x6,
                  img_size=256)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_unet_change_transformer_forward_parity():
    """UNet_Change_Transformer (networks.py:548-746),
    'unet_coupled_trans_256': channels-as-tokens bottleneck transformer,
    ReLU-ending ChannelAttention_OnBottle, tanh ca_skip fusion."""
    import torch

    rn = load_reference().networks
    torch.manual_seed(5)
    net = rn.UNet_Change_Transformer(pretrained=False).eval()
    p, s = convert_unet_change_transformer(sd_numpy(net), two=False)
    rng = np.random.default_rng(5)
    a = rng.normal(size=(1, 256, 256, 3)).astype(np.float32)
    b = rng.normal(size=(1, 256, 256, 3)).astype(np.float32)
    ref = torch_forward_nhwc(net, a, b)
    ours = _apply("unet_coupled_trans_256", {"params": p, "batch_stats": s},
                  a, b)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_unet_change_two_transformer_forward_parity():
    """UNet_Change_Two_Transformer (networks.py:748-913),
    'unet_coupled_two_trans_256'. The reference's forward references a
    ca_skip_2 its __init__ comments out (:786-787) — AttributeError on every
    call; we graft the module on so the written dataflow can run, exactly
    the minimal fix our implementation documents."""
    import torch

    rn = load_reference().networks
    torch.manual_seed(6)
    net = rn.UNet_Change_Two_Transformer(pretrained=False)
    with pytest.raises(AttributeError):
        with torch.no_grad():
            net(torch.zeros(1, 3, 256, 256), torch.zeros(1, 3, 256, 256))
    torch.manual_seed(60)
    net.ca_skip_2 = rn.ChannelAttention(64, 64)
    net = net.eval()
    p, s = convert_unet_change_transformer(sd_numpy(net), two=True)
    rng = np.random.default_rng(6)
    a = rng.normal(size=(1, 256, 256, 3)).astype(np.float32)
    b = rng.normal(size=(1, 256, 256, 3)).astype(np.float32)
    ref = torch_forward_nhwc(net, a, b)
    ours = _apply("unet_coupled_two_trans_256",
                  {"params": p, "batch_stats": s}, a, b)
    # dim-4096 transformer ops accumulate a bit more fp32 noise
    np.testing.assert_allclose(ours, ref, atol=6e-4, rtol=1e-3)


def test_changeformer_v6_forward_parity():
    """ChangeFormerV6 (models/ChangeFormer.py:1657-1687): SegFormer encoder
    (SR attention, Mix-FFN), diff decoder with multi-scale heads. Compares
    every logit scale in the returned list."""
    import torch

    load_reference()
    from models.ChangeFormer import ChangeFormerV6

    torch.manual_seed(7)
    net = ChangeFormerV6(output_nc=2).eval()
    from dahitra_tpu.core.torch_import import convert_changeformer

    p, s = convert_changeformer(sd_numpy(net), v6=True)
    rng = np.random.default_rng(7)
    a = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    b = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    refs = torch_forward_nhwc(net, a, b)
    ours = _apply("changeFormerV6", {"params": p, "batch_stats": s}, a, b,
                  img_size=64)
    assert len(ours) == len(refs) == 5
    for o, r in zip(ours, refs):
        np.testing.assert_allclose(o, r, atol=3e-4, rtol=1e-3)


def test_changeformer_v1_forward_parity():
    """ChangeFormerV1 (models/ChangeFormer.py:643-674): base encoder
    (depths 3/4/6/3), |f1-f2| per scale, conv-projection ladder."""
    import torch

    load_reference()
    from models.ChangeFormer import ChangeFormerV1

    torch.manual_seed(8)
    net = ChangeFormerV1(output_nc=2).eval()
    from dahitra_tpu.core.torch_import import convert_changeformer

    p, s = convert_changeformer(sd_numpy(net), v6=False)
    rng = np.random.default_rng(8)
    a = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    b = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    ref = torch_forward_nhwc(net, a, b)
    ours = _apply("changeFormer", {"params": p, "batch_stats": s}, a, b,
                  img_size=64)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_seresnext50_unet_loc_forward_parity():
    """SeResNext50_Unet_Loc (zoo/models.py:72-148): grouped bottlenecks,
    SE modules, 1x1 downsamples."""
    import torch

    from ref_oracle import load_xbd_zoo

    zoo = load_xbd_zoo()
    from dahitra_tpu.core.torch_import import convert_se_unet

    torch.manual_seed(9)
    net = zoo.models.SeResNext50_Unet_Loc(pretrained=False).eval()
    p, s = convert_se_unet(sd_numpy(net), "se_resnext50")
    rng = np.random.default_rng(9)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    ref = torch_forward_nhwc(net, x)
    ours = _apply("xbd_seresnext50_loc", {"params": p, "batch_stats": s}, x,
                  img_size=64)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_senet154_unet_double_forward_parity():
    """SeNet154_Unet_Double (zoo/models.py:649-722): 3-conv stem, groups-64
    bottlenecks, 3x3 downsamples (1x1 at layer1)."""
    import torch

    from ref_oracle import load_xbd_zoo

    zoo = load_xbd_zoo()
    from dahitra_tpu.core.torch_import import convert_se_unet

    import torch.nn as nn

    torch.manual_seed(10)
    net = zoo.models.SeNet154_Unet_Double(pretrained=False).eval()
    # With random weights and eval-mode BN (running var 1) the 36-block
    # layer3 amplifies activations to ~1e5 and fp32 rounding diverges
    # chaotically (verified: per-block rel error starts at 4e-6 and only
    # compounds). Damp the convs so activations stay O(1); the wiring test
    # is unchanged.
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.mul_(0.3)
    p, s = convert_se_unet(sd_numpy(net), "senet154")
    rng = np.random.default_rng(10)
    x6 = rng.normal(size=(1, 64, 64, 6)).astype(np.float32)
    ref = torch_forward_nhwc(net, x6)
    ours = _apply("xbd_senet154_double", {"params": p, "batch_stats": s}, x6,
                  img_size=64)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_res34_unet_double_forward_parity():
    """Res34_Unet_Double (networks.py:1360-1440 = zoo/models.py:565-646),
    the LEVIR 'siamUnet' key / xBD 'xbd_res34_double'."""
    import torch

    rn = load_reference().networks
    torch.manual_seed(3)
    net = rn.Res34_Unet_Double(pretrained=False).eval()
    p, s = convert_res34_unet(sd_numpy(net), double=True)
    rng = np.random.default_rng(3)
    x6 = rng.normal(size=(1, 64, 64, 6)).astype(np.float32)
    # The LEVIR copy takes (x1, x2); the zoo copy takes one 6-channel tensor
    # (x[:, :3]/x[:, 3:]) — identical math, so one oracle covers both keys.
    ref = torch_forward_nhwc(net, x6[..., :3], x6[..., 3:])
    ours = _apply("xbd_res34_double", {"params": p, "batch_stats": s}, x6,
                  img_size=64)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)
