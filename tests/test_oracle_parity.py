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


def test_base_resnet18_forward_parity():
    """ResNet change detector (networks.py:176-257), 'base_resnet18'."""
    import torch

    rn = load_reference().networks
    from dahitra_tpu.core.torch_import import convert_resnet_cd

    torch.manual_seed(18)
    net = rn.ResNet(input_nc=3, output_nc=2, output_sigmoid=False).eval()
    p, s = convert_resnet_cd(sd_numpy(net))
    rng = np.random.default_rng(18)
    a = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    b = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    ref = torch_forward_nhwc(net, a, b)
    ours = _apply("base_resnet18", {"params": p, "batch_stats": s}, a, b,
                  img_size=64)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_siam_unet_conc_forward_parity():
    """SiamUnet_conc (networks.py:916-1082), 'siamUnet_conc' — incl. the
    flipped-kernel conversion of its stride-1 ConvTranspose decoders."""
    import torch

    rn = load_reference().networks
    from dahitra_tpu.core.torch_import import convert_siam_unet_conc

    torch.manual_seed(19)
    net = rn.SiamUnet_conc(input_nbr=3, label_nbr=2).eval()
    p, s = convert_siam_unet_conc(sd_numpy(net))
    rng = np.random.default_rng(19)
    a = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    b = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    ref = torch_forward_nhwc(net, a, b)
    ours = _apply("siamUnet_conc", {"params": p, "batch_stats": s}, a, b,
                  img_size=64)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


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


def test_dual_hrnet_forward_parity():
    """DualHRNet (xBD_code/dual_hrnet.py:554-797, W32 yaml): two streams,
    per-stage cross-stream fusion, split loc/cls heads at 1/4 res."""
    import torch

    from ref_oracle import load_dual_hrnet

    dh, cfg = load_dual_hrnet()
    from dahitra_tpu.core.torch_import import convert_dual_hrnet

    torch.manual_seed(11)
    net = dh.get_model(cfg).eval()
    p, s = convert_dual_hrnet(sd_numpy(net))
    rng = np.random.default_rng(11)
    x6 = rng.normal(size=(1, 64, 64, 6)).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x6, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        ref = net(xt)
    model = define_g("dual_hrnet")
    ours = model.apply({"params": p, "batch_stats": s}, jnp.asarray(x6),
                       train=False)
    for key in ("loc", "cls"):
        r = np.transpose(ref[key].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(ours[key]), r,
                                   atol=3e-4, rtol=1e-3)

    # A non-FPN checkpoint must be REJECTED under --net_G dual_hrnet_fpn
    # (silently dropping the missing fpn trees would crash later, deep in
    # flax, with an opaque 480-vs-32 head mismatch).
    import tempfile

    from dahitra_tpu.core.torch_import import import_reference_checkpoint

    with tempfile.NamedTemporaryFile(suffix=".pt") as f:
        torch.save(net.state_dict(), f.name)
        with pytest.raises(ValueError, match="fpn"):
            import_reference_checkpoint(f.name, "dual_hrnet_fpn")


def test_dual_hrnet_fpn_forward_parity():
    """The USE_FPN branch (dual_hrnet.py:634-663, :706-711). Shipped yaml
    turns it off, and with it on the reference CRASHES: mask_last_layer()
    sizes the head for the 480-ch stage-4 concat while the FPN emits 32 ch
    (dual_hrnet.py:384-402 vs :597-598). The minimal fix — a 32-ch head via
    mask_last_layer(32) — is applied to the torch oracle here, mirroring
    models/dual_hrnet.py's head_width."""
    import torch

    from ref_oracle import load_dual_hrnet

    dh, cfg = load_dual_hrnet()
    from dahitra_tpu.core.torch_import import convert_dual_hrnet

    cfg.MODEL.USE_FPN = True
    torch.manual_seed(13)
    net = dh.get_model(cfg)
    net.loc_net.mask_last_layer(32)
    net.cls_net.mask_last_layer(32)
    net = net.eval()
    p, s = convert_dual_hrnet(sd_numpy(net))
    assert "fpn_loc" in p and "fpn_cls" in p
    rng = np.random.default_rng(13)
    x6 = rng.normal(size=(1, 64, 64, 6)).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x6, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        ref = net(xt)
    model = define_g("dual_hrnet_fpn")
    ours = model.apply({"params": p, "batch_stats": s}, jnp.asarray(x6),
                       train=False)
    for key in ("loc", "cls"):
        r = np.transpose(ref[key].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(ours[key]), r,
                                   atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("bit", [False, True])
def test_xbd_unet_change_transformer_forward_parity(bit):
    """xBD UNet_Change_Transformer (zoo/models.py:1094-1226) and _BiT
    (:1228-1368) at their native 256px crop size (the BiT bottleneck
    transformer hardcodes dim 64 = (256/32)^2). Quirks under test: ca fusion
    at every skip, ca_skip_2 reused for the finest skip, dead bottleneck
    transformer in the plain variant."""
    import torch

    from ref_oracle import load_xbd_zoo

    zoo = load_xbd_zoo()
    from dahitra_tpu.core.torch_import import (
        convert_xbd_unet_change_transformer)

    torch.manual_seed(12 + bit)
    if bit:
        cls = zoo.models.UNet_Change_Transformer_BiT
    else:
        # The plain variant only exists inside a module-level triple-quoted
        # string (zoo/models.py:1036-1226) — dead code; the predictor even
        # imports _BiT but calls UNet_Change_Transformer() (NameError,
        # predict_test_cls.py:21,41). Exec the commented block to get the
        # strongest oracle available for our reconstruction of it.
        import ast
        import inspect

        src = open("/root/reference/xBD_code/zoo/models.py").read()
        block = next(n for n in ast.walk(ast.parse(src))
                     if isinstance(n, ast.Expr)
                     and isinstance(n.value, ast.Constant)
                     and isinstance(n.value.value, str)
                     and "class UNet_Change_Transformer(" in n.value.value)
        ns = vars(zoo.models)
        exec(block.value.value, ns)  # noqa: S102 — test-only oracle
        cls = ns["UNet_Change_Transformer"]
    net = cls(pretrained=False).eval()
    p, s = convert_xbd_unet_change_transformer(sd_numpy(net), bit=bit)
    rng = np.random.default_rng(12 + bit)
    x6 = rng.normal(size=(1, 256, 256, 6)).astype(np.float32)
    ref = torch_forward_nhwc(net, x6)
    key = ("xbd_unet_change_transformer_bit" if bit
           else "xbd_unet_change_transformer")
    ours = _apply(key, {"params": p, "batch_stats": s}, x6, img_size=256)
    # the BiT bottleneck transformer (depth 8, mlp 4096) accumulates a bit
    # more fp32 noise
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_res34_unet_loc_single_double_modified_parity():
    """Res34_Unet_Loc (zoo/models.py:491-563), Res34_Unet_Single (:320-393)
    and Res34_Unet_Double_Modified (:854-991) in one session."""
    import torch

    from ref_oracle import load_xbd_zoo

    zoo = load_xbd_zoo()
    from dahitra_tpu.core.torch_import import convert_res34_double_modified

    rng = np.random.default_rng(14)
    x3 = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    x6 = rng.normal(size=(1, 64, 64, 6)).astype(np.float32)

    torch.manual_seed(14)
    net = zoo.models.Res34_Unet_Loc(pretrained=False).eval()
    p, s = convert_res34_unet(sd_numpy(net), double=False)
    np.testing.assert_allclose(
        _apply("xbd_res34_loc", {"params": p, "batch_stats": s}, x3,
               img_size=64),
        torch_forward_nhwc(net, x3), atol=3e-4, rtol=1e-3)

    torch.manual_seed(15)
    net = zoo.models.Res34_Unet_Single(pretrained=False).eval()
    p, s = convert_res34_unet(sd_numpy(net), double=False)
    # Single takes a 4-channel input (its stem is a fresh Conv2d(4, 64),
    # zoo/models.py:342-345).
    x4 = rng.normal(size=(1, 64, 64, 4)).astype(np.float32)
    np.testing.assert_allclose(
        _apply("xbd_res34_single", {"params": p, "batch_stats": s}, x4,
               img_size=64),
        torch_forward_nhwc(net, x4), atol=3e-4, rtol=1e-3)

    torch.manual_seed(16)
    net = zoo.models.Res34_Unet_Double_Modified(pretrained=False).eval()
    p, s = convert_res34_double_modified(sd_numpy(net))
    np.testing.assert_allclose(
        _apply("xbd_res34_double_modified", {"params": p, "batch_stats": s},
               x6, img_size=64),
        torch_forward_nhwc(net, x6), atol=3e-4, rtol=1e-3)


def test_xbd_bit_forward_parity():
    """The zoo BASE_Transformer (zoo/models.py:1447-1584) as used by
    train.py:54-55 ('BiT': output_nc 5, token_len 4, stages 4, learned pos,
    enc_depth 1, dec_depth 8)."""
    import torch

    from ref_oracle import load_xbd_zoo

    zoo = load_xbd_zoo()
    torch.manual_seed(17)
    net = zoo.models.BASE_Transformer(
        input_nc=3, output_nc=5, token_len=4, resnet_stages_num=4,
        with_pos='learned', enc_depth=1, dec_depth=8).eval()
    p, s = convert_bit(sd_numpy(net), enc_depth=1, dec_depth=8)
    rng = np.random.default_rng(17)
    x6 = rng.normal(size=(1, 64, 64, 6)).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x6, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        ref = net(xt)  # the zoo copy takes one 6-channel tensor (:1549-1552)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    ours = _apply("xbd_bit", {"params": p, "batch_stats": s}, x6,
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


def test_bit_t8_e2d4_forward_parity_via_import_dispatch():
    """'base_transformer_pos_s4_dd8_t8_e2d4' (networks.py:148-150: token_len
    8, enc_depth 2, dec_depth 4, decoder_dim_head 8). Regression for the
    importer's key parsing: 'e2d4' must override the 'dd8' substring."""
    import tempfile

    import torch

    from dahitra_tpu.core.torch_import import import_reference_checkpoint

    rn = load_reference().networks
    torch.manual_seed(2)
    net = rn.BASE_Transformer(input_nc=3, output_nc=2, token_len=8,
                              resnet_stages_num=4, with_pos='learned',
                              enc_depth=2, dec_depth=4,
                              decoder_dim_head=8).eval()
    with tempfile.NamedTemporaryFile(suffix=".pt") as f:
        torch.save(net.state_dict(), f.name)
        variables = import_reference_checkpoint(
            f.name, "base_transformer_pos_s4_dd8_t8_e2d4")
    rng = np.random.default_rng(2)
    a = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    b = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    ref = torch_forward_nhwc(net, a, b)
    ours = _apply("base_transformer_pos_s4_dd8_t8_e2d4", variables, a, b,
                  img_size=64)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)
