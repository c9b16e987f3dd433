"""Model registry — the TPU rebuild of ``define_G`` (models/networks.py:130-168).

Keys match the reference's ``--net_G`` flags 1:1 so existing run recipes
(scripts/run_cd.sh) port unchanged. Each entry returns an un-initialized
flax module; initialize with ``model.init(key, a, b)`` on NHWC inputs.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from dahitra_tpu.models.bit import BIT
from dahitra_tpu.models.changeformer import ChangeFormerV1, ChangeFormerV6
from dahitra_tpu.models.dual_hrnet import DualHRNet
from dahitra_tpu.models.dahitra import DAHiTraUNet
from dahitra_tpu.models.res34_unet import Res34UnetDouble, Res34UnetLoc
from dahitra_tpu.models.resnet_cd import ResNetCD
from dahitra_tpu.models.siam_unet_conc import SiamUnetConc
from dahitra_tpu.models.unet_change_transformer import (
    UNetChangeTransformer, UNetChangeTwoTransformer)

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


@register("base_resnet18")
def _base_resnet18(dtype=jnp.float32, **kw):
    return ResNetCD(output_nc=2, dtype=dtype)


@register("base_transformer_pos_s4")
def _bit_s4(dtype=jnp.float32, **kw):
    return BIT(output_nc=2, token_len=4, resnet_stages_num=4, dtype=dtype)


@register("base_transformer_pos_s4_dd8")
def _bit_s4_dd8(dtype=jnp.float32, **kw):
    return BIT(output_nc=2, token_len=4, resnet_stages_num=4,
               enc_depth=1, dec_depth=8, dtype=dtype)


@register("base_transformer_pos_s4_dd8_o5")
def _bit_s4_dd8_o5(dtype=jnp.float32, **kw):
    return BIT(output_nc=5, token_len=4, resnet_stages_num=4,
               enc_depth=1, dec_depth=8, dtype=dtype)


@register("base_transformer_pos_s4_dd8_dedim8")
def _bit_s4_dd8_dedim8(dtype=jnp.float32, **kw):
    return BIT(output_nc=2, token_len=4, resnet_stages_num=4,
               enc_depth=1, dec_depth=8, decoder_dim_head=8, dtype=dtype)


@register("base_transformer_pos_s4_dd8_t8_e2d4")
def _bit_t8_e2d4(dtype=jnp.float32, **kw):
    return BIT(output_nc=2, token_len=8, resnet_stages_num=4,
               enc_depth=2, dec_depth=4, decoder_dim_head=8, dtype=dtype)


@register("newUNetTrans")
def _dahitra(dtype=jnp.float32, img_size: int = 256, output_nc: int = 2, **kw):
    return DAHiTraUNet(output_nc=output_nc, img_size=img_size,
                       token_len=4, enc_depth=1, dtype=dtype)


@register("unet_coupled_trans_256")
def _unet_trans(dtype=jnp.float32, img_size: int = 256, **kw):
    return UNetChangeTransformer(output_nc=2, img_size=img_size, dtype=dtype)


@register("unet_coupled_two_trans_256")
def _unet_two_trans(dtype=jnp.float32, img_size: int = 256, **kw):
    return UNetChangeTwoTransformer(output_nc=2, img_size=img_size, dtype=dtype)


@register("changeFormer")
def _changeformer_v1(dtype=jnp.float32, output_nc: int = 2, **kw):
    return ChangeFormerV1(output_nc=output_nc, dtype=dtype)


@register("changeFormerV6")
def _changeformer_v6(dtype=jnp.float32, output_nc: int = 2, **kw):
    return ChangeFormerV6(output_nc=output_nc, dtype=dtype)


@register("siamUnet_conc")
def _siam_unet_conc(dtype=jnp.float32, **kw):
    return SiamUnetConc(input_nbr=3, label_nbr=2, dtype=dtype)


@register("siamUnet")
def _siam_unet(dtype=jnp.float32, **kw):
    return Res34UnetDouble(output_nc=5, dtype=dtype)


# ---- xBD-stack models (script-selected in the reference, not define_G) ----


@register("xbd_dahitra")
def _xbd_dahitra(dtype=jnp.float32, img_size: int = 1024, **kw):
    """xBD_code/train.py:44-45: DAHiTra, 5-class, 6-channel input, with the
    coarsest-scale-only positional-embedding quirk."""
    return DAHiTraUNet(output_nc=5, input_nc=6, img_size=img_size,
                       token_len=4, enc_depth=1, pos_coarsest_only=True,
                       dtype=dtype)


@register("xbd_res34_loc")
def _xbd_res34_loc(dtype=jnp.float32, **kw):
    return Res34UnetLoc(dtype=dtype)


@register("xbd_res34_double")
def _xbd_res34_double(dtype=jnp.float32, **kw):
    return Res34UnetDouble(output_nc=5, dtype=dtype)


@register("xbd_res34_single")
def _xbd_res34_single(dtype=jnp.float32, **kw):
    """Res34_Unet_Single (zoo/models.py:320-393): single-branch 5-class."""
    from dahitra_tpu.models.res34_unet import Res34UnetSingle
    return Res34UnetSingle(dtype=dtype)


@register("xbd_res34_double_modified")
def _xbd_res34_double_mod(dtype=jnp.float32, **kw):
    """Res34_Unet_Double_Modified (zoo/models.py:854-991): per-date passes
    plus a third fused pass through the shared core."""
    from dahitra_tpu.models.res34_unet import Res34UnetDoubleModified
    return Res34UnetDoubleModified(dtype=dtype)


@register("xbd_adapt_res34")
def _xbd_adapt_res34(dtype=jnp.float32, **kw):
    """4-class (merged major/destroyed) domain-adaptation model
    (xBD_code/train_adapt.py:55-58,145-153)."""
    return Res34UnetDouble(output_nc=4, dtype=dtype)


@register("xbd_adapt_dahitra")
def _xbd_adapt_dahitra(dtype=jnp.float32, img_size: int = 1024, **kw):
    return DAHiTraUNet(output_nc=4, input_nc=6, img_size=img_size,
                       token_len=4, enc_depth=1, pos_coarsest_only=True,
                       dtype=dtype)


@register("xbd_seresnext50_loc")
def _se50_loc(dtype=jnp.float32, **kw):
    from dahitra_tpu.models.senet_unet import SeResNext50UnetLoc
    return SeResNext50UnetLoc(dtype=dtype)


@register("xbd_seresnext50_double")
def _se50_double(dtype=jnp.float32, **kw):
    from dahitra_tpu.models.senet_unet import SeResNext50UnetDouble
    return SeResNext50UnetDouble(output_nc=5, dtype=dtype)


@register("xbd_senet154_loc")
def _se154_loc(dtype=jnp.float32, **kw):
    from dahitra_tpu.models.senet_unet import SeNet154UnetLoc
    return SeNet154UnetLoc(dtype=dtype)


@register("xbd_senet154_double")
def _se154_double(dtype=jnp.float32, **kw):
    from dahitra_tpu.models.senet_unet import SeNet154UnetDouble
    return SeNet154UnetDouble(output_nc=5, dtype=dtype)


@register("xbd_dpn92_loc")
def _dpn_loc(dtype=jnp.float32, **kw):
    from dahitra_tpu.models.dpn_unet import Dpn92UnetLoc
    return Dpn92UnetLoc(dtype=dtype)


@register("xbd_dpn92_double")
def _dpn_double(dtype=jnp.float32, **kw):
    from dahitra_tpu.models.dpn_unet import Dpn92UnetDouble
    return Dpn92UnetDouble(output_nc=5, dtype=dtype)


@register("xbd_unet_change_transformer")
def _xbd_uct(dtype=jnp.float32, img_size: int = 1024, **kw):
    from dahitra_tpu.models.xbd_unet_change_transformer import (
        XBDUNetChangeTransformer)
    return XBDUNetChangeTransformer(output_nc=5, img_size=img_size,
                                    use_bit=False, dtype=dtype)


@register("xbd_unet_change_transformer_bit")
def _xbd_uct_bit(dtype=jnp.float32, img_size: int = 1024, **kw):
    from dahitra_tpu.models.xbd_unet_change_transformer import (
        XBDUNetChangeTransformer)
    return XBDUNetChangeTransformer(output_nc=5, img_size=img_size,
                                    use_bit=True, dtype=dtype)


@register("dual_hrnet")
def _dual_hrnet(dtype=jnp.float32, **kw):
    """xView2-baseline two-stream HRNet-W32 (xBD_code/dual_hrnet.py)."""
    return DualHRNet(dtype=dtype)


@register("dual_hrnet_fpn")
def _dual_hrnet_fpn(dtype=jnp.float32, **kw):
    """DualHRNet with the USE_FPN branch (dual_hrnet_config.yaml:20 ships
    it off, and it crashes upstream — see models/dual_hrnet.py docstring
    for the mirrored minimal fix)."""
    return DualHRNet(dtype=dtype, use_fpn=True)


@register("xbd_bit")
def _xbd_bit(dtype=jnp.float32, **kw):
    """xBD_code/train.py:54-55: BIT, 5-class."""
    return BIT(output_nc=5, token_len=4, resnet_stages_num=4,
               enc_depth=1, dec_depth=8, dtype=dtype)


def define_g(net_g: str, **kwargs):
    """Build a model by its reference ``--net_G`` key."""
    if net_g not in _REGISTRY:
        raise NotImplementedError(
            f"Generator model name [{net_g}] is not recognized. "
            f"Available: {sorted(_REGISTRY)}")
    return _REGISTRY[net_g](**kwargs)


def available_models():
    return sorted(_REGISTRY)
