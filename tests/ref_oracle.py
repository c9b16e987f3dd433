"""Test-only loader for the reference PyTorch code at /root/reference.

The reference imports torchvision and timm, which are not installed here;
we stub them with the minimal surface the reference uses:
  * torchvision.models.resnet{18,34,50} -> the reference's own vendored
    copies (models/resnet.py — architecturally identical to torchvision).
  * pretrained-weight downloads (no egress) -> deterministic random
    state_dicts of the same architecture; parity tests convert whatever the
    reference model holds, so random weights are exactly as good.
  * timm.models.layers: to_2tuple / trunc_normal_ / DropPath (identity at
    eval time, which is all forward-parity needs; training uses flax
    Dropout-based droppath on our side).

Everything here is read-only with respect to /root/reference.
"""
from __future__ import annotations

import sys
import types

_INSTALLED = False


def load_reference():
    """Install stubs + sys.path and return the reference `models` package
    namespace (models.networks, models.ChangeFormer importable)."""
    global _INSTALLED
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if not _INSTALLED:
        import torch
        import torch.nn as nn

        import models.resnet as ref_resnet

        def fake_load(url, progress=True, **kw):
            arch = next(a for a in ("resnet18", "resnet34", "resnet50")
                        if a in url)
            torch.manual_seed(hash(arch) % 2**31)
            return getattr(ref_resnet, arch)(pretrained=False).state_dict()

        ref_resnet.load_state_dict_from_url = fake_load

        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet18 = ref_resnet.resnet18
        tvm.resnet34 = ref_resnet.resnet34
        tvm.resnet50 = ref_resnet.resnet50
        tvm.efficientnet_b0 = None  # imported, never used in our targets
        tv.models = tvm
        sys.modules.setdefault("torchvision", tv)
        sys.modules.setdefault("torchvision.models", tvm)

        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        class DropPath(nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):  # eval-mode identity
                return x

        tl.to_2tuple = to_2tuple
        tl.trunc_normal_ = nn.init.trunc_normal_
        tl.DropPath = DropPath
        timm.models = tm
        tm.layers = tl
        sys.modules.setdefault("timm", timm)
        sys.modules.setdefault("timm.models", tm)
        sys.modules.setdefault("timm.models.layers", tl)
        _INSTALLED = True

    import models.networks  # noqa: F401  (reference package)
    return sys.modules["models"]


def load_xbd_zoo():
    """Import the reference xBD zoo (cwd-sensitive: it SourceFileLoader-loads
    'zoo/bit_resnet.py' relative to cwd) and patch its pretrained-weight
    downloads. Returns the zoo package namespace."""
    import os

    load_reference()
    import torch

    cwd = os.getcwd()
    if "/root/reference/xBD_code" not in sys.path:
        sys.path.insert(0, "/root/reference/xBD_code")
    try:
        os.chdir("/root/reference/xBD_code")
        import zoo.model_transformer_encoding  # noqa: F401
        import zoo.models  # noqa: F401
    finally:
        os.chdir(cwd)
    bitmodule = sys.modules["bitmodule"]

    def fake_load(url, progress=True, **kw):
        arch = next(a for a in ("resnet18", "resnet34", "resnet50") if a in url)
        torch.manual_seed(hash(arch) % 2**31)
        return getattr(bitmodule, arch)(pretrained=False).state_dict()

    bitmodule.load_state_dict_from_url = fake_load
    return sys.modules["zoo"]


class _NS:
    """Minimal yacs stand-in: attribute + item access over nested dicts
    (yacs is not installed; the reference only reads the config)."""

    def __init__(self, d):
        self._d = {k: _NS(v) if isinstance(v, dict) else v
                   for k, v in d.items()}
        for k, v in self._d.items():
            setattr(self, k, v)

    def __getitem__(self, k):
        return self._d[k]


def load_dual_hrnet():
    """Import the reference dual_hrnet.py and return (module, config)."""
    import numpy as _np

    if not hasattr(_np, "int"):
        _np.int = int  # the reference uses the removed np.int alias
    import yaml

    if "/root/reference/xBD_code" not in sys.path:
        sys.path.insert(0, "/root/reference/xBD_code")
    import dual_hrnet as dh

    cfg = _NS(yaml.safe_load(
        open("/root/reference/xBD_code/dual_hrnet_config.yaml")))
    return dh, cfg


def sd_numpy(net):
    """state_dict -> {name: np.ndarray} like state_dict_to_numpy on a file."""
    return {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}


def torch_forward_nhwc(net, *inputs_nhwc):
    """Run the torch net on NHWC numpy inputs; return NHWC numpy output."""
    import numpy as np
    import torch

    tins = [torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
            for x in inputs_nhwc]
    with torch.no_grad():
        out = net(*tins)
    if isinstance(out, (list, tuple)):
        out = [np.transpose(o.numpy(), (0, 2, 3, 1)) for o in out]
        return out
    return np.transpose(out.numpy(), (0, 2, 3, 1))
