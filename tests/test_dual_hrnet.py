"""Dual-HRNet model and trainer tests."""
import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahitra_tpu.models import available_models, define_g

pytestmark = pytest.mark.slow  # zoo/engine compile-heavy


def test_dual_hrnet_registered():
    assert "dual_hrnet" in available_models()


def test_dual_hrnet_outputs_quarter_res():
    model = define_g("dual_hrnet")
    key = jax.random.PRNGKey(0)
    x6 = jax.random.normal(key, (1, 64, 64, 6))
    variables = jax.jit(lambda k, x: model.init(k, x, None, False))(key, x6)
    out = model.apply(variables, x6, None, False)
    assert out["loc"].shape == (1, 16, 16, 2)
    assert out["cls"].shape == (1, 16, 16, 4)
    # Two fused HRNet-W32 streams.
    p = variables["params"]
    assert "loc_net" in p and "cls_net" in p
    assert any(k.startswith("fuse_loc") for k in p)


def test_dual_hrnet_fpn_outputs_and_params():
    """USE_FPN branch: summed FPN pyramid -> 32-ch heads (the reference's
    own FPN path crashes upstream; see models/dual_hrnet.py docstring)."""
    model = define_g("dual_hrnet_fpn")
    key = jax.random.PRNGKey(1)
    x6 = jax.random.normal(key, (1, 64, 64, 6))
    variables = jax.jit(lambda k, x: model.init(k, x, None, False))(key, x6)
    out = model.apply(variables, x6, None, False)
    assert out["loc"].shape == (1, 16, 16, 2)
    assert out["cls"].shape == (1, 16, 16, 4)
    p = variables["params"]
    assert "fpn_loc" in p and "fpn_cls" in p
    # FPN-mode head is 32-wide (mask_last_layer(32)), not the 480 concat.
    assert p["loc_net"]["last_conv1"]["kernel"].shape[-1] == 32


def test_dual_hrnet_loss_signal_is_cls_only():
    """The loc term argmaxes logits (train_dual_hrnet.py:337) — gradient-free;
    the cls CE carries the signal."""
    from dahitra_tpu.losses.combo import dual_hrnet_loss

    rng = np.random.default_rng(0)
    out = {"loc": jnp.array(rng.normal(size=(1, 8, 8, 2)).astype(np.float32)),
           "cls": jnp.array(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))}
    masks = jnp.array((rng.random((1, 32, 32, 5)) > 0.6).astype(np.float32))
    val = float(dual_hrnet_loss(out, masks))
    assert np.isfinite(val)
    g = jax.grad(lambda loc: dual_hrnet_loss({"loc": loc, "cls": out["cls"]},
                                             masks))(out["loc"])
    assert float(jnp.abs(g).max()) == 0.0
    g2 = jax.grad(lambda cls: dual_hrnet_loss({"loc": out["loc"], "cls": cls},
                                              masks))(out["cls"])
    assert float(jnp.abs(g2).max()) > 0.0


@pytest.mark.parametrize("net_g", ["dual_hrnet", "dual_hrnet_fpn"])
def test_hrnet_trainer_smoke(tmp_path, net_g):
    from dahitra_tpu.train.xbd_engine import XBDTrainer
    from dahitra_tpu.core.mesh import make_mesh

    rng = np.random.default_rng(1)
    n, s = 2, 32
    arrays = {
        "img_pre": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "img_post": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "msk": rng.integers(0, 2, (n, s, s, 5)).astype(np.uint8),
        "lbl_msk": rng.integers(0, 4, (n, s, s)).astype(np.uint8),
    }
    args = argparse.Namespace(
        net_G=net_g, img_size=s, batch_size=2, val_batch_size=2,
        lr=0.0, max_epochs=1, checkpoint_dir=str(tmp_path), bf16=False,
        seed=0, warm_start_from=None)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    trainer = XBDTrainer(args, arrays, arrays, mesh=mesh, task="hrnet")
    trainer.train_one_epoch(0)
    scores = trainer.evaluate_and_checkpoint(0)
    assert np.isfinite(scores["score"])


def test_dual_hrnet_loss_matches_reference_composition():
    """Numeric oracle for dual_hrnet_loss vs the reference train loop's loss
    (train_dual_hrnet.py:318-346): nearest-mode F.interpolate of both heads,
    ComboLoss{dice:1,focal:8} on argmax'd loc, 5x weighted CE on cls."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from ref_oracle import load_xbd_zoo
    from dahitra_tpu.losses.combo import dual_hrnet_loss

    load_xbd_zoo()  # puts /root/reference/xBD_code on sys.path
    import losses as ref_losses

    rng = np.random.default_rng(3)
    b, s0, s1 = 2, 8, 16
    loc = rng.normal(size=(b, 2, s0, s0)).astype(np.float32)
    cls = rng.normal(size=(b, 4, s0, s0)).astype(np.float32)
    msks = (rng.random((b, 5, s1, s1)) > 0.6).astype(np.float32)

    seg_loss = ref_losses.ComboLoss({"dice": 1, "focal": 8}, per_image=False)
    ce_loss = nn.CrossEntropyLoss(weight=torch.tensor([0.10, 2.0, 1.0, 2.0]))
    loc_t = F.interpolate(torch.tensor(loc), size=(s1, s1))
    cls_t = F.interpolate(torch.tensor(cls), size=(s1, s1))
    msks_t = torch.tensor(msks)
    loss0 = seg_loss(loc_t.argmax(axis=1).float(), msks_t[:, 0])
    true_bldg = torch.argmax(msks_t[:, 1:], dim=1)
    want = float(loss0 + ce_loss(cls_t, true_bldg) * 5)

    got = float(dual_hrnet_loss(
        {"loc": jnp.array(np.transpose(loc, (0, 2, 3, 1))),
         "cls": jnp.array(np.transpose(cls, (0, 2, 3, 1)))},
        jnp.array(np.transpose(msks, (0, 2, 3, 1)))))
    np.testing.assert_allclose(got, want, rtol=2e-4)
