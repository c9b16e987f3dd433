"""End-to-end test of the import_checkpoint CLI: reference .pt ->
Orbax checkpoint dir -> CDEvaluator loads and scores it."""
import argparse
import os

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # torch oracle + engine compile


def test_import_checkpoint_cli_roundtrip(tmp_path):
    import torch

    from ref_oracle import load_reference, torch_forward_nhwc

    rn = load_reference().networks
    torch.manual_seed(5)
    net = rn.BASE_Transformer(input_nc=3, output_nc=2, token_len=4,
                              resnet_stages_num=4, with_pos='learned',
                              enc_depth=1, dec_depth=8).eval()
    pt = tmp_path / "ref.pt"
    # Reference trainer format: nested dict with model_G_state_dict
    # (models/trainer.py:150-158) — the importer unwraps it.
    torch.save({"model_G_state_dict": net.state_dict(), "epoch_id": 7},
               str(pt))

    out = tmp_path / "imported"
    from dahitra_tpu.cli.import_checkpoint import main as import_main

    import_main([str(pt), "--net_G", "base_transformer_pos_s4_dd8",
                 "--out", str(out)])
    assert os.path.exists(out / "best_ckpt.meta.json")

    # The evaluator must accept the imported dir as-is.
    import jax

    from dahitra_tpu.core.mesh import make_mesh
    from dahitra_tpu.evalx.evaluator import CDEvaluator

    rng = np.random.default_rng(5)
    n, s = 2, 64
    arrays = {
        "a": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "b": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "label": rng.integers(0, 2, (n, s, s)).astype(np.uint8),
    }
    args = argparse.Namespace(
        n_class=2, checkpoint_dir=str(out), bf16=False, batch_size=2,
        net_G="base_transformer_pos_s4_dd8", img_size=s, save_vis=False,
        vis_dir=str(tmp_path))
    ev = CDEvaluator(args, arrays,
                     mesh=make_mesh(n_data=1, devices=jax.devices()[:1]))
    scores = ev.eval_models()
    assert np.isfinite(scores["mf1"])

    # And the loaded forward must match the torch net on the same input.
    a = (arrays["a"].astype(np.float32) / 255.0 - 0.5) / 0.5
    b = (arrays["b"].astype(np.float32) / 255.0 - 0.5) / 0.5
    ref = torch_forward_nhwc(net, a, b)
    ours = ev.model.apply({"params": ev.params,
                           "batch_stats": ev.batch_stats},
                          jnp.asarray(a), jnp.asarray(b), False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=1e-3)


def test_trunk_only_import_warm_starts_res34_loc(tmp_path):
    """--trunk_only on a torchvision-format resnet34 state_dict produces a
    checkpoint that warm-starts xbd_res34_loc: every trunk leaf loads
    (size-filter semantics, train.py:446-462), decoder/head keep init."""
    import torch

    # torchvision.models.resnet34 state_dict layout, synthesized (the image
    # has no torchvision): basic blocks [3, 4, 6, 3], downsample at the
    # first block of layers 2-4, plus the fc head the converter ignores.
    torch.manual_seed(3)
    sd = {}

    def _bn(prefix, ch):
        sd[f"{prefix}.weight"] = torch.randn(ch) * 0.02 + 1
        sd[f"{prefix}.bias"] = torch.randn(ch) * 0.02
        sd[f"{prefix}.running_mean"] = torch.randn(ch) * 0.1
        sd[f"{prefix}.running_var"] = torch.rand(ch) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    sd["conv1.weight"] = torch.randn(64, 3, 7, 7) * 0.02
    _bn("bn1", 64)
    chans = [64, 64, 128, 256, 512]
    for li, n_blocks in ((1, 3), (2, 4), (3, 6), (4, 3)):
        cin, cout = chans[li - 1], chans[li]
        for bi in range(n_blocks):
            b = f"layer{li}.{bi}"
            c0 = cin if bi == 0 else cout
            sd[f"{b}.conv1.weight"] = torch.randn(cout, c0, 3, 3) * 0.02
            _bn(f"{b}.bn1", cout)
            sd[f"{b}.conv2.weight"] = torch.randn(cout, cout, 3, 3) * 0.02
            _bn(f"{b}.bn2", cout)
            if bi == 0 and li > 1:
                sd[f"{b}.downsample.0.weight"] = (
                    torch.randn(cout, cin, 1, 1) * 0.02)
                _bn(f"{b}.downsample.1", cout)
    sd["fc.weight"] = torch.randn(1000, 512) * 0.02
    sd["fc.bias"] = torch.zeros(1000)
    pth = tmp_path / "resnet34.pth"
    torch.save(sd, str(pth))

    out = tmp_path / "trunk"
    from dahitra_tpu.cli.import_checkpoint import main as import_main

    import_main([str(pth), "--trunk_only", "--out", str(out)])
    assert os.path.exists(out / "best_ckpt.meta.json")

    import jax

    from dahitra_tpu.core.mesh import make_mesh
    from dahitra_tpu.train.xbd_engine import XBDTrainer

    rng = np.random.default_rng(0)
    n, s = 2, 64
    arrays = {
        "pre": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "post": rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8),
        "msk": rng.integers(0, 2, (n, s, s, 5), dtype=np.uint8),
        "lbl": rng.integers(0, 5, (n, s, s)).astype(np.uint8),
    }
    args = argparse.Namespace(
        net_G="xbd_res34_loc", img_size=s, batch_size=2, lr=0.0,
        max_epochs=1, checkpoint_dir=str(tmp_path / "run"), bf16=False,
        seed=0, warm_start_from=str(out / "best_ckpt"))
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    tr = XBDTrainer(args, arrays, arrays, task="loc",
                    mesh=make_mesh(n_data=1, devices=jax.devices()[:1]))

    # Trunk convs carry the torch values; the head kept its fresh init.
    conv1 = np.asarray(tr.state.params["core"]["resnet"]["conv1"]["kernel"])
    want = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(conv1, want, atol=1e-6)
    bn_mean = np.asarray(
        tr.state.batch_stats["core"]["resnet"]["layer3"]["block2"]["bn1"]["mean"])
    want_bn = sd["layer3.2.bn1.running_mean"].numpy()
    np.testing.assert_allclose(bn_mean, want_bn, atol=1e-6)
    assert "res" in tr.state.params  # head exists, untouched by the merge


def test_trunk_only_rejects_non_trunk_checkpoint(tmp_path):
    import torch

    pt = tmp_path / "other.pt"
    torch.save({"state_dict": {"foo.weight": torch.zeros(3)}}, str(pt))
    from dahitra_tpu.core.torch_import import import_torchvision_trunk

    with pytest.raises(ValueError, match="torchvision resnet"):
        import_torchvision_trunk(str(pt))
