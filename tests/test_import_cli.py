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
