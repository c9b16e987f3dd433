"""End-to-end CLI smoke tests on the in-tree fixture data — the SURVEY §2.1
entry-point inventory exercised the way a user would run it (main_cd.py,
eval_cd.py, demo.py, get_epoch_data.py analogs)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full train/eval pipelines, compile-heavy


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """One cheap main_cd training run (base_resnet18, 1 epoch) shared by the
    eval/demo tests, exactly as scripts/run_cd.sh would invoke it."""
    from dahitra_tpu.cli.main_cd import main

    root = tmp_path_factory.mktemp("ckpt")
    argv = ["--project_name", "cli_smoke", "--checkpoint_root", str(root),
            "--data_name", "LEVIR", "--dataset", "CDDataset",
            "--batch_size", "4", "--img_size", "256",
            "--net_G", "base_resnet18", "--max_epochs", "1",
            "--lr", "0.001", "--split", "train", "--split_val", "train"]
    main(argv)
    return root, "cli_smoke"


def test_main_cd_writes_reference_artifacts(trained_ckpt):
    """main_cd leaves the reference's artifact set (models/trainer.py:
    150-158, 233-241): best_ckpt, log.txt, acc curves."""
    root, name = trained_ckpt
    d = os.path.join(str(root), name)
    assert os.path.isdir(os.path.join(d, "best_ckpt"))
    assert os.path.exists(os.path.join(d, "log.txt"))
    assert os.path.exists(os.path.join(d, "val_acc.npy"))
    assert os.path.exists(os.path.join(d, "train_acc.npy"))
    curve = np.load(os.path.join(d, "val_acc.npy"))
    assert curve.shape == (1,) and np.isfinite(curve).all()


def test_eval_cd_cli(trained_ckpt):
    """eval_cd writes log_test.txt, scores_dict.npy and the <mf1>.txt
    marker (models/evaluator.py:134-151)."""
    from dahitra_tpu.cli.eval_cd import main

    root, name = trained_ckpt
    main(["--project_name", name, "--checkpoint_root", str(root),
          "--data_name", "LEVIR", "--split", "train",
          "--batch_size", "4", "--img_size", "256",
          "--net_G", "base_resnet18"])
    d = os.path.join(str(root), name)
    assert os.path.exists(os.path.join(d, "log_test.txt"))
    assert os.path.exists(os.path.join(d, "scores_dict.npy"))
    scores = np.load(os.path.join(d, "scores_dict.npy"),
                     allow_pickle=True).item()
    assert 0.0 <= scores["mf1"] <= 1.0
    markers = [f for f in os.listdir(d) if f.endswith(".txt")
               and f not in ("log.txt", "log_test.txt")]
    assert markers, "mf1 marker file missing"


def test_demo_cli(trained_ckpt, tmp_path):
    """demo writes argmax*255 PNG predictions (basic_model.py:63-76)."""
    from dahitra_tpu.cli.demo import main

    root, name = trained_ckpt
    out = tmp_path / "predict"
    main(["--project_name", name, "--checkpoint_root", str(root),
          "--data_name", "LEVIR", "--split", "train",
          "--img_size", "256", "--net_G", "base_resnet18",
          "--output_folder", str(out)])
    pngs = list(out.glob("*.png"))
    assert pngs, "no prediction PNGs written"
    from PIL import Image

    arr = np.array(Image.open(pngs[0]))
    assert set(np.unique(arr)).issubset({0, 255})


def test_count_params_cli(capsys):
    """get_epoch_data.py analog prints trainable parameter counts."""
    from dahitra_tpu.cli.count_params import main

    main(["base_resnet18", "--img_size", "64"])
    outp = capsys.readouterr().out
    assert "base_resnet18" in outp
    assert any(ch.isdigit() for ch in outp)


def test_xbd_train_cli_loc(tmp_path):
    """xbd_train --task loc runs one epoch end-to-end on the fixture tiles
    (train_loc.py recipe at reduced crop)."""
    from dahitra_tpu.cli.xbd_train import main

    main(["--task", "loc", "--img_size", "128", "--batch_size", "2",
          "--max_epochs", "1", "--eval_every", "1",
          "--checkpoint_root", str(tmp_path),
          "--project_name", "loc_smoke"])
    d = tmp_path / "loc_smoke"
    assert (d / "log.txt").exists()
    log = (d / "log.txt").read_text()
    assert "Val Dice" in log
