"""Learning-curve artifact: demonstrate that the full training recipes LEARN
(not just compile) on the in-tree fixture data, and record the curves.

Two runs, mirroring the reference's own quality-control loop (SURVEY.md §4 —
per-epoch validation + best-checkpoint gating is the reference's only test
strategy):

  1. LEVIR-CD: the run_cd.sh recipe (newUNetTrans, AdamW lr 1e-3, linear
     decay, dice+focal loss) on the 4 in-tree 256px pairs
     (/root/reference/data/LEVIR_CD/train), scan-epoch path, validated
     against the same pairs each epoch -> val mF1 curve.
  2. xBD: the reference's two-stage pipeline — localization training
     (Res34 UNet Loc, ComboLoss{dice:1,focal:10}, lr 1.5e-4) on the 10
     in-tree tiles, then damage training (DAHiTra 5-class,
     ComboLoss{dice:1,focal:8} channel-weighted) warm-started from the loc
     checkpoint (xBD_code/train.py:446-462) -> dice / xView2-score curves.

Writes benchmarks/artifacts/learning_curves.json. Run on the TPU chip:
    python benchmarks/learning_curves.py [--quick]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable as python benchmarks/<x>.py

import argparse
import json
import os
import tempfile

import numpy as np

ARTIFACT = os.path.join(os.path.dirname(__file__), "artifacts",
                        "learning_curves.json")


def run_levir(epochs: int, img_size: int = 256) -> dict:
    from dahitra_tpu.cli.main_cd import pairs_to_arrays
    from dahitra_tpu.data.levir import load_levir_split
    from dahitra_tpu.train.engine import CDTrainer

    pairs = load_levir_split("/root/reference/data/LEVIR_CD", "train",
                             img_size)
    arrays = pairs_to_arrays(pairs)
    with tempfile.TemporaryDirectory() as td:
        args = argparse.Namespace(
            gpu_ids="0", project_name="levir_curve", checkpoint_root=td,
            num_workers=0, dataset="CDDataset", data_name="LEVIR",
            batch_size=4, split="train", split_val="train",
            img_size=img_size, n_class=2, net_G="newUNetTrans", loss="ce",
            optimizer="adamw", lr=1e-3, max_epochs=epochs,
            lr_policy="linear", lr_decay_iters=100, bf16=True, seed=0,
            scan_epoch=True, checkpoint_dir=td, vis_dir=td)
        tr = CDTrainer(args, arrays, arrays)
        tr.train_models()
        return {"metric": "val_mF1",
                "recipe": "run_cd.sh (newUNetTrans, AdamW 1e-3, linear, "
                          "dice+focal)",
                "n_images": int(len(arrays["a"])),
                "curve": [round(float(v), 5) for v in tr.val_acc_curve]}


def run_xbd(loc_epochs: int, dmg_epochs: int, img_size: int = 512) -> dict:
    from dahitra_tpu.data.xbd import (load_xbd_pairs, scan_xbd_files)
    from dahitra_tpu.train.xbd_engine import XBDTrainer

    files = scan_xbd_files(["/root/reference/data/xbd/train"])
    train_pairs = load_xbd_pairs(files, train=True, crop_size=img_size,
                                 seed=0)
    val_pairs = load_xbd_pairs(files, train=False, crop_size=img_size,
                               seed=0)
    out = {}
    with tempfile.TemporaryDirectory() as td:
        loc_dir = os.path.join(td, "loc")
        os.makedirs(loc_dir)
        loc_args = argparse.Namespace(
            net_G="xbd_res34_loc", img_size=img_size, batch_size=2,
            val_batch_size=2, lr=0.0, max_epochs=loc_epochs,
            checkpoint_dir=loc_dir, bf16=True, seed=0,
            warm_start_from=None)
        loc = XBDTrainer(loc_args, train_pairs.arrays(), val_pairs.arrays(),
                         task="loc")
        loc_curve = []
        for ep in range(loc_epochs):
            loc.train_one_epoch(ep)
            loc_curve.append(round(loc.evaluate_and_checkpoint(ep)["score"],
                                   5))
        out["xbd_loc"] = {"metric": "val_dice",
                          "recipe": "train_loc.py (Res34_Unet_Loc, "
                                    "ComboLoss dice+10*focal, lr 1.5e-4)",
                          "n_tiles": len(files), "curve": loc_curve}

        dmg_dir = os.path.join(td, "dmg")
        os.makedirs(dmg_dir)
        # Warm start pairs sibling architectures like the reference does
        # (train.py:67: Res34_Unet_Double <- 'res34_loc_0_1_best'; the TUNet
        # branch warm-starts from a prior TUNet snapshot instead).
        dmg_args = argparse.Namespace(
            net_G="xbd_res34_double", img_size=img_size, batch_size=2,
            val_batch_size=2, lr=0.0, max_epochs=dmg_epochs,
            checkpoint_dir=dmg_dir, bf16=True, seed=0,
            warm_start_from=os.path.join(loc_dir, "best_ckpt"))
        dmg = XBDTrainer(dmg_args, train_pairs.arrays(), val_pairs.arrays(),
                         task="damage")
        dmg_curve, dmg_f1, dmg_f1p = [], [], []
        classes_present = 0
        for ep in range(dmg_epochs):
            dmg.train_one_epoch(ep)
            sc = dmg.evaluate_and_checkpoint(ep)
            dmg_curve.append(round(sc["score"], 5))
            dmg_f1.append(round(sc.get("damage_f1", 0.0), 5))
            dmg_f1p.append(round(sc.get("damage_f1_present", 0.0), 5))
            classes_present = sc.get("classes_present", 0)
        out["xbd_damage"] = {
            "metric": "xview2_score (0.3*dice + 0.7*harmonic_F1)",
            "note": "harmonic F1 over 4 damage classes collapses to ~0 "
                    "when any class has no pixels in the tiny fixture val "
                    "set (the +1e-6 guard dominates) — the reference's "
                    "metric (train.py:281-289) does the same; "
                    "damage_f1_present_curve restricts the harmonic mean "
                    "to classes with GT support (divergence-flagged extra "
                    "metric) so the curve evidences damage-class learning",
            "recipe": "train.py Res34_Unet_Double branch (5-class, warm "
                      "start from res34 loc, ComboLoss dice+8*focal "
                      "channel-weighted)",
            "n_tiles": len(files), "curve": dmg_curve,
            "damage_f1_curve": dmg_f1,
            "damage_f1_present_curve": dmg_f1p,
            "classes_present_in_val": classes_present}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="short CPU-sized run (CI smoke)")
    ap.add_argument("--levir_epochs", type=int, default=60)
    ap.add_argument("--loc_epochs", type=int, default=6)
    ap.add_argument("--dmg_epochs", type=int, default=14)
    ap.add_argument("--only", default="all", choices=["all", "levir", "xbd"],
                    help="regenerate one section, merging into the artifact")
    args = ap.parse_args()
    if args.quick:
        args.levir_epochs, args.loc_epochs, args.dmg_epochs = 6, 2, 2

    artifact = "/tmp/learning_curves_quick.json" if args.quick else ARTIFACT
    result = {}
    if os.path.exists(artifact):
        with open(artifact) as f:
            result = json.load(f)
    if args.only in ("all", "levir"):
        result["levir"] = run_levir(args.levir_epochs)
    if args.only in ("all", "xbd"):
        result.update(run_xbd(args.loc_epochs, args.dmg_epochs))
    os.makedirs(os.path.dirname(artifact), exist_ok=True)
    with open(artifact, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
