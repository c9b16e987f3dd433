"""Train + test CLI for the change-detection stack.

Flag-compatible rebuild of the reference main_cd.py:31-80 (same flag names
so scripts/run_cd.sh recipes port unchanged). --gpu_ids selects the mesh
devices the way the reference selects DataParallel GPUs
(utils.py:98-107, networks.py:121-126): '0' = one device, '0,1' = data
parallel over two.

Usage (fixture quick start):
  python -m dahitra_tpu.cli.main_cd --data_name LEVIR --net_G newUNetTrans \
      --img_size 256 --batch_size 4 --max_epochs 2 --lr 0.001 \
      --lr_policy linear --split train --split_val val \
      --checkpoint_root /tmp/ckpt --project_name demo
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

from dahitra_tpu.core.mesh import mesh_from_gpu_ids
from dahitra_tpu.data.levir import load_levir_split
from dahitra_tpu.data.registry import get_data_config
from dahitra_tpu.evalx.evaluator import CDEvaluator
from dahitra_tpu.train.engine import CDTrainer


def pairs_to_arrays(p):
    return {"a": p.a, "b": p.b, "label": p.label}


def build_parser() -> ArgumentParser:
    parser = ArgumentParser()
    parser.add_argument("--gpu_ids", type=str, default="0",
                        help="accepted for reference-recipe compatibility; unused")
    parser.add_argument("--project_name", default="test", type=str)
    parser.add_argument("--checkpoint_root", default="checkpoints", type=str)
    parser.add_argument("--num_workers", default=4, type=int)
    parser.add_argument("--dataset", default="CDDataset", type=str)
    parser.add_argument("--data_name", default="LEVIR", type=str)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--split", default="train", type=str)
    parser.add_argument("--split_val", default="val", type=str)
    parser.add_argument("--img_size", default=256, type=int)
    parser.add_argument("--n_class", default=2, type=int)
    parser.add_argument("--net_G", default="newUNetTrans", type=str)
    parser.add_argument("--loss", default="ce", type=str,
                        help="recorded; the trainer optimizes dice+focal "
                             "(batch>1) like the reference (trainer.py:254-261)")
    parser.add_argument("--optimizer", default="adamw", type=str)
    parser.add_argument("--lr", default=0.0005, type=float)
    parser.add_argument("--max_epochs", default=100, type=int)
    parser.add_argument("--lr_policy", default="linear", type=str)
    parser.add_argument("--lr_decay_iters", default=100, type=int)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (TPU MXU fast path)")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--profile_dir", default=None, type=str,
                        help="write a jax.profiler trace of epoch 0 here")
    parser.add_argument("--scan_epoch", action="store_true",
                        help="stage the training set in HBM (sharded over "
                             "the data mesh axis) and run each epoch as ONE "
                             "lax.scan dispatch; removes per-step dispatch "
                             "latency")
    parser.add_argument("--log_every", default=100, type=int,
                        help="per-batch path: progress line every N batches "
                             "(reference trainer.py:136-189; 0 = off)")
    parser.add_argument("--log_chunks", default=1, type=int,
                        help="scan path: split the epoch scan into N "
                             "dispatches with a progress line between each")
    parser.add_argument("--vis_train_every", default=0, type=int,
                        help="per-batch path: dump a training vis grid every "
                             "N batches (reference trainer.py:196-204 used "
                             "500; 0 = off)")
    parser.add_argument("--multi_scale_loss", action="store_true",
                        help="deep supervision over multi-scale heads "
                             "(ChangeFormer recipe, trainer.py:271-285)")
    parser.add_argument("--init_type", default="normal", type=str,
                        help="init_net weight init: normal|xavier|kaiming|"
                             "orthogonal|none (networks.py:77-127)")
    parser.add_argument("--init_gain", default=0.02, type=float)
    parser.add_argument("--allow_missing_labels", action="store_true",
                        help="substitute all-zero labels for splits without "
                             "a label dir (metrics on such splits are "
                             "meaningless; off by default)")
    return parser


def train(args):
    cfg = get_data_config(args.data_name)
    allow = getattr(args, "allow_missing_labels", False)
    train_pairs = load_levir_split(cfg.root_dir, args.split, args.img_size,
                                   cfg.label_transform,
                                   allow_missing_labels=allow)
    val_pairs = load_levir_split(cfg.root_dir, args.split_val, args.img_size,
                                 cfg.label_transform,
                                 allow_missing_labels=allow)
    trainer = CDTrainer(args, pairs_to_arrays(train_pairs),
                        pairs_to_arrays(val_pairs),
                        mesh=mesh_from_gpu_ids(args.gpu_ids))
    trainer.train_models()


def test(args):
    cfg = get_data_config(args.data_name)
    split = "test"
    if not os.path.isdir(os.path.join(cfg.root_dir, split, "A")):
        split = args.split_val  # fixture data has no test split
    pairs = load_levir_split(cfg.root_dir, split, args.img_size,
                             cfg.label_transform,
                             allow_missing_labels=getattr(
                                 args, "allow_missing_labels", False))
    evaluator = CDEvaluator(args, pairs_to_arrays(pairs),
                            mesh=mesh_from_gpu_ids(args.gpu_ids))
    evaluator.eval_models()


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.checkpoint_dir = os.path.join(args.checkpoint_root, args.project_name)
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    args.vis_dir = os.path.join(args.checkpoint_dir, "vis")
    train(args)
    if not args.skip_test:
        test(args)


if __name__ == "__main__":
    main()
