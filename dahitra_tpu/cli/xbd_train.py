"""xBD damage-classification / localization training CLI.

Replaces the reference's edit-the-globals scripts (xBD_code/train.py:39-77,
train_loc.py) with flags. Defaults reproduce the reference recipe:
DAHiTra (TUNet) 5-class on 1024px tiles, ComboLoss{dice:1,focal:8} weighted
per channel, AdamW 1e-4/wd 1e-6, MultiStepLR gamma 0.6, eval every 2 epochs
with the xView2 score; --task loc trains the binary footprint model
(ComboLoss{dice:1,focal:10}, lr 1.5e-4).
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

from dahitra_tpu.core.mesh import mesh_from_gpu_ids
from dahitra_tpu.data.xbd import (load_xbd_pairs, scan_xbd_files,
                                  split_and_upsample)
from dahitra_tpu.train.xbd_engine import XBDTrainer


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--data_root", default="/root/reference/data/xbd/train")
    parser.add_argument("--task", default="damage",
                        choices=["damage", "loc", "adapt", "gan", "hrnet"])
    parser.add_argument("--disasters", nargs="*", default=None,
                        help="filter file names by substrings "
                             "(train_adapt.py:73 uses hurricane-michael/AOI)")
    parser.add_argument("--effective_gan", action="store_true",
                        help="give the GAN generator a real adversarial "
                             "gradient (the reference detaches it, "
                             "train_GAN.py:374)")
    parser.add_argument("--net_G", default="xbd_dahitra")
    parser.add_argument("--img_size", default=1024, type=int,
                        help="crop size (1024 = full tile, train.py:67)")
    parser.add_argument("--batch_size", default=1, type=int)
    parser.add_argument("--val_batch_size", default=1, type=int)
    parser.add_argument("--lr", default=0.0, type=float,
                        help="0 = reference default for the task")
    parser.add_argument("--max_epochs", default=100, type=int)
    parser.add_argument("--checkpoint_root", default="weights")
    parser.add_argument("--project_name", default="xbd_dahitra")
    parser.add_argument("--warm_start_from", default=None,
                        help="checkpoint dir to size-filter weights from")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--elastic", action="store_true",
                        help="UNet-transformer recipe's per-date elastic "
                             "jitter, iaa.ElasticTransformation(alpha=(0.25,"
                             "1.2), sigma=0.2) at p~0.017 "
                             "(train_unettransformer.py:93,247-253)")
    parser.add_argument("--scan_epoch", action="store_true",
                        help="one-dispatch chunked lax.scan training epochs")
    parser.add_argument("--scan_chunk_batches", default=0, type=int,
                        help="batches staged per scan dispatch "
                             "(0 = ~256 samples per chunk)")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--eval_every", default=2, type=int)
    parser.add_argument("--gpu_ids", default="0", type=str,
                        help="mesh devices; the reference xBD scripts "
                             "DataParallel over all visible GPUs "
                             "(train.py:465), here explicit")
    args = parser.parse_args(argv)
    args.checkpoint_dir = os.path.join(args.checkpoint_root, args.project_name)
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    if args.task == "loc" and args.net_G == "xbd_dahitra":
        args.net_G = "xbd_res34_loc"
    if args.task == "adapt" and args.net_G == "xbd_dahitra":
        args.net_G = "xbd_adapt_res34"
    if args.task == "hrnet" and args.net_G == "xbd_dahitra":
        args.net_G = "dual_hrnet"

    files = scan_xbd_files([args.data_root], disasters=args.disasters)
    train_idx, val_idx = split_and_upsample(files, seed=args.seed)
    merge = args.task == "adapt"
    train_pairs = load_xbd_pairs([files[i] for i in train_idx], train=True,
                                 crop_size=args.img_size, seed=args.seed,
                                 merge_34=merge, color_normalize=merge)
    val_pairs = load_xbd_pairs([files[i] for i in val_idx], train=False,
                               crop_size=args.img_size, seed=args.seed,
                               merge_34=merge, color_normalize=merge)
    if args.task == "gan":
        from dahitra_tpu.train.xbd_engine import GANTrainer

        trainer = GANTrainer(args, train_pairs.arrays(), val_pairs.arrays(),
                             mesh=mesh_from_gpu_ids(args.gpu_ids),
                             effective_gan=args.effective_gan)
    else:
        trainer = XBDTrainer(args, train_pairs.arrays(), val_pairs.arrays(),
                             mesh=mesh_from_gpu_ids(args.gpu_ids),
                             task=args.task)
    trainer.train_models(eval_every=args.eval_every)


if __name__ == "__main__":
    main()
