"""Convert a reference PyTorch checkpoint (.pt) into a framework checkpoint.

The reference ships/produces torch ``state_dict`` checkpoints
(models/trainer.py:150-158 {model_G_state_dict, ...}; xBD_code/train.py:
298-303 {state_dict, ...}, possibly 'module.'-prefixed by DataParallel).
This CLI converts one into an Orbax checkpoint directory that every
consumer here accepts: ``eval_cd``/``demo`` load it as ``best_ckpt``,
and ``xbd_train --warm_start_from`` size-filters from it exactly like
the reference's warm start (xBD_code/train.py:446-462).

    python -m dahitra_tpu.cli.import_checkpoint ref_best_ckpt.pt \
        --net_G newUNetTrans --out checkpoints/imported

Conversion itself is dahitra_tpu.core.torch_import (one converter per
registry key; see that module for naming maps and citations).
"""
from __future__ import annotations

import os
from argparse import ArgumentParser


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("pt_path", help="reference .pt checkpoint file, or "
                                        "a raw torchvision resnet .pth with "
                                        "--trunk_only")
    parser.add_argument("--net_G", default=None,
                        help="registry key the weights belong to")
    parser.add_argument("--trunk_only", action="store_true",
                        help="treat pt_path as a raw torchvision resnet "
                             "state_dict and emit a trunk-only warm-start "
                             "checkpoint (params/core/resnet) for the xBD "
                             "Res34 UNets — the reference's pretrained=True "
                             "encoder (zoo/models.py:586-597)")
    parser.add_argument("--out", required=True,
                        help="output checkpoint dir (becomes "
                             "--checkpoint_dir / --warm_start_from)")
    parser.add_argument("--name", default="best_ckpt",
                        help="checkpoint name inside --out")
    args = parser.parse_args(argv)

    from dahitra_tpu.core.checkpoint import save_checkpoint
    from dahitra_tpu.core.torch_import import (import_reference_checkpoint,
                                               import_torchvision_trunk)

    if args.trunk_only:
        variables = import_torchvision_trunk(args.pt_path)
        what = "imagenet trunk"
        meta = {"imported_from": os.path.abspath(args.pt_path),
                "trunk_only": True}
    elif args.net_G:
        variables = import_reference_checkpoint(args.pt_path, args.net_G)
        what = args.net_G
        meta = {"imported_from": os.path.abspath(args.pt_path),
                "net_G": args.net_G}
    else:
        parser.error("one of --net_G or --trunk_only is required")
    os.makedirs(args.out, exist_ok=True)
    n = sum(x.size for x in _leaves(variables["params"]))
    save_checkpoint(args.out, args.name, variables, meta)
    print(f"imported {what}: {n:,} params -> "
          f"{os.path.join(args.out, args.name)}")


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    main()
