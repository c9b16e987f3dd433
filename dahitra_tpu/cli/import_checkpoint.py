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
    parser.add_argument("pt_path", help="reference .pt checkpoint file")
    parser.add_argument("--net_G", required=True,
                        help="registry key the weights belong to")
    parser.add_argument("--out", required=True,
                        help="output checkpoint dir (becomes "
                             "--checkpoint_dir / --warm_start_from)")
    parser.add_argument("--name", default="best_ckpt",
                        help="checkpoint name inside --out")
    args = parser.parse_args(argv)

    from dahitra_tpu.core.checkpoint import save_checkpoint
    from dahitra_tpu.core.torch_import import import_reference_checkpoint

    variables = import_reference_checkpoint(args.pt_path, args.net_G)
    os.makedirs(args.out, exist_ok=True)
    n = sum(x.size for x in _leaves(variables["params"]))
    save_checkpoint(args.out, args.name, variables,
                    {"imported_from": os.path.abspath(args.pt_path),
                     "net_G": args.net_G})
    print(f"imported {args.net_G}: {n:,} params -> "
          f"{os.path.join(args.out, args.name)}")


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    main()
