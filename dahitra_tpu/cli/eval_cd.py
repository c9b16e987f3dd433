"""Checkpoint evaluation CLI — the rebuild of eval_cd.py.

The reference loops ``for patch in range(16)`` re-instantiating the loader
and evaluator per fixed 256px patch of each 1024px test tile
(eval_cd.py:49-55). Confusion-matrix accumulation is additive, so we
evaluate all requested patches in one evaluator pass (patches folded into
the dataset) and report both per-patch and total scores.
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np

from dahitra_tpu.data.levir import load_levir_split
from dahitra_tpu.data.registry import get_data_config
from dahitra_tpu.evalx.evaluator import CDEvaluator


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--gpu_ids", type=str, default="0")
    parser.add_argument("--project_name", default="test", type=str)
    parser.add_argument("--checkpoint_root", default="checkpoints", type=str)
    parser.add_argument("--data_name", default="LEVIR", type=str)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--split", default="test", type=str)
    parser.add_argument("--img_size", default=256, type=int)
    parser.add_argument("--n_class", default=2, type=int)
    parser.add_argument("--net_G", default="newUNetTrans", type=str)
    parser.add_argument("--num_patches", default=16, type=int,
                        help="fixed 256px patches per tile (eval_cd.py:49)")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--save_vis", action="store_true")
    args = parser.parse_args(argv)
    args.checkpoint_dir = os.path.join(args.checkpoint_root, args.project_name)
    args.vis_dir = os.path.join("vis", args.project_name)

    cfg = get_data_config(args.data_name)
    split = args.split
    if not os.path.isdir(os.path.join(cfg.root_dir, split, "A")):
        split = "val" if os.path.isdir(os.path.join(cfg.root_dir, "val", "A")) \
            else "train"
        print(f"WARNING: split '{args.split}' not found under "
              f"{cfg.root_dir} — evaluating '{split}' instead")

    # Determine whether tiles are large enough for the patch sweep.
    probe = load_levir_split(cfg.root_dir, split, args.img_size,
                             cfg.label_transform, patch=None)
    chunks = [probe.arrays() if hasattr(probe, "arrays") else
              {"a": probe.a, "b": probe.b, "label": probe.label}]
    patched = probe.a.shape[1] > args.img_size
    if patched:
        chunks = []
        for patch in range(args.num_patches):
            p = load_levir_split(cfg.root_dir, split, args.img_size,
                                 cfg.label_transform, patch=patch)
            chunks.append({"a": p.a, "b": p.b, "label": p.label})
    arrays = {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}
    # Dataset position -> source patch, for the reference-style per-patch
    # score blocks (eval_cd.py:49-55 logs one block per patch).
    group_of = np.concatenate([np.full(len(c["a"]), i, np.int32)
                               for i, c in enumerate(chunks)]) \
        if patched else None

    from dahitra_tpu.core.mesh import mesh_from_gpu_ids

    evaluator = CDEvaluator(args, arrays,
                            mesh=mesh_from_gpu_ids(args.gpu_ids))
    scores = evaluator.eval_models(save_vis=args.save_vis, group_of=group_of)
    for g in scores.get("per_group", []):
        print({k: (round(v, 5) if isinstance(v, float) else v)
               for k, v in g.items()
               if k in ("patch", "acc", "miou", "mf1", "F1_1", "iou_1")})
    print({k: round(v, 5) for k, v in scores.items()
           if k in ("acc", "miou", "mf1", "F1_1", "iou_1", "imps")})


if __name__ == "__main__":
    main()
