"""Single-pair inference demo — the rebuild of demo.py (:20-85).

Loads a checkpoint, runs each pair of the quick-start split, and writes the
argmax prediction scaled to 255 as PNG (models/basic_model.py:63-76).
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from dahitra_tpu.core.checkpoint import load_checkpoint_raw
from dahitra_tpu.data.augment import augment_pairs
from dahitra_tpu.data.levir import load_levir_split
from dahitra_tpu.data.registry import get_data_config
from dahitra_tpu.models.registry import define_g


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--project_name",
                        default="CROP_newUNetTrans_LEVIR_b4_lr0.001_train_val_200_linear_ce")
    parser.add_argument("--checkpoint_root", default="checkpoints", type=str)
    parser.add_argument("--data_name", default="quick_start", type=str)
    parser.add_argument("--split", default="train", type=str)
    parser.add_argument("--img_size", default=256, type=int)
    parser.add_argument("--net_G", default="newUNetTrans", type=str)
    parser.add_argument("--output_folder", default="samples/predict", type=str)
    parser.add_argument("--bf16", action="store_true")
    args = parser.parse_args(argv)
    os.makedirs(args.output_folder, exist_ok=True)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    ckpt_dir = os.path.join(args.checkpoint_root, args.project_name)
    raw, meta = load_checkpoint_raw(ckpt_dir, "best_ckpt")
    variables = {"params": raw["params"],
                 "batch_stats": raw.get("batch_stats", {})}
    model = define_g(args.net_G, dtype=dtype, img_size=args.img_size)

    @jax.jit
    def predict(a_u8, b_u8):
        a, b, _ = augment_pairs(a_u8, b_u8,
                                jnp.zeros(a_u8.shape[:3], jnp.uint8),
                                jax.random.PRNGKey(0), train=False, dtype=dtype)
        logits = model.apply(variables, a, b, False)
        if isinstance(logits, (list, tuple)):
            logits = logits[-1]
        return jnp.argmax(logits, -1)

    cfg = get_data_config(args.data_name)
    # Pure inference: labels are not consulted, so label-less demo splits
    # are fine (basic_model.py:63-76 never reads labels either).
    pairs = load_levir_split(cfg.root_dir, args.split, args.img_size,
                             cfg.label_transform, allow_missing_labels=True)
    for i in range(len(pairs)):
        pred = np.asarray(predict(pairs.a[i:i + 1], pairs.b[i:i + 1]))[0]
        out = (pred * 255).astype(np.uint8)
        Image.fromarray(out).save(
            os.path.join(args.output_folder, pairs.names[i]))
        print("wrote", pairs.names[i])


if __name__ == "__main__":
    main()
