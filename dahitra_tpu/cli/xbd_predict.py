"""xBD test-set predictor with 4-way flip TTA.

Parity target: xBD_code/predict_test_cls.py:32-101 — for each pre/post pair
build the 4-view batch (identity, flip-up-down, flip-left-right, both),
average the un-flipped sigmoids over views (and over an ensemble of
checkpoints), write the loc channel to ``*_part1.png`` and the damage argmax
to ``*_part2.png``. The TTA batch is built and averaged ON DEVICE — one
forward per pair with the views folded into the batch axis.
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from dahitra_tpu.core.checkpoint import load_checkpoint_raw
from dahitra_tpu.data.xbd import scan_xbd_files
from dahitra_tpu.data.xbd_augment import normalize_xbd
from dahitra_tpu.models.registry import define_g


def tta_views(img6: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 6) -> (4, H, W, 6): identity, ud, lr, udlr
    (predict_test_cls.py:69-75)."""
    return jnp.stack([img6, img6[::-1], img6[:, ::-1], img6[::-1, ::-1]])


def untta_mean(probs4: jnp.ndarray) -> jnp.ndarray:
    """Invert each view's flip and average (predict_test_cls.py:79-91)."""
    return (probs4[0] + probs4[1][::-1] + probs4[2][:, ::-1]
            + probs4[3][::-1, ::-1]) / 4.0


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--test_root", default="/root/reference/data/xbd/train")
    parser.add_argument("--net_G", default="xbd_dahitra")
    parser.add_argument("--img_size", default=1024, type=int)
    parser.add_argument("--checkpoints", nargs="+", required=True,
                        help="one or more checkpoint dirs (ensemble mean)")
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--thr", default=0.3, type=float)
    parser.add_argument("--bf16", action="store_true")
    args = parser.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    model = define_g(args.net_G, dtype=dtype, img_size=args.img_size)
    ensembles = []
    for ck in args.checkpoints:
        d, name = os.path.split(ck.rstrip("/"))
        raw, _ = load_checkpoint_raw(d, name)
        ensembles.append({"params": raw["params"],
                          "batch_stats": raw.get("batch_stats", {})})

    @jax.jit
    def predict(variables, img6):
        views = tta_views(img6).astype(dtype)
        logits = model.apply(variables, views, None, False)
        return untta_mean(jax.nn.sigmoid(logits.astype(jnp.float32)))

    for fn in scan_xbd_files([args.test_root]):
        pre = np.array(Image.open(fn).convert("RGB"))
        post = np.array(Image.open(
            fn.replace("_pre_disaster", "_post_disaster")).convert("RGB"))
        s = args.img_size
        if pre.shape[0] > s:
            # Positional embeddings fix the model's input size (the
            # reference trains/predicts at the native 1024); center-crop
            # when evaluating a smaller-size checkpoint.
            y0 = (pre.shape[0] - s) // 2
            x0 = (pre.shape[1] - s) // 2
            pre = pre[y0:y0 + s, x0:x0 + s]
            post = post[y0:y0 + s, x0:x0 + s]
        img6 = normalize_xbd(jnp.asarray(
            np.concatenate([pre, post], axis=-1)))
        probs = sum(predict(v, img6) for v in ensembles) / len(ensembles)
        probs = np.asarray(probs)
        base = os.path.basename(fn)
        loc = (probs[..., 0] * 255).astype(np.uint8)
        dmg = probs[..., 1:].argmax(-1).astype(np.uint8)
        dmg = dmg * (probs[..., 0] > args.thr)
        Image.fromarray(loc).save(
            os.path.join(args.out_dir, base.replace(".png", "_part1.png")))
        Image.fromarray(dmg).save(
            os.path.join(args.out_dir, base.replace(".png", "_part2.png")))
        print("wrote", base)


if __name__ == "__main__":
    main()
