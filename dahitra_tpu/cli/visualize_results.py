"""Damage-visualization tool — the rebuild of xBD_code/visualize_results.py.

Loads a localization model (pre image only) and a damage model (6-channel
pair), runs 4-way flip TTA through both, fuses with the reference's
3-threshold rule (visualize_results.py:33,207):

  loc = (p_loc > 0.38)
      | ((p_loc > 0.13) & (dmg in {2, 3}))
      | ((p_loc > 0.14) & (dmg > 1))

colors the 5 classes (BGR palette at :159-168, stored here as RGB), and
writes 4-panel grids [pre | post | ground truth | prediction].
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from dahitra_tpu.cli.xbd_predict import tta_views, untta_mean
from dahitra_tpu.core.checkpoint import load_checkpoint_raw
from dahitra_tpu.data.xbd import post_mask_path, scan_xbd_files
from dahitra_tpu.models.registry import define_g

THRESHOLDS = (0.38, 0.13, 0.14)
# class id -> RGB (reference stores BGR for cv2; :159-164).
PALETTE = np.array([[0, 0, 0], [0, 255, 0], [255, 255, 0],
                    [255, 127, 0], [255, 0, 0]], np.uint8)


def assign_color(class_map: np.ndarray) -> np.ndarray:
    return PALETTE[np.clip(class_map, 0, 4)]


def fuse_loc_damage(p_loc: np.ndarray, dmg_probs: np.ndarray,
                    thr=THRESHOLDS) -> tuple:
    """3-threshold loc/damage fusion (visualize_results.py:207)."""
    msk_dmg = dmg_probs[..., 1:].argmax(-1) + 1
    msk_loc = ((p_loc > thr[0])
               | ((p_loc > thr[1]) & (msk_dmg > 1) & (msk_dmg < 4))
               | ((p_loc > thr[2]) & (msk_dmg > 1))).astype(np.uint8)
    return msk_loc, msk_dmg


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--test_root", default="/root/reference/data/xbd/train")
    parser.add_argument("--loc_ckpt", required=True)
    parser.add_argument("--loc_net_G", default="xbd_res34_loc")
    parser.add_argument("--dmg_ckpt", required=True)
    parser.add_argument("--dmg_net_G", default="xbd_dahitra")
    parser.add_argument("--img_size", default=1024, type=int)
    parser.add_argument("--out_dir", default="outputs")
    parser.add_argument("--bf16", action="store_true")
    args = parser.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    def load(ck):
        d, name = os.path.split(ck.rstrip("/"))
        raw, _ = load_checkpoint_raw(d, name)
        return {"params": raw["params"],
                "batch_stats": raw.get("batch_stats", {})}

    loc_model = define_g(args.loc_net_G, dtype=dtype, img_size=args.img_size)
    dmg_model = define_g(args.dmg_net_G, dtype=dtype, img_size=args.img_size)
    loc_vars = load(args.loc_ckpt)
    dmg_vars = load(args.dmg_ckpt)

    @jax.jit
    def predict(img6):
        views = tta_views(img6).astype(dtype)
        dmg = dmg_model.apply(dmg_vars, views, None, False)
        dmg = untta_mean(jax.nn.sigmoid(dmg.astype(jnp.float32)))
        loc = loc_model.apply(loc_vars, views[..., :3], False)
        loc = untta_mean(jax.nn.sigmoid(loc.astype(jnp.float32)))[..., 0]
        return loc, dmg

    for fn in scan_xbd_files([args.test_root]):
        pre = np.array(Image.open(fn).convert("RGB"))
        post = np.array(Image.open(
            fn.replace("_pre_disaster", "_post_disaster")).convert("RGB"))
        s = args.img_size
        if pre.shape[0] > s:
            y0 = (pre.shape[0] - s) // 2
            pre = pre[y0:y0 + s, y0:y0 + s]
            post = post[y0:y0 + s, y0:y0 + s]
        gt = np.array(Image.open(post_mask_path(fn)))
        if gt.shape[0] > s:
            gt = gt[y0:y0 + s, y0:y0 + s]
        img6 = jnp.asarray(np.concatenate([pre, post], -1),
                           jnp.float32) / 127.0 - 1.0
        p_loc, dmg_probs = (np.asarray(t) for t in predict(img6))
        msk_loc, msk_dmg = fuse_loc_damage(p_loc, dmg_probs)

        grid = np.concatenate([pre, post, assign_color(gt),
                               assign_color(msk_dmg * msk_loc)], axis=1)
        out_name = os.path.basename(fn).replace("_pre_", "_vis_")
        Image.fromarray(grid).save(os.path.join(args.out_dir, out_name))
        print("wrote", out_name)


if __name__ == "__main__":
    main()
