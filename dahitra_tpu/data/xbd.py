"""xBD damage-assessment data pipeline.

Parity targets (reference /root/reference/xBD_code/train.py and
datasets/CD_dataset.py:137-276):
  * File scan: ``*_pre_disaster.png`` under ``{dir}/images``; the post image
    swaps the suffix; masks live under ``{dir}/masks`` (pre mask = building
    footprints, post mask = damage classes 0-4) (train.py:79-108).
  * Class-presence upsampling (train.py:397-425): 90/10 split with sklearn
    seed 0 FIRST, then training files with any building are kept and files
    with damage classes are duplicated with probability 0.5
    (seed 321-offset RNG).
  * 5-channel mask construction — train variant applies precedence rules
    (train.py:144-174): channel 0 (loc) is rebuilt from the union of damage
    channels; minor (1) suppressed where major/destroyed present; 3 and 4
    suppressed where 2 present; 4 suppressed where 3 present. Val variant
    keeps raw channels and lbl_msk = argmax over damage channels only
    (train.py:215-235).
  * Input = 6-channel concat pre|post, normalized x/127 - 1
    (xBD_code/utils.py:112-116). Implemented on device in
    ``normalize_xbd_inputs``.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from sklearn.model_selection import train_test_split


def scan_xbd_files(train_dirs: Sequence[str],
                   disasters: Optional[Sequence[str]] = None) -> List[str]:
    """List pre-disaster image paths (train.py:79-83)."""
    all_files = []
    for d in train_dirs:
        for f in sorted(os.listdir(os.path.join(d, "images"))):
            if "_pre_disaster.png" in f:
                if disasters and not any(k in f for k in disasters):
                    continue
                all_files.append(os.path.join(d, "images", f))
    return all_files


def post_mask_path(pre_path: str) -> str:
    return pre_path.replace("/images/", "/masks/").replace(
        "_pre_disaster", "_post_disaster")


def pre_mask_path(pre_path: str) -> str:
    return pre_path.replace("/images/", "/masks/")


def file_class_presence(all_files: Sequence[str]) -> np.ndarray:
    """(N, 4) bool: damage class c+1 present in each post mask
    (train.py:397-407)."""
    out = np.zeros((len(all_files), 4), dtype=bool)
    for i, fn in enumerate(all_files):
        msk = np.array(Image.open(post_mask_path(fn)))
        for c in range(1, 5):
            out[i, c - 1] = bool((msk == c).any())
    return out


def split_and_upsample(all_files: Sequence[str], seed: int = 0,
                       policy: str = "random"
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (train_idxs, val_idxs) with class-balance upsampling.

    policy='random': the xBD trainer's scheme (train.py:409-425) — split
    first, keep building files, duplicate damaged files with prob 0.5.
    policy='multi': xBDatasetMulti's deterministic scheme
    (datasets/CD_dataset.py:233-249) — append each file once if any damage
    class is present, again if minor/major present, THEN split 90/10
    (random_state 10 in the reference; we use ``seed``).
    """
    file_classes = file_class_presence(all_files)
    if policy == "multi":
        idxs = list(range(len(all_files)))
        for i in range(len(file_classes)):
            if file_classes[i, 1:].max():
                idxs.append(i)
            if file_classes[i, 1:3].max():
                idxs.append(i)
        train_pos, val_pos = train_test_split(
            np.arange(len(idxs)), test_size=0.1, random_state=seed)
        idxs = np.asarray(idxs, np.int64)
        return idxs[train_pos], np.unique(idxs[val_pos])
    train_idxs0, val_idxs = train_test_split(
        np.arange(len(all_files)), test_size=0.1, random_state=seed)
    import random as pyrandom

    pyrandom.seed(seed + 321)
    train_idxs = []
    for i in train_idxs0:
        if file_classes[i, :].max():
            train_idxs.append(i)
        if (pyrandom.random() > 0.5) and file_classes[i, 1:].max():
            train_idxs.append(i)
    return np.asarray(train_idxs, np.int64), np.asarray(val_idxs, np.int64)


def ida_color_normalize(img: np.ndarray) -> np.ndarray:
    """xBD -> IdaBD color-statistics renormalization
    (xBD_code/train_adapt.py:81-85)."""
    x = (img.astype(np.float64) - [87.4, 96.4, 74.7]) / [41.8, 37.8, 37.9]
    x = x * [44.7, 38.7, 33.8] + [75.1, 74.3, 56.4]
    return np.clip(x, 0, 255).astype(np.uint8)


def build_damage_masks(loc_msk: np.ndarray, dmg_msk: np.ndarray,
                       train: bool, merge_34: bool = False
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """5-channel one-hot mask stack + integer label map.

    ``loc_msk``: pre mask (footprints, 0/255 or 0/1 scaled by 255 in xBD).
    ``dmg_msk``: post mask with class ids 0..4.
    ``merge_34``: 4-channel domain-adaptation variant merging classes 3 and
    4 into one "major/destroyed" channel (train_adapt.py:147-153).
    Returns (msk (H, W, 5 or 4) int, lbl_msk (H, W) int).
    """
    chans = [loc_msk]
    if merge_34:
        chans.append(np.where(dmg_msk == 1, 255, 0).astype(loc_msk.dtype))
        chans.append(np.where(dmg_msk == 2, 255, 0).astype(loc_msk.dtype))
        chans.append(np.where((dmg_msk == 3) | (dmg_msk == 4), 255,
                              0).astype(loc_msk.dtype))
        msk = np.stack(chans, axis=-1) > 127
        lbl = msk[..., 1:].argmax(axis=-1)
        return msk.astype(np.int32), lbl.astype(np.int32)
    for c in range(1, 5):
        chans.append(np.where(dmg_msk == c, 255, 0).astype(loc_msk.dtype))
    msk = np.stack(chans, axis=-1) > 127

    if train:
        # Precedence rules (train.py:162-174).
        msk[..., 0] = False
        msk[..., 1][msk[..., 2:].max(axis=-1)] = False
        msk[..., 3][msk[..., 2]] = False
        msk[..., 4][msk[..., 2]] = False
        msk[..., 4][msk[..., 3]] = False
        msk[..., 0][msk[..., 1:].max(axis=-1)] = True
        lbl_msk = msk.argmax(axis=-1)
    else:
        # Val keeps raw channels; label indexes damage classes only
        # (train.py:233-235).
        lbl_msk = msk[..., 1:].argmax(axis=-1)
    return msk.astype(np.int32), lbl_msk.astype(np.int32)


@dataclasses.dataclass
class XBDPairs:
    """Host arrays for one split: uint8 images + masks."""

    files: List[str]
    img_pre: np.ndarray   # (N, H, W, 3) uint8
    img_post: np.ndarray  # (N, H, W, 3) uint8
    msk: np.ndarray       # (N, H, W, 5) uint8 one-hot
    lbl_msk: np.ndarray   # (N, H, W) uint8

    def __len__(self):
        return len(self.files)

    def arrays(self) -> dict:
        return {"img_pre": self.img_pre, "img_post": self.img_post,
                "msk": self.msk, "lbl_msk": self.lbl_msk}


def load_xbd_pairs(files: Sequence[str], train: bool,
                   crop_size: Optional[int] = None, seed: int = 0,
                   merge_34: bool = False,
                   color_normalize: bool = False) -> XBDPairs:
    """Decode xBD tiles to host arrays. ``crop_size`` takes a random crop
    for training (train.py:110-116) — a no-op at the native 1024.
    ``color_normalize`` applies the xBD->IdaBD renormalization used by the
    domain-adaptation trainer (train_adapt.py:81-85)."""
    rng = np.random.RandomState(seed)
    pre_l, post_l, msk_l, lbl_l = [], [], [], []
    for fn in files:
        pre = np.array(Image.open(fn).convert("RGB"))
        post = np.array(Image.open(
            fn.replace("_pre_disaster", "_post_disaster")).convert("RGB"))
        if color_normalize:
            pre = ida_color_normalize(pre)
            post = ida_color_normalize(post)
        loc = np.array(Image.open(pre_mask_path(fn)))
        dmg = np.array(Image.open(post_mask_path(fn)))
        if crop_size and crop_size < pre.shape[0]:
            y0 = rng.randint(0, pre.shape[0] - crop_size + 1)
            x0 = rng.randint(0, pre.shape[1] - crop_size + 1)
            pre = pre[y0:y0 + crop_size, x0:x0 + crop_size]
            post = post[y0:y0 + crop_size, x0:x0 + crop_size]
            loc = loc[y0:y0 + crop_size, x0:x0 + crop_size]
            dmg = dmg[y0:y0 + crop_size, x0:x0 + crop_size]
        # xBD pre masks store footprints as 1s or 255s depending on source;
        # scale small-valued masks up so the >127 threshold works.
        if loc.max() == 1:
            loc = loc * 255
        msk, lbl = build_damage_masks(loc, dmg, train, merge_34=merge_34)
        pre_l.append(pre)
        post_l.append(post)
        msk_l.append(msk.astype(np.uint8))
        lbl_l.append(lbl.astype(np.uint8))
    return XBDPairs(
        files=list(files),
        img_pre=np.stack(pre_l).astype(np.uint8),
        img_post=np.stack(post_l).astype(np.uint8),
        msk=np.stack(msk_l),
        lbl_msk=np.stack(lbl_l),
    )
