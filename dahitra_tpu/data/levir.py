"""LEVIR-CD pair dataset: host-side decode, device-side everything else.

Parity target: datasets/CD_dataset.py:59-134 (ImageDataset/CDDataset).
  * Files are listed from ``{root}/{split}/A``; B and label share the name
    (B under ``{split}/B``, label under ``{split}/label`` with .png suffix).
  * label //= 255 when label_transform == 'norm'.
  * The reference's crop semantics (datasets/data_utils.py:51-81):
    cropping happens only when ``img_size < width // 2``; the origin is the
    FIXED point (256, 256) for every split (CDDataset never passes
    split='train', so the random-origin branch is dead — a reference quirk
    we preserve), or ``(256*(patch//4), 256*(patch%4))`` when a patch index
    is given (eval_cd.py's 16-tile sweep).

The host stage stops at uint8 numpy arrays; crop/flip/blur/normalize run
on device (see data/augment.py).
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image


@dataclasses.dataclass
class LevirPairs:
    """In-memory uint8 pair arrays (N, H, W, 3) + labels (N, H, W)."""

    names: List[str]
    a: np.ndarray
    b: np.ndarray
    label: np.ndarray

    def __len__(self) -> int:
        return len(self.names)


def crop_origin(img_width: int, img_size: int, patch: Optional[int] = None
                ) -> Optional[Tuple[int, int]]:
    """The reference's fixed crop origin, or None when no crop applies
    (datasets/data_utils.py:62-78)."""
    if img_size >= img_width // 2:
        return None
    if patch is not None:
        return (256 * (patch // 4), 256 * (patch % 4))
    return (256, 256)


def load_levir_split(root_dir: str, split: str, img_size: int = 256,
                     label_transform: str = "norm",
                     patch: Optional[int] = None,
                     allow_missing_labels: bool = False) -> LevirPairs:
    a_dir = os.path.join(root_dir, split, "A")
    names = sorted(os.listdir(a_dir))
    a_list, b_list, l_list = [], [], []
    for name in names:
        img_a = np.asarray(Image.open(os.path.join(root_dir, split, "A", name)).convert("RGB"))
        img_b = np.asarray(Image.open(os.path.join(root_dir, split, "B", name)).convert("RGB"))
        lbl_name = name.replace(".jpg", ".png")
        lbl_path = os.path.join(root_dir, split, "label", lbl_name)
        if os.path.exists(lbl_path):
            lbl = np.array(Image.open(lbl_path), dtype=np.uint8)
            if label_transform == "norm":
                lbl = lbl // 255
        elif allow_missing_labels:
            # Label-less splits (e.g. inference-only demo data): all-zero
            # masks keep the pipeline runnable, but callers must opt in —
            # evaluating such a split would yield confidently wrong metrics.
            lbl = np.zeros(img_a.shape[:2], np.uint8)
        else:
            raise FileNotFoundError(
                f"label missing for {name} at {lbl_path}; pass "
                "allow_missing_labels=True for inference-only splits")
        origin = crop_origin(img_a.shape[1], img_size, patch)
        if origin is not None:
            y0, x0 = origin[1], origin[0]
            # data_utils.py:77-78 indexes [y0:y0+s, x0:x0+s] with
            # x0 drawn from size[1] — i.e. (x0, y0) are (row, col) swapped;
            # both are 256 in the fixed-origin path so the distinction only
            # matters for patch eval, where we follow the same layout.
            y0, x0 = origin[0], origin[1]
            img_a = img_a[y0:y0 + img_size, x0:x0 + img_size]
            img_b = img_b[y0:y0 + img_size, x0:x0 + img_size]
            lbl = lbl[y0:y0 + img_size, x0:x0 + img_size]
        a_list.append(img_a)
        b_list.append(img_b)
        l_list.append(lbl)
    return LevirPairs(
        names=names,
        a=np.stack(a_list).astype(np.uint8),
        b=np.stack(b_list).astype(np.uint8),
        label=np.stack(l_list).astype(np.uint8),
    )
