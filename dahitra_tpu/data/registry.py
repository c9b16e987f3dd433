"""Dataset registry — the rebuild of data_config.py (reference :2-16).

Maps a dataset name to its root directory and label transform. 'norm'
divides label pixel values by 255 (LEVIR masks store change as 255 —
datasets/CD_dataset.py:126-127).
"""
from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class DatasetConfig:
    root_dir: str
    label_transform: str = "norm"


# Roots default to the reference's in-tree fixtures so the quick-start path
# works out of the box; override via env or CLI flags.
_REF_DATA = os.environ.get("DAHITRA_DATA_ROOT", "/root/reference/data")

DATASETS = {
    "LEVIR": DatasetConfig(root_dir=os.path.join(_REF_DATA, "LEVIR_CD"),
                           label_transform="norm"),
    "quick_start": DatasetConfig(root_dir=os.path.join(_REF_DATA, "LEVIR_CD"),
                                 label_transform="norm"),
    "xBD": DatasetConfig(root_dir=os.path.join(_REF_DATA, "xbd"),
                         label_transform="none"),
}


def get_data_config(name: str) -> DatasetConfig:
    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; available: {sorted(DATASETS)}")
    return DATASETS[name]
