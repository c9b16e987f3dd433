from dahitra_tpu.data.augment import augment_pairs, normalize_images
from dahitra_tpu.data.levir import LevirPairs, load_levir_split
from dahitra_tpu.data.loader import BatchLoader
from dahitra_tpu.data.registry import DATASETS, DatasetConfig, get_data_config

__all__ = [
    "augment_pairs",
    "normalize_images",
    "LevirPairs",
    "load_levir_split",
    "BatchLoader",
    "DATASETS",
    "DatasetConfig",
    "get_data_config",
]
