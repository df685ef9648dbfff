"""Data layer: file-list datasets, on-device preprocessing, batching."""
from srcgan_tpu.data.dataset import (
    CachedDataset,
    DATASET_DIR,
    FileListDataset,
    G2LAB,
    G2RGB,
    batches,
    load_dataset,
    make_synthetic_dataset,
    normalize,
)
from srcgan_tpu.data import preprocess

__all__ = [
    "CachedDataset", "DATASET_DIR", "FileListDataset", "G2LAB", "G2RGB", "batches",
    "load_dataset", "make_synthetic_dataset", "normalize", "preprocess",
]
