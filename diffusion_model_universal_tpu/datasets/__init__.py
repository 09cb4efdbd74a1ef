"""Datasets layer (reference `datasets/__init__.py`)."""

from .pipeline import (DeviceDataLoader, apply_static_transforms,
                       make_augment_fn, split_indices)
from .registry import (DATASET_REGISTRY, ArrayImageDataset, CIFAR10Dataset,
                       CelebADataset, MNISTDataset, SyntheticDataset,
                       get_dataset)
from .sources import DatasetNotFoundError

__all__ = [
    "DeviceDataLoader", "apply_static_transforms", "make_augment_fn",
    "split_indices", "DATASET_REGISTRY", "ArrayImageDataset",
    "CIFAR10Dataset", "CelebADataset", "MNISTDataset", "SyntheticDataset",
    "get_dataset", "DatasetNotFoundError",
]
