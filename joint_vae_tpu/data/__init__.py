"""Data layer: dataset registry, name grammar, loaders, mixtures."""

from .registry import (dataset_properties, get_shape_by_name,  # noqa: F401
                       get_same_size_by_name, get_heldout_classes_by_name,
                       get_name_by_heldout_classes, get_classes_by_name)
from .loaders import ArrayDataset, get_dataset, get_batch, DataLoader  # noqa: F401
