"""Data pipeline: corpus descriptors, runtime segment datasets, the distributed
batch sampler, and the prefetching datamodule."""

from .datasets import get_dataset, dataset_dict
from .datamodule import SELDDataModule

__all__ = ["get_dataset", "dataset_dict", "SELDDataModule"]
