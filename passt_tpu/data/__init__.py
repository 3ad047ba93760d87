from passt_tpu.data.datasets import (
    AudioDataset,
    HDF5AudioDataset,
    ConcatDataset,
    MapDataset,
    WavMixDataset,
    CachedDataset,
    FolderDataset,
    pad_or_truncate,
    random_crop,
    stride_resample,
    roll_augment,
    gain_augment,
)
from passt_tpu.data.sampler import (
    class_balanced_sample_weights,
    WeightedEpochSampler,
    ShuffleSampler,
    SequentialSampler,
)
from passt_tpu.data.pipeline import DataLoader, Prefetcher

__all__ = [
    "AudioDataset",
    "HDF5AudioDataset",
    "ConcatDataset",
    "MapDataset",
    "WavMixDataset",
    "CachedDataset",
    "FolderDataset",
    "pad_or_truncate",
    "random_crop",
    "stride_resample",
    "roll_augment",
    "gain_augment",
    "class_balanced_sample_weights",
    "WeightedEpochSampler",
    "ShuffleSampler",
    "SequentialSampler",
    "DataLoader",
    "Prefetcher",
]
