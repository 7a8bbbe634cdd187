"""Host-side data pipeline: latent datasets, packing, sharded loading."""

from fit_tpu.data.dataset import (
    TOKEN_BUCKETS,
    LatentExample,
    LatentFolderDataset,
    LatentLoader,
    bucket_batch,
    pad_batch,
)

__all__ = [
    "TOKEN_BUCKETS",
    "LatentExample",
    "LatentFolderDataset",
    "LatentLoader",
    "bucket_batch",
    "pad_batch",
]
