"""Evaluation utilities: FID statistics/distance and the InceptionV3 pool3
feature network."""

from fit_tpu.eval.fid import (
    feature_statistics,
    fid_from_features,
    fid_score,
    frechet_distance,
)
from fit_tpu.eval.inception import (
    convert_torch_inception,
    load_torch_inception,
    make_feature_extractor,
    make_suite_extractor,
    pool3_and_spatial_features,
    pool3_features,
)

__all__ = [
    "feature_statistics",
    "fid_from_features",
    "fid_score",
    "frechet_distance",
    "convert_torch_inception",
    "load_torch_inception",
    "make_feature_extractor",
    "make_suite_extractor",
    "pool3_and_spatial_features",
    "pool3_features",
]
