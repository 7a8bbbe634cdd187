"""Evaluation utilities (FID statistics and distance)."""

from fit_tpu.eval.fid import (
    feature_statistics,
    fid_from_features,
    fid_score,
    frechet_distance,
)

__all__ = [
    "feature_statistics",
    "fid_from_features",
    "fid_score",
    "frechet_distance",
]
