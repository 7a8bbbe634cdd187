"""Frechet Inception Distance utilities.

The reference's FID protocol generates 50k samples and computes FID with an
external tool (``/root/reference/FiT/launch_sampling_FID.sbatch:13``; no FID
code ships in-repo). This module provides the in-repo half that needs no
network access: feature statistics and the Frechet distance itself, over
features from any embedding function (the canonical choice is InceptionV3
pool3 — load converted weights and pass its apply fn as ``extractor``; this
zero-egress environment cannot download them, so features/extractors are
caller-provided).

FID(m1, C1, m2, C2) = |m1 - m2|^2 + tr(C1 + C2 - 2 (C1 C2)^{1/2})

The trace term uses the eigenvalues of ``C1 @ C2`` (similar to a symmetric
PSD matrix, so its spectrum is real and non-negative):
``tr((C1 C2)^{1/2}) = sum(sqrt(eig(C1 C2)))`` — no scipy needed.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import numpy as np

__all__ = ["feature_statistics", "frechet_distance", "fid_from_features", "fid_score"]


def feature_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mean (D,), covariance (D, D)) in float64."""
    f = np.asarray(features, dtype=np.float64)
    assert f.ndim == 2 and f.shape[0] > 1, "need (N>1, D) features"
    mu = f.mean(axis=0)
    cov = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(cov)


def frechet_distance(
    mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray, eps: float = 1e-6
) -> float:
    """Frechet distance between two Gaussians."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1, cov2 = np.atleast_2d(cov1).astype(np.float64), np.atleast_2d(cov2).astype(np.float64)

    diff = mu1 - mu2
    prod = cov1 @ cov2
    eigvals = np.linalg.eigvals(prod)
    # numerical noise can leave tiny negative/imaginary parts
    sqrt_eigvals = np.sqrt(np.clip(eigvals.real, 0.0, None))
    tr_sqrt = float(sqrt_eigvals.sum())
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * tr_sqrt)


def fid_from_features(feats1: np.ndarray, feats2: np.ndarray) -> float:
    """FID between two feature sets (N1, D) and (N2, D)."""
    mu1, cov1 = feature_statistics(feats1)
    mu2, cov2 = feature_statistics(feats2)
    return frechet_distance(mu1, cov1, mu2, cov2)


def fid_score(
    samples: Iterable[np.ndarray],
    reference: Iterable[np.ndarray],
    extractor: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    batch_size: int = 64,
) -> float:
    """FID between two streams of images/latents.

    ``extractor(batch) -> (B, D)`` maps raw arrays to embedding features
    (e.g. a converted InceptionV3 pool3 apply fn); identity flattening is
    used when omitted (useful for latent-space FID-like diagnostics).
    """

    def extract_all(stream):
        feats, buf = [], []
        for x in stream:
            buf.append(np.asarray(x))
            if len(buf) >= batch_size:
                feats.append(_extract(np.stack(buf), extractor))
                buf = []
        if buf:
            feats.append(_extract(np.stack(buf), extractor))
        return np.concatenate(feats, axis=0)

    return fid_from_features(extract_all(samples), extract_all(reference))


def _extract(batch: np.ndarray, extractor) -> np.ndarray:
    if extractor is None:
        return batch.reshape(batch.shape[0], -1)
    return np.asarray(extractor(batch))
