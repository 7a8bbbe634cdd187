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

The trace term follows pytorch-fid exactly: ``scipy.linalg.sqrtm`` on the
product, with an eps-jitter retry when the product is singular (2048-dim
covariances from <50k samples are rank-deficient, where the plain
eigenvalue route drifts). Without scipy it falls back to
``tr((C1 C2)^{1/2}) = sum(sqrt(eig(C1 C2)))`` — adequate only for
well-conditioned statistics.
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
    try:
        from scipy import linalg as _sla
    except ImportError:  # pragma: no cover - scipy is in the base image
        _sla = None

    if _sla is not None:
        # pytorch-fid parity path: matrix sqrt of the (nonsymmetric) product;
        # when the product is singular (rank-deficient covariances from
        # N < D samples) sqrtm goes non-finite -> jitter both covariances by
        # eps*I and retry, exactly as pytorch-fid does.
        # (scipy >= 1.17 deprecates ``disp``/the (sqrtm, errest) tuple and
        # removes them in 1.18 — call bare and normalize the return shape)
        def _sqrtm(x):
            r = _sla.sqrtm(x)
            return r[0] if isinstance(r, tuple) else r

        covmean = _sqrtm(cov1 @ cov2)
        if not np.isfinite(covmean).all():
            offset = np.eye(cov1.shape[0]) * eps
            covmean = _sqrtm((cov1 + offset) @ (cov2 + offset))
        if np.iscomplexobj(covmean):
            if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
                m = float(np.max(np.abs(covmean.imag)))
                raise ValueError(f"sqrtm produced a significant imaginary component ({m})")
            covmean = covmean.real
        tr_sqrt = float(np.trace(covmean))
    else:
        eigvals = np.linalg.eigvals(cov1 @ cov2)
        # numerical noise can leave tiny negative/imaginary parts
        tr_sqrt = float(np.sqrt(np.clip(eigvals.real, 0.0, None)).sum())
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
