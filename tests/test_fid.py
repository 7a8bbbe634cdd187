"""FID utility tests against closed forms for Gaussians."""

import numpy as np
import pytest

from fit_tpu.eval import fid_from_features, fid_score, frechet_distance


def test_identical_distributions_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(5000, 8))
    assert fid_from_features(f, f) == pytest.approx(0.0, abs=1e-8)


def test_mean_shift_closed_form():
    """FID(N(0,I), N(m,I)) = |m|^2."""
    rng = np.random.default_rng(1)
    d = 4
    m = np.array([1.0, -2.0, 0.5, 0.0])
    a = rng.normal(size=(200000, d))
    b = rng.normal(size=(200000, d)) + m
    fid = fid_from_features(a, b)
    assert fid == pytest.approx(float(m @ m), rel=0.05, abs=0.02)


def test_variance_scale_closed_form():
    """FID(N(0, I), N(0, s^2 I)) = d (s - 1)^2."""
    mu = np.zeros(3)
    s = 2.0
    fid = frechet_distance(mu, np.eye(3), mu, s**2 * np.eye(3))
    assert fid == pytest.approx(3 * (s - 1) ** 2, rel=1e-9)


def test_fid_score_streams_and_extractor():
    rng = np.random.default_rng(2)
    imgs_a = [rng.normal(size=(3, 4, 4)).astype(np.float32) for _ in range(300)]
    imgs_b = [rng.normal(size=(3, 4, 4)).astype(np.float32) + 1.0 for _ in range(300)]

    def extractor(batch):  # mean-pool channels as a toy embedding
        return batch.reshape(batch.shape[0], 3, -1).mean(axis=2)

    fid = fid_score(imgs_a, imgs_b, extractor=extractor, batch_size=32)
    # mean shift of 1 per channel, d=3 -> |m|^2 = 3 (variances shrink by
    # pooling, so the cov term is small); just check it is near 3
    assert 2.0 < fid < 4.0
    same = fid_score(imgs_a, imgs_a, extractor=extractor)
    assert same == pytest.approx(0.0, abs=1e-8)


def test_frechet_ill_conditioned_matches_pytorch_fid():
    """Rank-deficient covariances (N < D: the real 2048-dim pool3 regime at
    small sample counts) must match pytorch-fid's sqrtm + eps-jitter
    algorithm to <0.1% (VERDICT r2 item 6 — the plain eigenvalue route
    drifts on near-singular products)."""
    from scipy import linalg as sla

    from fit_tpu.eval.fid import feature_statistics, frechet_distance

    rng = np.random.default_rng(0)
    # 24 samples of 64-dim features: covariance rank <= 23 (singular product)
    f1 = rng.normal(size=(24, 64))
    f2 = rng.normal(size=(24, 64)) * 1.3 + 0.2
    mu1, c1 = feature_statistics(f1)
    mu2, c2 = feature_statistics(f2)

    # hand-rolled pytorch-fid reference (calculate_frechet_distance)
    eps = 1e-6
    diff = mu1 - mu2
    covmean, _ = sla.sqrtm(c1 @ c2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(c1.shape[0]) * eps
        covmean = sla.sqrtm((c1 + offset) @ (c2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    want = diff @ diff + np.trace(c1) + np.trace(c2) - 2 * np.trace(covmean)

    got = frechet_distance(mu1, c1, mu2, c2)
    assert abs(got - want) / abs(want) < 1e-3, (got, want)


def test_frechet_well_conditioned_sqrtm_vs_eig_agree():
    """On full-rank statistics the sqrtm path and the eigenvalue fallback
    agree — pins that the new default did not move well-conditioned FIDs."""
    from fit_tpu.eval.fid import feature_statistics, frechet_distance

    rng = np.random.default_rng(3)
    f1 = rng.normal(size=(500, 16))
    f2 = rng.normal(size=(500, 16)) * 0.9 - 0.1
    mu1, c1 = feature_statistics(f1)
    mu2, c2 = feature_statistics(f2)
    got = frechet_distance(mu1, c1, mu2, c2)
    eig = np.linalg.eigvals(c1 @ c2)
    want = (
        (mu1 - mu2) @ (mu1 - mu2) + np.trace(c1) + np.trace(c2)
        - 2 * np.sqrt(np.clip(eig.real, 0, None)).sum()
    )
    np.testing.assert_allclose(got, want, rtol=1e-8)
