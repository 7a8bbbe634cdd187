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
