"""Inception Score + improved Precision/Recall tests.

The reference computes only FID (off-repo); IS and P/R follow the DiT/ADM
evaluation protocol. IS is checked against analytic cases and a direct
formula transcription; P/R against known set-identities and a brute-force
O(N^2) oracle of Kynkaenniemi et al. 2019's definition."""

import numpy as np
import pytest

from fit_tpu.eval.metrics import inception_score, precision_recall


# ---------------------------------------------------------------------------
# Inception Score
# ---------------------------------------------------------------------------


def test_is_uniform_probs_scores_one():
    """p(y|x) == p(y) for every x -> KL = 0 -> IS = 1."""
    probs = np.full((40, 10), 0.1)
    mean, std = inception_score(probs, splits=4)
    assert abs(mean - 1.0) < 1e-6
    assert std < 1e-6


def test_is_confident_diverse_probs_scores_num_classes():
    """One-hot predictions covering all classes equally -> IS = C."""
    c = 8
    probs = np.eye(c)[np.arange(64) % c]
    mean, _ = inception_score(probs, splits=1)
    assert abs(mean - c) < 1e-3


def test_is_matches_direct_formula_per_split():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(50, 16))
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    mean, std = inception_score(probs, splits=5)
    scores = []
    for part in np.array_split(probs, 5):
        py = part.mean(0)
        kl = (part * (np.log(part + 1e-16) - np.log(py + 1e-16))).sum(1).mean()
        scores.append(np.exp(kl))
    np.testing.assert_allclose(mean, np.mean(scores), rtol=1e-12)
    np.testing.assert_allclose(std, np.std(scores), rtol=1e-12)


def test_is_mode_collapse_scores_low():
    """All mass on one class -> p(y|x) == p(y) again -> IS = 1 even though
    predictions are confident (diversity term is what IS rewards)."""
    probs = np.zeros((30, 10))
    probs[:, 3] = 1.0
    mean, _ = inception_score(probs, splits=3)
    assert abs(mean - 1.0) < 1e-6


# ---------------------------------------------------------------------------
# improved Precision/Recall
# ---------------------------------------------------------------------------


def _pr_bruteforce(real, fake, k):
    """Direct transcription of Kynkaenniemi et al. 2019, Eq. 1-3."""

    def kth_radii(x):
        d = np.sqrt(((x[:, None] - x[None]) ** 2).sum(-1))
        np.fill_diagonal(d, np.inf)
        return np.sort(d, axis=1)[:, k - 1]

    def covered(queries, manifold, radii):
        d = np.sqrt(((queries[:, None] - manifold[None]) ** 2).sum(-1))
        return float(np.mean(np.any(d <= radii[None], axis=1)))

    return (
        covered(fake, real, kth_radii(real)),
        covered(real, fake, kth_radii(fake)),
    )


def test_pr_identical_sets_are_perfect():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 8)).astype(np.float32)
    p, r = precision_recall(x, x.copy(), k=3)
    assert p == 1.0 and r == 1.0


def test_pr_disjoint_sets_are_zero():
    rng = np.random.default_rng(2)
    real = rng.normal(size=(64, 8)).astype(np.float32)
    fake = real + 1000.0
    p, r = precision_recall(real, fake, k=3)
    assert p == 0.0 and r == 0.0


def test_pr_matches_bruteforce_oracle():
    rng = np.random.default_rng(3)
    real = rng.normal(size=(50, 6)).astype(np.float32)
    fake = (0.7 * rng.normal(size=(40, 6)) + 0.3).astype(np.float32)
    p, r = precision_recall(real, fake, k=3, block=16)  # force multi-block
    wp, wr = _pr_bruteforce(real.astype(np.float64), fake.astype(np.float64), 3)
    assert abs(p - wp) < 1e-9
    assert abs(r - wr) < 1e-9


def test_pr_asymmetry_mode_collapse():
    """A mode-collapsed fake set inside the real manifold: high precision
    (fakes look real) but low recall (real modes uncovered)."""
    rng = np.random.default_rng(4)
    real = np.concatenate(
        [rng.normal(size=(40, 4)), rng.normal(size=(40, 4)) + 50.0]
    ).astype(np.float32)
    fake = (0.3 * rng.normal(size=(60, 4))).astype(np.float32)  # one mode only
    p, r = precision_recall(real, fake, k=3)
    assert p > 0.9
    assert r < 0.6


def test_pr_rejects_tiny_sets():
    x = np.zeros((3, 4), np.float32)
    with pytest.raises(AssertionError):
        precision_recall(x, x, k=3)
