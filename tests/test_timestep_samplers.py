"""Timestep importance-sampler tests."""

import numpy as np
import pytest

from fit_tpu.diffusion import (
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)


def test_uniform_sampler():
    s = UniformSampler(1000)
    t, w = s.sample(512, np.random.default_rng(0))
    assert t.shape == (512,) and w.shape == (512,)
    np.testing.assert_allclose(w, 1.0)
    assert t.min() >= 0 and t.max() < 1000


def test_factory():
    assert isinstance(create_named_schedule_sampler("uniform", 10), UniformSampler)
    assert isinstance(
        create_named_schedule_sampler("loss-second-moment", 10), LossSecondMomentResampler
    )
    with pytest.raises(NotImplementedError):
        create_named_schedule_sampler("nope", 10)


def test_loss_second_moment_warmup_and_bias():
    s = LossSecondMomentResampler(4, history_per_term=3)
    rng = np.random.default_rng(1)
    # before warmup: uniform
    np.testing.assert_allclose(s.weights(), 1.0)
    # feed losses: timestep 3 has much larger loss
    for _ in range(3):
        s.update_with_local_losses(
            np.array([0, 1, 2, 3]), np.array([0.1, 0.1, 0.1, 10.0])
        )
    assert s._warmed_up()
    w = s.weights()
    assert w[3] > w[0] * 10
    np.testing.assert_allclose(w.sum(), 1.0)
    # importance weights compensate: E[w * f(t)] unbiased
    t, iw = s.sample(100000, rng)
    est = np.bincount(t, weights=iw, minlength=4) / 100000
    np.testing.assert_allclose(est, 0.25, rtol=0.15)


def test_history_rolls():
    s = LossSecondMomentResampler(2, history_per_term=2)
    for i in range(5):
        s.update_with_all_losses(np.array([0, 1]), np.array([float(i), 1.0]))
    np.testing.assert_array_equal(s._loss_history[0], [3.0, 4.0])
