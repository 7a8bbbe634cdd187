"""Schedule and coefficient-table tests, incl. parity of the linear schedule
with the diffusers DDIMScheduler defaults used on the reference training path
(torch-cpu is available as an independent oracle)."""

import numpy as np
import pytest

from fit_tpu.core import schedules as sch


def test_linear_named_schedule_1000():
    betas = sch.named_beta_schedule("linear", 1000)
    assert betas.shape == (1000,)
    assert betas.dtype == np.float64
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    # rescaling invariance: at 500 steps the range doubles
    b500 = sch.named_beta_schedule("linear", 500)
    assert b500[0] == pytest.approx(2e-4)
    assert b500[-1] == pytest.approx(0.04)


def test_alpha_bar_table_identities():
    betas = sch.named_beta_schedule("linear", 1000)
    c = sch.compute_coefficients(betas)
    assert c.num_timesteps == 1000
    np.testing.assert_allclose(c.alphas_cumprod, np.cumprod(1 - betas))
    np.testing.assert_allclose(c.sqrt_alphas_cumprod**2, c.alphas_cumprod)
    np.testing.assert_allclose(
        c.sqrt_one_minus_alphas_cumprod**2, 1 - c.alphas_cumprod
    )
    # prev/next shift identities
    assert c.alphas_cumprod_prev[0] == 1.0
    np.testing.assert_allclose(c.alphas_cumprod_prev[1:], c.alphas_cumprod[:-1])
    assert c.alphas_cumprod_next[-1] == 0.0
    # posterior mean coefs sum: coef1*sqrt(abar) + coef2*... verify the
    # standard identity coef1 + coef2*sqrt(alpha)*... via a random x0/xt pair
    # at t with closed form: mu = (b*sqrt(abar_prev)x0 + (1-abar_prev)sqrt(a)xt)/(1-abar)
    t = 123
    lhs = c.posterior_mean_coef1[t]
    rhs = betas[t] * np.sqrt(c.alphas_cumprod_prev[t]) / (1 - c.alphas_cumprod[t])
    assert lhs == pytest.approx(rhs)


def test_fixed_large_variance_slot0():
    betas = sch.named_beta_schedule("linear", 100)
    c = sch.compute_coefficients(betas)
    # t=0 slot holds posterior_variance[1], rest are betas
    assert c.fixed_large_variance[0] == c.posterior_variance[1]
    np.testing.assert_array_equal(c.fixed_large_variance[1:], betas[1:])
    np.testing.assert_allclose(
        c.fixed_large_log_variance, np.log(c.fixed_large_variance)
    )


def test_parity_with_diffusers_ddim_defaults():
    """The reference trains by noising with diffusers DDIMScheduler(1000)
    (FiT/train.py:38,53) and samples with the in-repo linear schedule; both
    must share one alpha-bar table. Oracle: recompute diffusers' default
    schedule (linear betas 1e-4..2e-2 over 1000 train steps) with torch."""
    torch = pytest.importorskip("torch")
    betas_t = torch.linspace(1e-4, 0.02, 1000, dtype=torch.float64)
    abar_t = torch.cumprod(1 - betas_t, dim=0).numpy()
    c = sch.compute_coefficients(sch.named_beta_schedule("linear", 1000))
    np.testing.assert_allclose(c.alphas_cumprod, abar_t, rtol=1e-12)


def test_space_timesteps_ddim_stride():
    steps = sch.space_timesteps(1000, "ddim250")
    assert len(steps) == 250
    assert steps == set(range(0, 1000, 4))


def test_space_timesteps_sections():
    # "250" = one section of 250 fractionally-strided steps
    steps = sch.space_timesteps(1000, "250")
    assert len(steps) == 250
    assert 0 in steps and 999 in steps
    # multi-section
    steps = sch.space_timesteps(300, [10, 15, 20])
    assert len(steps) == 45


def test_space_timesteps_errors():
    with pytest.raises(ValueError):
        sch.space_timesteps(10, "ddim7")  # no integer stride gives exactly 7
    with pytest.raises(ValueError):
        sch.space_timesteps(10, [20])  # section too small


def test_respaced_betas_recover_alpha_bar():
    """Respaced process must hit the same alpha-bars at kept steps."""
    base = sch.named_beta_schedule("linear", 1000)
    keep = sch.space_timesteps(1000, "50")
    new_betas, tmap = sch.respaced_betas(base, keep)
    assert new_betas.shape == (50,) and tmap.shape == (50,)
    assert sorted(tmap.tolist()) == tmap.tolist()
    c_base = sch.compute_coefficients(base)
    c_new = sch.compute_coefficients(new_betas)
    np.testing.assert_allclose(
        c_new.alphas_cumprod, c_base.alphas_cumprod[tmap], rtol=1e-12
    )


def test_deprecated_schedule_shapes():
    for name in ["quad", "warmup10", "warmup50", "const", "jsd"]:
        b = sch.beta_schedule(name, beta_start=1e-4, beta_end=0.02, num_steps=64)
        assert b.shape == (64,)
        assert (b > 0).all() and (b <= 1).all()
    b = sch.named_beta_schedule("squaredcos_cap_v2", 100)
    assert (b <= 0.999).all()
