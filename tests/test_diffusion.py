"""Diffusion-process tests: parity of q/p math with an independent torch
oracle (same IDDPM equations, written from the math), sampler loop
correctness, respacing, VLB terms, and DPM-Solver exactness properties."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fit_tpu.core.schedules import compute_coefficients, named_beta_schedule
from fit_tpu.diffusion import (
    GaussianDiffusion,
    ModelMeanType,
    ModelVarType,
    create_diffusion,
    ddim_sample_loop,
    dpm_solver_pp_2m,
    masked_global_mse,
    p_sample_loop,
)

SHAPE = (2, 4, 8, 8)


def fake_eps_model(scale=0.1):
    """A deterministic stand-in denoiser: eps = scale * x (any smooth fn)."""

    def model_fn(x, t):
        return scale * x * (1.0 + 0.001 * t.astype(x.dtype).reshape(-1, 1, 1, 1))

    return model_fn


def torch_oracle_ddpm_step(x, t, eps, noise, coeffs, clip):
    """Independent torch implementation of one DDPM ancestral step with
    FIXED_LARGE variance (IDDPM eqs., fp32)."""
    import torch

    xt = torch.tensor(x)
    ep = torch.tensor(eps)
    nz = torch.tensor(noise)

    def at(table):
        return torch.tensor(table[t], dtype=torch.float32).view(-1, 1, 1, 1)

    x0 = at(coeffs.sqrt_recip_alphas_cumprod) * xt - at(coeffs.sqrt_recipm1_alphas_cumprod) * ep
    if clip:
        x0 = x0.clamp(-1, 1)
    mean = at(coeffs.posterior_mean_coef1) * x0 + at(coeffs.posterior_mean_coef2) * xt
    logvar = at(coeffs.fixed_large_log_variance)
    nonzero = torch.tensor((t != 0).astype(np.float32)).view(-1, 1, 1, 1)
    return (mean + nonzero * torch.exp(0.5 * logvar) * nz).numpy()


def torch_oracle_ddim_step(x, t, eps, coeffs, clip):
    import torch

    xt = torch.tensor(x)
    ep = torch.tensor(eps)

    def at(table):
        return torch.tensor(table[t], dtype=torch.float32).view(-1, 1, 1, 1)

    x0 = at(coeffs.sqrt_recip_alphas_cumprod) * xt - at(coeffs.sqrt_recipm1_alphas_cumprod) * ep
    if clip:
        x0 = x0.clamp(-1, 1)
    eps_re = (at(coeffs.sqrt_recip_alphas_cumprod) * xt - x0) / at(
        coeffs.sqrt_recipm1_alphas_cumprod
    )
    abar_prev = at(coeffs.alphas_cumprod_prev)
    return (x0 * torch.sqrt(abar_prev) + torch.sqrt(1 - abar_prev) * eps_re).numpy()


@pytest.fixture(scope="module")
def diff1000():
    return create_diffusion(None)  # 1000 steps, eps, FIXED_LARGE, linear


def test_q_sample_parity_fp32(diff1000):
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=SHAPE).astype(np.float32)
    noise = rng.normal(size=SHAPE).astype(np.float32)
    t = np.array([3, 777])
    got = np.asarray(diff1000.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
    c = diff1000.c
    want = (
        c.sqrt_alphas_cumprod[t].astype(np.float32)[:, None, None, None] * x0
        + c.sqrt_one_minus_alphas_cumprod[t].astype(np.float32)[:, None, None, None] * noise
    )
    np.testing.assert_array_equal(got, want)


def test_p_sample_step_vs_torch_oracle(diff1000):
    pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.normal(size=SHAPE).astype(np.float32)
    noise = rng.normal(size=SHAPE).astype(np.float32)
    t = np.array([999, 0])
    model = fake_eps_model()
    eps = np.asarray(model(jnp.asarray(x), jnp.asarray(t)))
    out = diff1000.p_sample(
        model, jnp.asarray(x), jnp.asarray(t), jnp.asarray(noise), clip_denoised=True
    )["sample"]
    want = torch_oracle_ddpm_step(x, t, eps, noise, diff1000.c, clip=True)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_ddim_step_vs_torch_oracle(diff1000):
    pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.normal(size=SHAPE).astype(np.float32)
    t = np.array([500, 10])
    model = fake_eps_model()
    eps = np.asarray(model(jnp.asarray(x), jnp.asarray(t)))
    out = diff1000.ddim_sample(model, jnp.asarray(x), jnp.asarray(t), clip_denoised=False)[
        "sample"
    ]
    want = torch_oracle_ddim_step(x, t, eps, diff1000.c, clip=False)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_ddim_loop_vs_torch_oracle_loop():
    """Full 10-step respaced DDIM trajectory vs the torch oracle stepping the
    same respaced process."""
    pytest.importorskip("torch")
    diff = create_diffusion("10")
    assert diff.num_timesteps == 10 and diff.timestep_map is not None
    rng = np.random.default_rng(3)
    x = rng.normal(size=SHAPE).astype(np.float32)
    model = fake_eps_model()

    got = np.asarray(
        ddim_sample_loop(diff, model, jnp.asarray(x), clip_denoised=False)
    )

    cur = x
    for i in range(9, -1, -1):
        t = np.full((SHAPE[0],), i)
        t_model = diff.timestep_map[t]
        eps = np.asarray(model(jnp.asarray(cur), jnp.asarray(t_model)))
        cur = torch_oracle_ddim_step(cur, t, eps, diff.c, clip=False)
    np.testing.assert_allclose(got, cur, rtol=2e-6, atol=1e-6)


def test_p_sample_loop_with_injected_noise():
    """DDPM loop with injected per-step noise is deterministic & reproducible."""
    diff = create_diffusion("5")
    rng = np.random.default_rng(4)
    x = rng.normal(size=SHAPE).astype(np.float32)
    step_noise = rng.normal(size=(5,) + SHAPE).astype(np.float32)
    a = p_sample_loop(diff, fake_eps_model(), jnp.asarray(x), step_noise=jnp.asarray(step_noise))
    b = p_sample_loop(diff, fake_eps_model(), jnp.asarray(x), step_noise=jnp.asarray(step_noise))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and differs for different noise
    c = p_sample_loop(
        diff, fake_eps_model(), jnp.asarray(x), step_noise=jnp.asarray(step_noise + 1.0)
    )
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_trajectory_shape():
    diff = create_diffusion("5")
    x = jnp.zeros(SHAPE)
    traj = ddim_sample_loop(diff, fake_eps_model(), x, return_trajectory=True)
    assert traj.shape == (5,) + SHAPE


def test_ddim_exact_for_constant_x0():
    """If the model's implied x0 is a constant c for all t, DDIM's final
    sample equals c exactly (the update is exact for constant data pred)."""
    diff = create_diffusion("25")
    c = 0.37
    sr = jnp.asarray(diff.c.sqrt_recip_alphas_cumprod.astype(np.float32))
    srm1 = jnp.asarray(diff.c.sqrt_recipm1_alphas_cumprod.astype(np.float32))
    tmap = {orig: i for i, orig in enumerate(diff.timestep_map)}
    inv = np.zeros(diff.original_num_steps, np.int32)
    for orig, local in tmap.items():
        inv[orig] = local
    inv = jnp.asarray(inv)

    def model_fn(x, t_orig):
        tl = inv[t_orig].reshape(-1, 1, 1, 1)  # local step index
        return (sr[tl] * x - c) / srm1[tl]

    rng = np.random.default_rng(5)
    x = rng.normal(size=SHAPE).astype(np.float32)
    out = ddim_sample_loop(diff, model_fn, jnp.asarray(x), clip_denoised=False)
    np.testing.assert_allclose(np.asarray(out), c, atol=1e-4)


def test_dpm_solver_exact_for_constant_x0():
    diff = create_diffusion("20")
    c = -0.21
    sr = jnp.asarray(diff.c.sqrt_recip_alphas_cumprod.astype(np.float32))
    srm1 = jnp.asarray(diff.c.sqrt_recipm1_alphas_cumprod.astype(np.float32))
    inv = np.zeros(diff.original_num_steps, np.int32)
    for i, orig in enumerate(diff.timestep_map):
        inv[orig] = i
    inv = jnp.asarray(inv)

    def model_fn(x, t_orig):
        tl = inv[t_orig].reshape(-1, 1, 1, 1)
        return (sr[tl] * x - c) / srm1[tl]

    rng = np.random.default_rng(6)
    x = rng.normal(size=SHAPE).astype(np.float32)
    out = dpm_solver_pp_2m(diff, model_fn, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), c, atol=1e-3)


def test_dpm_solver_converges_faster_than_ddim():
    """Both integrate the same probability-flow ODE; the 2nd-order solver at
    50 steps must land closer to the fine-grained (1000-step DDIM) solution
    than 1st-order DDIM at 50 steps does."""
    model = fake_eps_model(0.05)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    ref = np.asarray(
        ddim_sample_loop(create_diffusion(None), model, x, clip_denoised=False)
    )
    coarse = create_diffusion("50")
    a = np.asarray(ddim_sample_loop(coarse, model, x, clip_denoised=False))
    b = np.asarray(dpm_solver_pp_2m(coarse, model, x))
    err_ddim = np.abs(a - ref).mean()
    err_dpm = np.abs(b - ref).mean()
    assert err_dpm < err_ddim, (err_dpm, err_ddim)
    assert err_dpm < 0.05 * np.abs(ref).mean(), (err_dpm, np.abs(ref).mean())


def test_learned_range_variance_split():
    """LEARNED_RANGE: 8-channel model output splits into mean/var halves and
    log-variance interpolates between posterior (frac=-1... frac maps [-1,1]
    to [min,max])."""
    diff = GaussianDiffusion(
        betas=named_beta_schedule("linear", 100),
        model_var_type=ModelVarType.LEARNED_RANGE,
    )
    x = jnp.zeros((1, 4, 4, 4))
    t = jnp.asarray([50])

    def model(x_, t_):
        eps = jnp.zeros_like(x_)
        v = jnp.ones_like(x_)  # frac=1 -> max_log = log(beta_t)
        return jnp.concatenate([eps, v], axis=1)

    out = diff.p_mean_variance(model, x, t, clip_denoised=False)
    want = np.log(diff.c.betas[50]).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out["log_variance"])[0, 0, 0, 0], want, rtol=1e-6)

    def model_min(x_, t_):
        return jnp.concatenate([jnp.zeros_like(x_), -jnp.ones_like(x_)], axis=1)

    out = diff.p_mean_variance(model_min, x, t, clip_denoised=False)
    want = diff.c.posterior_log_variance_clipped[50].astype(np.float32)
    np.testing.assert_allclose(np.asarray(out["log_variance"])[0, 0, 0, 0], want, rtol=1e-6)


def test_training_losses_mse_and_mask():
    diff = create_diffusion(None)
    rng = np.random.default_rng(8)
    B, T, D = 2, 16, 8
    x0 = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    t = jnp.asarray([100, 900])
    mask = jnp.asarray(np.arange(T)[None, :] < np.array([[10], [16]])[:, 0:1])

    def model(x, t_):
        return 0.9 * noise  # close to target eps

    terms = diff.training_losses(model, x0, t, noise, mask=mask)
    # per-sample masked mse equals mean over valid tokens of (0.1*noise)^2
    want0 = np.mean((0.1 * np.asarray(noise)[0, :10]) ** 2)
    want1 = np.mean((0.1 * np.asarray(noise)[1, :16]) ** 2)
    np.testing.assert_allclose(np.asarray(terms["mse"]), [want0, want1], rtol=1e-5)

    # global-mean variant == torch F.mse_loss(out[mask], target[mask]) parity
    pytest.importorskip("torch")
    import torch

    out_ = 0.9 * np.asarray(noise)
    g = masked_global_mse(jnp.asarray(out_), noise, mask)
    m = np.asarray(mask)
    want = torch.nn.functional.mse_loss(
        torch.tensor(out_)[torch.tensor(m)], torch.tensor(np.asarray(noise))[torch.tensor(m)]
    ).item()
    np.testing.assert_allclose(float(g), want, rtol=1e-6)


def test_vb_and_bpd_finite():
    diff = create_diffusion("10")
    rng = np.random.default_rng(9)
    x0 = jnp.asarray((rng.uniform(-1, 1, size=SHAPE)).astype(np.float32))
    model = fake_eps_model()
    out = diff.calc_bpd_loop(model, x0, jax.random.PRNGKey(0))
    assert out["total_bpd"].shape == (SHAPE[0],)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    assert out["vb"].shape == (SHAPE[0], 10)


def test_create_diffusion_variants():
    d = create_diffusion(None, predict_xstart=True, learn_sigma=True, use_kl=True)
    assert d.model_mean_type == ModelMeanType.START_X
    assert d.model_var_type == ModelVarType.LEARNED_RANGE
    assert d.loss_type.is_vb()
    d = create_diffusion("ddim50", sigma_small=True)
    assert d.num_timesteps == 50
    assert d.model_var_type == ModelVarType.FIXED_SMALL


def test_ddim_eta_stochastic():
    """eta > 0 DDIM: deterministic given injected noise; noise-free at t=0;
    matches the closed-form sigma blend against the oracle step."""
    pytest.importorskip("torch")
    import torch

    diff = create_diffusion("10")
    rng = np.random.default_rng(12)
    x = rng.normal(size=SHAPE).astype(np.float32)
    noise = rng.normal(size=SHAPE).astype(np.float32)
    t = np.array([5, 0])
    model = fake_eps_model()
    eps = np.asarray(model(jnp.asarray(x), jnp.asarray(t)))
    eta = 0.7
    out = diff.ddim_sample(
        model, jnp.asarray(x), jnp.asarray(t), jnp.asarray(noise),
        clip_denoised=False, eta=eta,
    )["sample"]

    c = diff.c

    def at(table):
        return torch.tensor(table[t], dtype=torch.float32).view(-1, 1, 1, 1)

    xt = torch.tensor(x)
    ep = torch.tensor(eps)
    x0 = at(c.sqrt_recip_alphas_cumprod) * xt - at(c.sqrt_recipm1_alphas_cumprod) * ep
    eps_re = (at(c.sqrt_recip_alphas_cumprod) * xt - x0) / at(c.sqrt_recipm1_alphas_cumprod)
    ab, abp = at(c.alphas_cumprod), at(c.alphas_cumprod_prev)
    sigma = eta * torch.sqrt((1 - abp) / (1 - ab)) * torch.sqrt(1 - ab / abp)
    mean = x0 * torch.sqrt(abp) + torch.sqrt(1 - abp - sigma**2) * eps_re
    nonzero = torch.tensor((t != 0).astype(np.float32)).view(-1, 1, 1, 1)
    want = (mean + nonzero * sigma * torch.tensor(noise)).numpy()
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)
    # t=0 row got no noise
    assert np.array_equal(np.asarray(out)[1], want[1])


def test_cfg_model_fn_wrapper():
    from fit_tpu.diffusion import cfg_model_fn

    def apply_fn(x, t):
        # cond half sees its own values; output = x * 2
        return x * 2.0

    wrapped = cfg_model_fn(apply_fn, cfg_scale=3.0, in_channels=4)
    rng = np.random.default_rng(13)
    half = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)
    x = jnp.asarray(np.concatenate([half, half]))
    out = np.asarray(wrapped(x, jnp.zeros((4,))))
    # cond == uncond here, so guidance collapses to the plain output
    np.testing.assert_allclose(out, np.asarray(x) * 2.0, atol=1e-6)
    assert out.shape == (4, 4, 4, 4)
