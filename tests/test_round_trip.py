"""DDIM encode/decode round trip, absolute-pos model path, and the
continuous Gaussian likelihood."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fit_tpu.diffusion import (
    continuous_gaussian_log_likelihood,
    create_diffusion,
    ddim_reverse_loop,
    ddim_sample_loop,
)

SHAPE = (2, 4, 8, 8)


def fake_eps_model(scale=0.08):
    def model_fn(x, t):
        return scale * x

    return model_fn


def test_ddim_reverse_loop_matches_analytic_composition():
    """For a t-independent linear model eps(x) = a*x, every DDIM step (both
    directions) is multiplication by a scalar computable from the coefficient
    tables — the loop must match the closed-form product exactly (this pins
    step order, the alpha_bar_next table, and the eps-recompute semantics).
    """
    a = 0.08
    diff = create_diffusion("50")
    c = diff.c
    sr = c.sqrt_recip_alphas_cumprod.astype(np.float32)
    srm1 = c.sqrt_recipm1_alphas_cumprod.astype(np.float32)
    abar_prev = c.alphas_cumprod_prev.astype(np.float32)
    abar_next = c.alphas_cumprod_next.astype(np.float32)

    # forward (decode) multiplier at step t, and reverse (encode) multiplier
    x0_coef = sr - srm1 * a  # pred_xstart = x0_coef * x
    eps_coef = (sr - x0_coef) / srm1  # recomputed eps = a (identically)
    f = np.sqrt(abar_prev) * x0_coef + np.sqrt(1 - abar_prev) * eps_coef
    g = np.sqrt(abar_next) * x0_coef + np.sqrt(1 - abar_next) * eps_coef

    model = fake_eps_model(a)
    rng = np.random.default_rng(0)
    x_T = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    x_0 = ddim_sample_loop(diff, model, x_T, clip_denoised=False)
    want_dec = np.prod(f[::-1].astype(np.float64))  # t = 49..0
    np.testing.assert_allclose(
        np.asarray(x_0), want_dec * np.asarray(x_T), rtol=1e-4
    )

    x_T_rec = ddim_reverse_loop(diff, model, x_0, clip_denoised=False)
    want_enc = np.prod(g.astype(np.float64))  # t = 0..49
    np.testing.assert_allclose(
        np.asarray(x_T_rec), want_enc * np.asarray(x_0), rtol=1e-4
    )


def test_continuous_gaussian_ll():
    # standard normal at 0: log N(0|0,1) = -0.5*log(2*pi)
    ll = continuous_gaussian_log_likelihood(
        jnp.zeros(()), means=jnp.zeros(()), log_scales=jnp.zeros(())
    )
    assert float(ll) == pytest.approx(-0.5 * np.log(2 * np.pi))
    # shifting the mean by 1 sigma drops ll by 0.5
    ll2 = continuous_gaussian_log_likelihood(
        jnp.ones(()), means=jnp.zeros(()), log_scales=jnp.zeros(())
    )
    assert float(ll - ll2) == pytest.approx(0.5)


def test_absolute_pos_model_path():
    """pos_kind='absolute': additive sincos table instead of RoPE."""
    from fit_tpu.core.pos_embed import sincos_2d
    from fit_tpu.models import FiT

    model = FiT(
        patch_size=2, in_channels=4, hidden_size=64, depth=2, num_heads=4,
        num_classes=5, class_dropout_prob=0.0, pos_kind="absolute",
        attn_backend="xla",
    )
    rng = np.random.default_rng(1)
    T = 32
    tokens = jnp.asarray(rng.normal(size=(2, T, 16)).astype(np.float32))
    pos = jnp.asarray(np.broadcast_to(sincos_2d(64, 4, 8), (2, T, 64)).copy())
    mask = jnp.asarray(np.arange(T)[None] < np.array([[20], [32]]))
    t = jnp.asarray([1, 2])
    y = jnp.asarray([0, 1])
    params = model.init({"params": jax.random.PRNGKey(0)}, tokens, t, y, pos, mask, train=True)
    out = model.apply(params, tokens, t, y, pos, mask, train=True)
    assert out.shape == (2, T, 16)
    # pos table influences the output (params randomized first)
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    params = jax.tree.unflatten(
        td, [0.05 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    )
    o1 = model.apply(params, tokens, t, y, pos, mask, train=True)
    o2 = model.apply(params, tokens, t, y, pos * 2.0, mask, train=True)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 0
