"""Jitted sampling loops: DDPM ancestral and DDIM as ``lax.scan``.

TPU-first redesign of the reference's Python-level sampling loops
(``/root/reference/FiT/diffusion/gaussian_diffusion.py:431-523,612-692``):
the whole reverse trajectory is one compiled ``lax.scan``, so there is no
host-device round trip per step — the model forward, coefficient gathers and
update rule all fuse into a single device program. Per-step noise comes from
a folded PRNG key, or from an injected ``(S, ...)`` array for bit-parity
testing against reference semantics (the reference samplers accept explicit
``noise=`` for the initial latent only; per-step injection generalizes this
so every step is reproducible).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from fit_tpu.diffusion.gaussian import GaussianDiffusion

Array = jnp.ndarray

__all__ = ["p_sample_loop", "ddim_sample_loop", "cfg_model_fn"]


def _noise_for_step(
    rng: Optional[jax.Array],
    step_noise: Optional[Array],
    i: Array,
    shape,
    dtype,
) -> Array:
    if step_noise is not None:
        return step_noise[i]
    assert rng is not None, "stochastic sampling needs rng or injected noise"
    return jax.random.normal(jax.random.fold_in(rng, i), shape, dtype)


def p_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: Callable,
    x_T: Array,
    rng: Optional[jax.Array] = None,
    *,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    step_noise: Optional[Array] = None,
    return_trajectory: bool = False,
) -> Array:
    """DDPM ancestral sampling from ``x_T`` down to ``x_0``.

    ``model_fn(x, t)`` must already be bound to its conditioning; timestep
    remapping for respaced processes is applied here. ``step_noise``, if
    given, is ``(num_timesteps, *x_T.shape)`` with ``step_noise[i]`` the
    noise used at t=i (indexed by timestep value, not loop order).
    """
    wrapped = diffusion.wrap_model(model_fn)
    num = diffusion.num_timesteps

    def body(x, i):
        t = jnp.full((x.shape[0],), i)
        noise = _noise_for_step(rng, step_noise, i, x.shape, x.dtype)
        out = diffusion.p_sample(
            wrapped, x, t, noise, clip_denoised=clip_denoised,
            denoised_fn=denoised_fn, cond_fn=cond_fn,
        )
        return out["sample"], (out["sample"] if return_trajectory else None)

    ts = jnp.arange(num - 1, -1, -1)
    final, traj = jax.lax.scan(body, x_T, ts)
    return traj if return_trajectory else final


def ddim_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: Callable,
    x_T: Array,
    rng: Optional[jax.Array] = None,
    *,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    eta: float = 0.0,
    step_noise: Optional[Array] = None,
    return_trajectory: bool = False,
) -> Array:
    """DDIM sampling (deterministic at ``eta=0``, the reference default)."""
    wrapped = diffusion.wrap_model(model_fn)
    num = diffusion.num_timesteps

    def body(x, i):
        t = jnp.full((x.shape[0],), i)
        noise = (
            None if eta == 0.0 else _noise_for_step(rng, step_noise, i, x.shape, x.dtype)
        )
        out = diffusion.ddim_sample(
            wrapped, x, t, noise, clip_denoised=clip_denoised,
            denoised_fn=denoised_fn, cond_fn=cond_fn, eta=eta,
        )
        return out["sample"], (out["sample"] if return_trajectory else None)

    ts = jnp.arange(num - 1, -1, -1)
    final, traj = jax.lax.scan(body, x_T, ts)
    return traj if return_trajectory else final


def ddim_reverse_loop(
    diffusion: GaussianDiffusion,
    model_fn: Callable,
    x_0: Array,
    *,
    clip_denoised: bool = False,
    denoised_fn=None,
) -> Array:
    """DDIM reverse ODE (encoding): deterministic x_0 -> x_T, the inverse of
    ``ddim_sample_loop`` at eta=0 (iterates ``ddim_reverse_sample``,
    reference ``gaussian_diffusion.py:574-610``, over ascending t)."""
    wrapped = diffusion.wrap_model(model_fn)
    num = diffusion.num_timesteps

    def body(x, i):
        t = jnp.full((x.shape[0],), i)
        out = diffusion.ddim_reverse_sample(
            wrapped, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn
        )
        return out["sample"], None

    final, _ = jax.lax.scan(body, x_0, jnp.arange(num))
    return final


def cfg_model_fn(apply_fn: Callable, cfg_scale, in_channels: int = 4) -> Callable:
    """Wrap a plain conditional ``apply_fn(x, t) -> out`` into the GLIDE-style
    CFG duplicated-batch protocol used by ``FiT.forward_with_cfg``: callers
    pack the batch as [cond | uncond] halves with identical latents.

    Prefer ``FiT.forward_with_cfg`` via ``model.apply(..., method=...)`` —
    this helper exists for custom models without a built-in CFG method.
    """

    def wrapped(x, t):
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        out = apply_fn(combined, t)
        eps, rest = out[:, :in_channels], out[:, in_channels:]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        guided = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([guided, guided], axis=0)
        return jnp.concatenate([eps, rest], axis=1)

    return wrapped
