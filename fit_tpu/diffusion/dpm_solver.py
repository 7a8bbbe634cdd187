"""DPM-Solver++ (2M): deterministic fast sampling in 20-50 steps.

Second-order multistep solver in the data-prediction (x0) formulation
(Lu et al., "DPM-Solver++", arXiv:2211.01095, Eq. (4.2)/(4.3) adapted to a
discrete schedule). This is an *additive* capability over the reference —
jlnk03/FiT ships only DDPM/DDIM (see BASELINE.json config 3) — implemented
as the same ``lax.scan`` shape as the other samplers so it jits identically.

Discrete-schedule notation: at respaced step i with cumulative product
``abar_i``, the solver's half-log-SNR is ``lam_i = 0.5*log(abar_i/(1-abar_i))``,
``alpha_i = sqrt(abar_i)``, ``sigma_i = sqrt(1-abar_i)``. Update from step s
to step t with ``h = lam_t - lam_s``:

  1st order:  x_t = (sigma_t/sigma_s) x_s - alpha_t (e^{-h} - 1) x0(x_s)
  2M:         replace x0 by the extrapolation
              (1 + 1/(2 r)) x0_s - 1/(2 r) x0_prev,  r = h_prev / h.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fit_tpu.diffusion.gaussian import GaussianDiffusion, ModelMeanType

Array = jnp.ndarray

__all__ = ["dpm_solver_pp_2m"]


def dpm_solver_pp_2m(
    diffusion: GaussianDiffusion,
    model_fn: Callable,
    x_T: Array,
    *,
    clip_denoised: bool = False,
) -> Array:
    """Sample with DPM-Solver++(2M) over the diffusion's (respaced) steps.

    ``diffusion`` should be a respaced process with the desired step count
    (e.g. ``create_diffusion("ddim25")`` semantics but any respacing works);
    ``model_fn(x, t)`` takes *original-process* timesteps if the process is
    respaced — remapping happens here, like the other samplers.
    """
    wrapped = diffusion.wrap_model(model_fn)
    c = diffusion.c
    n_steps = diffusion.num_timesteps

    abar = c.alphas_cumprod  # fp64 host table, ascending in t
    alpha = np.sqrt(abar).astype(np.float32)
    sigma = np.sqrt(1.0 - abar).astype(np.float32)
    lam = (0.5 * (np.log(abar) - np.log(1.0 - abar))).astype(np.float32)
    alpha_j = jnp.asarray(alpha)
    sigma_j = jnp.asarray(sigma)
    lam_j = jnp.asarray(lam)

    def predict_x0(x, i):
        t = jnp.full((x.shape[0],), i)
        out = wrapped(x, t)
        if diffusion.model_mean_type == ModelMeanType.START_X:
            x0 = out[:, : x.shape[1]] if out.shape[1] != x.shape[1] else out
        else:
            eps = out[:, : x.shape[1]] if out.shape[1] != x.shape[1] else out
            x0 = (x - sigma_j[i] * eps) / alpha_j[i]
        if clip_denoised:
            x0 = jnp.clip(x0, -1, 1)
        return x0

    # step index sequence: high noise -> low noise, ending at step 0
    steps = jnp.arange(n_steps - 1, -1, -1)

    def body(carry, idx):
        x, x0_prev, lam_prev_prev, first = carry
        i_s = steps[idx]  # current step (source)
        i_t = jnp.maximum(i_s - 1, 0)  # target step

        x0_s = predict_x0(x, i_s)
        lam_s, lam_t = lam_j[i_s], lam_j[i_t]
        h = lam_t - lam_s
        ratio = sigma_j[i_t] / sigma_j[i_s]
        phi = jnp.expm1(-h)  # e^{-h} - 1

        # 2M extrapolated data prediction (falls back to 1st order on step 0)
        h_prev = lam_s - lam_prev_prev
        r = h_prev / h
        d_2m = (1 + 1 / (2 * r)) * x0_s - (1 / (2 * r)) * x0_prev
        d = jnp.where(first, x0_s, d_2m)

        x_t = ratio * x - alpha_j[i_t] * phi * d
        # at the final transition (i_s == 0) there is no move: keep x0
        x_t = jnp.where(i_s == 0, x0_s, x_t)
        return (x_t, x0_s, lam_s, jnp.zeros_like(first)), None

    init = (
        x_T,
        jnp.zeros_like(x_T),
        jnp.float32(0.0),
        jnp.ones((), bool),
    )
    (x, _, _, _), _ = jax.lax.scan(body, init, jnp.arange(n_steps))
    return x
