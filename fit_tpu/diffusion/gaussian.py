"""Gaussian diffusion process: q/p distributions, losses, VLB metrics.

Semantics parity with the reference ADM/IDDPM port
(``/root/reference/FiT/diffusion/gaussian_diffusion.py``), re-designed for
JAX: the process is a frozen dataclass of precomputed coefficient tables
(fp64-derived, stored fp32 — matching the reference's index-then-``.float()``
in ``_extract_into_tensor``, ``gaussian_diffusion.py:882-894``), and every
method is a pure function of arrays, so any of them can sit inside ``jit`` /
``lax.scan`` / ``grad`` without special casing. The model is always passed as
a plain callable ``model_fn(x, t) -> output`` with conditioning already bound
(partial application replaces the reference's ``model_kwargs`` plumbing).

Timestep respacing (reference ``respace.py``) is folded in: a respaced
process carries a static ``timestep_map`` and remaps model-visible timesteps
inside :meth:`wrap_model` — the jit-friendly equivalent of ``_WrappedModel``.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from fit_tpu.core.schedules import (
    compute_coefficients,
    named_beta_schedule,
    respaced_betas,
    space_timesteps,
)

Array = jnp.ndarray
ModelFn = Callable[..., Array]

__all__ = [
    "ModelMeanType",
    "ModelVarType",
    "LossType",
    "GaussianDiffusion",
    "create_diffusion",
    "normal_kl",
    "discretized_gaussian_log_likelihood",
]


class ModelMeanType(enum.Enum):
    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()


class ModelVarType(enum.Enum):
    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()

    def is_vb(self):
        return self in (LossType.KL, LossType.RESCALED_KL)


# ---------------------------------------------------------------------------
# math utils (reference diffusion_utils.py)
# ---------------------------------------------------------------------------


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, var1) || N(mean2, var2)), elementwise, broadcastable."""
    logvar1, logvar2 = jnp.asarray(logvar1), jnp.asarray(logvar2)
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + (jnp.asarray(mean1) - jnp.asarray(mean2)) ** 2 * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def continuous_gaussian_log_likelihood(x, *, means, log_scales):
    """Continuous Gaussian log-likelihood in nats
    (reference ``diffusion_utils.py:47-59``)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    normalized = centered * inv_stdv
    return -0.5 * (normalized**2 + np.log(2 * np.pi))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a Gaussian discretized to uint8 bins rescaled to
    [-1, 1] (reference ``diffusion_utils.py:62-88``)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255.0))
    cdf_min = approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    log_cdf_delta = jnp.log(jnp.clip(cdf_plus - cdf_min, min=1e-12))
    return jnp.where(
        x < -0.999, log_cdf_plus, jnp.where(x > 0.999, log_one_minus_cdf_min, log_cdf_delta)
    )


def mean_flat(x: Array) -> Array:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def masked_mean_flat(x: Array, mask: Optional[Array]) -> Array:
    """Per-sample mean over valid elements only. ``mask`` is (N, T) boolean
    broadcast over trailing dims of ``x`` (N, T, ...)."""
    if mask is None:
        return mean_flat(x)
    m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)).astype(x.dtype)
    num = jnp.clip(jnp.sum(m, axis=tuple(range(1, x.ndim))), min=1.0)
    denom_per_token = float(np.prod(x.shape[mask.ndim:])) if x.ndim > mask.ndim else 1.0
    return jnp.sum(x * m, axis=tuple(range(1, x.ndim))) / (num * denom_per_token)


def _extract(table: np.ndarray, t: Array, ndim: int) -> Array:
    """Index a host fp64 table at t, emit fp32, broadcast to ndim dims.

    Parity with ``_extract_into_tensor``: the fp64 value is rounded to fp32
    *after* indexing, so per-step scalars match torch bit-for-bit.
    """
    vals = jnp.asarray(table.astype(np.float32))[t]
    return vals.reshape(vals.shape + (1,) * (ndim - 1))


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """A (possibly respaced) Gaussian diffusion process.

    ``betas`` is the 1-D fp64 schedule of this process; when respaced,
    ``timestep_map`` maps local step indices to the original process's
    timesteps for the model (which was trained on original indices), and
    ``original_num_steps`` records the base process length.
    """

    betas: np.ndarray
    model_mean_type: ModelMeanType = ModelMeanType.EPSILON
    model_var_type: ModelVarType = ModelVarType.FIXED_LARGE
    loss_type: LossType = LossType.MSE
    timestep_map: Optional[np.ndarray] = None
    original_num_steps: Optional[int] = None

    def __post_init__(self):
        object.__setattr__(self, "c", compute_coefficients(self.betas))
        if self.original_num_steps is None:
            object.__setattr__(self, "original_num_steps", len(self.betas))

    @property
    def num_timesteps(self) -> int:
        return self.c.num_timesteps

    # -- model wrapping (timestep remap for respaced processes) -------------

    def wrap_model(self, model_fn: ModelFn) -> ModelFn:
        """Remap local timesteps to original-process indices before calling
        the model (reference ``respace.py:117-129``)."""
        if self.timestep_map is None:
            return model_fn
        tmap = jnp.asarray(self.timestep_map)

        def wrapped(x, ts, **kwargs):
            return model_fn(x, tmap[ts], **kwargs)

        return wrapped

    # -- q distributions -----------------------------------------------------

    def q_mean_variance(self, x_start: Array, t: Array):
        mean = _extract(self.c.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        variance = _extract(1.0 - self.c.alphas_cumprod, t, x_start.ndim)
        log_variance = _extract(self.c.log_one_minus_alphas_cumprod, t, x_start.ndim)
        return mean, variance, log_variance

    def q_sample(self, x_start: Array, t: Array, noise: Array) -> Array:
        """Sample q(x_t | x_0) with explicit noise (injected for parity)."""
        return (
            _extract(self.c.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(self.c.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def q_posterior_mean_variance(self, x_start: Array, x_t: Array, t: Array):
        mean = (
            _extract(self.c.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _extract(self.c.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        variance = _extract(self.c.posterior_variance, t, x_t.ndim)
        log_variance = _extract(self.c.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, variance, log_variance

    # -- p distribution (model) ----------------------------------------------

    def p_mean_variance(
        self,
        model_fn: ModelFn,
        x: Array,
        t: Array,
        clip_denoised: bool = True,
        denoised_fn=None,
    ) -> dict:
        """Compute p(x_{t-1} | x_t) moments and the x0 prediction
        (reference ``gaussian_diffusion.py:266-344``). ``model_fn`` must
        already be wrapped (see :meth:`wrap_model`) and bound to its
        conditioning."""
        B, C = x.shape[:2]
        model_output = model_fn(x, t)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = jnp.split(model_output, 2, axis=1)
            min_log = _extract(self.c.posterior_log_variance_clipped, t, x.ndim)
            max_log = _extract(np.log(self.c.betas), t, x.ndim)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
        else:
            var_tables = {
                ModelVarType.FIXED_LARGE: (
                    self.c.fixed_large_variance,
                    self.c.fixed_large_log_variance,
                ),
                ModelVarType.FIXED_SMALL: (
                    self.c.posterior_variance,
                    self.c.posterior_log_variance_clipped,
                ),
            }[self.model_var_type]
            model_variance = _extract(var_tables[0], t, x.ndim)
            model_log_variance = _extract(var_tables[1], t, x.ndim)

        def process_xstart(xs):
            if denoised_fn is not None:
                xs = denoised_fn(xs)
            if clip_denoised:
                xs = jnp.clip(xs, -1, 1)
            return xs

        if self.model_mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
        else:
            pred_xstart = process_xstart(self._predict_xstart_from_eps(x, t, model_output))
        model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    def _predict_xstart_from_eps(self, x_t: Array, t: Array, eps: Array) -> Array:
        return (
            _extract(self.c.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(self.c.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
        )

    def _predict_eps_from_xstart(self, x_t: Array, t: Array, pred_xstart: Array) -> Array:
        return (
            _extract(self.c.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - pred_xstart
        ) / _extract(self.c.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    # -- guidance hooks (reference gaussian_diffusion.py:358-386) ------------

    def condition_mean(self, cond_fn, p_mean_var: dict, x: Array, t: Array) -> Array:
        gradient = cond_fn(x, t)
        return p_mean_var["mean"].astype(jnp.float32) + p_mean_var["variance"] * gradient.astype(
            jnp.float32
        )

    def condition_score(self, cond_fn, p_mean_var: dict, x: Array, t: Array) -> dict:
        alpha_bar = _extract(self.c.alphas_cumprod, t, x.ndim)
        eps = self._predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, t)
        out = dict(p_mean_var)
        out["pred_xstart"] = self._predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(out["pred_xstart"], x, t)
        return out

    # -- single reverse steps -------------------------------------------------

    def p_sample(
        self,
        model_fn: ModelFn,
        x: Array,
        t: Array,
        noise: Array,
        clip_denoised: bool = True,
        denoised_fn=None,
        cond_fn=None,
    ) -> dict:
        """One DDPM ancestral step with explicit noise
        (reference ``gaussian_diffusion.py:388-429``)."""
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn)
        nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        if cond_fn is not None:
            out["mean"] = self.condition_mean(cond_fn, out, x, t)
        sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_sample(
        self,
        model_fn: ModelFn,
        x: Array,
        t: Array,
        noise: Optional[Array] = None,
        clip_denoised: bool = True,
        denoised_fn=None,
        cond_fn=None,
        eta: float = 0.0,
    ) -> dict:
        """One DDIM step (reference ``gaussian_diffusion.py:525-572``)."""
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn)
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t)
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])

        alpha_bar = _extract(self.c.alphas_cumprod, t, x.ndim)
        alpha_bar_prev = _extract(self.c.alphas_cumprod_prev, t, x.ndim)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        if eta == 0.0:
            sample = mean_pred  # deterministic path needs no noise input
        else:
            assert noise is not None, "eta > 0 DDIM requires noise"
            sample = mean_pred + nonzero * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(
        self,
        model_fn: ModelFn,
        x: Array,
        t: Array,
        clip_denoised: bool = True,
        denoised_fn=None,
        cond_fn=None,
        eta: float = 0.0,
    ) -> dict:
        """One reverse-ODE (encoding) DDIM step
        (reference ``gaussian_diffusion.py:574-610``)."""
        assert eta == 0.0, "Reverse ODE only for deterministic path"
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn)
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t)
        eps = (
            _extract(self.c.sqrt_recip_alphas_cumprod, t, x.ndim) * x - out["pred_xstart"]
        ) / _extract(self.c.sqrt_recipm1_alphas_cumprod, t, x.ndim)
        alpha_bar_next = _extract(self.c.alphas_cumprod_next, t, x.ndim)
        mean_pred = out["pred_xstart"] * jnp.sqrt(alpha_bar_next) + jnp.sqrt(
            1 - alpha_bar_next
        ) * eps
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    # -- losses ---------------------------------------------------------------

    def vb_terms_bpd(
        self, model_fn: ModelFn, x_start: Array, x_t: Array, t: Array,
        clip_denoised: bool = True, mask: Optional[Array] = None,
    ) -> dict:
        """Per-timestep variational-bound term in bits
        (reference ``gaussian_diffusion.py:694-725``)."""
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(model_fn, x_t, t, clip_denoised)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = masked_mean_flat(kl, mask) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = masked_mean_flat(decoder_nll, mask) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(
        self,
        model_fn: ModelFn,
        x_start: Array,
        t: Array,
        noise: Array,
        mask: Optional[Array] = None,
    ) -> dict:
        """Training loss terms (reference ``gaussian_diffusion.py:727-808``).

        ``mask`` is the (N, T) token-validity mask: MSE is averaged over
        valid tokens only (the reference selects ``model_output[mask]`` then
        takes a global mean; here the per-sample masked means are returned —
        take ``.mean()`` for the reference's global scalar when every sample
        has the same valid count, or use :func:`masked_global_mse` below for
        exact global-mean parity).
        """
        x_t = self.q_sample(x_start, t, noise)
        terms = {}

        if self.loss_type in (LossType.KL, LossType.RESCALED_KL):
            terms["loss"] = self.vb_terms_bpd(
                model_fn, x_start, x_t, t, clip_denoised=False, mask=mask
            )["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        model_output = model_fn(x_t, t)
        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = jnp.split(model_output, 2, axis=1)
            # learn variance via VLB without affecting the mean prediction
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=1
            )
            terms["vb"] = self.vb_terms_bpd(
                lambda *_args: frozen, x_start, x_t, t, clip_denoised=False, mask=mask
            )["output"]
            if self.loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)

        target = {
            ModelMeanType.PREVIOUS_X: self.q_posterior_mean_variance(x_start, x_t, t)[0],
            ModelMeanType.START_X: x_start,
            ModelMeanType.EPSILON: noise,
        }[self.model_mean_type]
        terms["mse"] = masked_mean_flat((target - model_output) ** 2, mask)
        terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
        return terms

    def prior_bpd(self, x_start: Array) -> Array:
        """Prior KL term in bits/dim (reference ``gaussian_diffusion.py:810-824``)."""
        t = jnp.full((x_start.shape[0],), self.num_timesteps - 1)
        qt_mean, _, qt_log_var = self.q_mean_variance(x_start, t)
        kl = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
        return mean_flat(kl) / np.log(2.0)

    def calc_bpd_loop(
        self, model_fn: ModelFn, x_start: Array, rng: jax.Array, clip_denoised: bool = True
    ) -> dict:
        """Full VLB over all timesteps (reference ``gaussian_diffusion.py:826-879``),
        as a ``lax.scan`` over descending t."""
        model_fn = self.wrap_model(model_fn)
        n = x_start.shape[0]

        def body(carry, ti):
            key = jax.random.fold_in(rng, ti)
            noise = jax.random.normal(key, x_start.shape, x_start.dtype)
            t_b = jnp.full((n,), ti)
            x_t = self.q_sample(x_start, t_b, noise)
            out = self.vb_terms_bpd(model_fn, x_start, x_t, t_b, clip_denoised)
            eps = self._predict_eps_from_xstart(x_t, t_b, out["pred_xstart"])
            return carry, (
                out["output"],
                mean_flat((out["pred_xstart"] - x_start) ** 2),
                mean_flat((eps - noise) ** 2),
            )

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        _, (vb, xstart_mse, mse) = jax.lax.scan(body, None, ts)
        vb, xstart_mse, mse = (jnp.swapaxes(a, 0, 1) for a in (vb, xstart_mse, mse))
        prior = self.prior_bpd(x_start)
        return {
            "total_bpd": vb.sum(axis=1) + prior,
            "prior_bpd": prior,
            "vb": vb,
            "xstart_mse": xstart_mse,
            "mse": mse,
        }


def masked_global_mse(model_output: Array, target: Array, mask: Array) -> Array:
    """Global-mean masked MSE — exact parity with the reference training
    step's ``F.mse_loss(model_output[mask], noise[mask])``
    (``FiT/train.py:63-66``): one mean over all valid elements of the batch.
    """
    m = mask.reshape(mask.shape + (1,) * (model_output.ndim - mask.ndim))
    se = jnp.where(m, (model_output - target) ** 2, 0.0)
    denom = jnp.sum(m.astype(se.dtype)) * float(
        np.prod(model_output.shape[mask.ndim:]) if model_output.ndim > mask.ndim else 1.0
    )
    return jnp.sum(se) / jnp.maximum(denom, 1.0)


def create_diffusion(
    timestep_respacing: Union[str, Sequence[int], None],
    noise_schedule: str = "linear",
    use_kl: bool = False,
    sigma_small: bool = False,
    predict_xstart: bool = False,
    learn_sigma: bool = False,
    rescale_learned_sigmas: bool = False,
    diffusion_steps: int = 1000,
) -> GaussianDiffusion:
    """Factory with reference-identical defaults
    (``/root/reference/FiT/diffusion/__init__.py:10-46``): linear betas,
    eps-prediction, FIXED_LARGE variance, MSE loss, 1000 base steps.
    """
    betas = named_beta_schedule(noise_schedule, diffusion_steps)
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    if timestep_respacing is None or timestep_respacing == "":
        timestep_respacing = [diffusion_steps]

    keep = space_timesteps(diffusion_steps, timestep_respacing)
    new_betas, tmap = respaced_betas(betas, keep)
    respaced = len(keep) != diffusion_steps
    return GaussianDiffusion(
        betas=new_betas,
        model_mean_type=ModelMeanType.START_X if predict_xstart else ModelMeanType.EPSILON,
        model_var_type=(
            ModelVarType.LEARNED_RANGE
            if learn_sigma
            else (ModelVarType.FIXED_SMALL if sigma_small else ModelVarType.FIXED_LARGE)
        ),
        loss_type=loss_type,
        timestep_map=tmap if respaced else None,
        original_num_steps=diffusion_steps,
    )
