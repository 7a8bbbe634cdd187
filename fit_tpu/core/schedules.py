"""Noise schedules and precomputed diffusion coefficient tables.

All tables are computed host-side in float64 numpy (accuracy parity with the
reference, ``/root/reference/FiT/diffusion/gaussian_diffusion.py:178-213``)
and then frozen. The jitted samplers index the float64 tables cast to float32
— matching the reference's ``_extract_into_tensor`` which indexes the float64
array and then calls ``.float()`` (``gaussian_diffusion.py:882-894``), so
per-step coefficient values are bit-identical in fp32.

Schedule names follow the reference library (``gaussian_diffusion.py:70-153``)
and must not change once committed: "linear", "squaredcos_cap_v2", plus the
deprecated-API shapes ("quad", "warmup10", "warmup50", "const", "jsd").
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Union

import numpy as np

__all__ = [
    "named_beta_schedule",
    "beta_schedule",
    "betas_from_alpha_bar",
    "DiffusionCoefficients",
    "compute_coefficients",
    "space_timesteps",
    "respaced_betas",
]


def _warmup_betas(beta_start: float, beta_end: float, n: int, frac: float) -> np.ndarray:
    betas = beta_end * np.ones(n, dtype=np.float64)
    warmup = int(n * frac)
    betas[:warmup] = np.linspace(beta_start, beta_end, warmup, dtype=np.float64)
    return betas


def beta_schedule(name: str, *, beta_start: float, beta_end: float, num_steps: int) -> np.ndarray:
    """Low-level schedule shapes (reference ``gaussian_diffusion.py:77-107``)."""
    if name == "quad":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, num_steps, dtype=np.float64) ** 2
    elif name == "linear":
        betas = np.linspace(beta_start, beta_end, num_steps, dtype=np.float64)
    elif name == "warmup10":
        betas = _warmup_betas(beta_start, beta_end, num_steps, 0.1)
    elif name == "warmup50":
        betas = _warmup_betas(beta_start, beta_end, num_steps, 0.5)
    elif name == "const":
        betas = beta_end * np.ones(num_steps, dtype=np.float64)
    elif name == "jsd":
        betas = 1.0 / np.linspace(num_steps, 1, num_steps, dtype=np.float64)
    else:
        raise NotImplementedError(f"unknown beta schedule shape: {name}")
    assert betas.shape == (num_steps,)
    return betas


def betas_from_alpha_bar(num_steps: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    """Discretize a continuous alpha-bar function into betas
    (reference ``gaussian_diffusion.py:137-153``)."""
    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas)


def named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    """The stable, named schedule library (reference ``gaussian_diffusion.py:110-134``).

    "linear": Ho et al., rescaled so any step count stays similar in the limit
    — at 1000 steps this is betas in [1e-4, 0.02], identical to the diffusers
    ``DDIMScheduler(num_train_timesteps=1000)`` default used on the reference
    training path (``FiT/train.py:38``), so train-noising and sampling share
    one alpha-bar table.
    """
    if name == "linear":
        scale = 1000 / num_steps
        return beta_schedule(
            "linear", beta_start=scale * 0.0001, beta_end=scale * 0.02, num_steps=num_steps
        )
    if name == "squaredcos_cap_v2":
        return betas_from_alpha_bar(
            num_steps, lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        )
    raise NotImplementedError(f"unknown beta schedule: {name}")


@dataclasses.dataclass(frozen=True)
class DiffusionCoefficients:
    """Every per-timestep coefficient table the q/p math needs, float64.

    Field-for-field parity with the reference precomputation
    (``gaussian_diffusion.py:178-213``). Shapes are all ``(T,)``.
    """

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    alphas_cumprod_next: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    # FIXED_LARGE variance option: beta_t with the t=0 slot replaced by the
    # t=1 posterior variance (reference ``gaussian_diffusion.py:310-313``).
    fixed_large_variance: np.ndarray
    fixed_large_log_variance: np.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def compute_coefficients(betas: np.ndarray) -> DiffusionCoefficients:
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    # log clipped: the posterior variance is 0 at t=0, so reuse the t=1 entry
    if len(posterior_variance) > 1:
        posterior_log_variance_clipped = np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        )
    else:
        posterior_log_variance_clipped = np.array([])

    fixed_large = np.append(posterior_variance[1], betas[1:])

    return DiffusionCoefficients(
        betas=betas,
        alphas_cumprod=alphas_cumprod,
        alphas_cumprod_prev=alphas_cumprod_prev,
        alphas_cumprod_next=alphas_cumprod_next,
        sqrt_alphas_cumprod=np.sqrt(alphas_cumprod),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - alphas_cumprod),
        log_one_minus_alphas_cumprod=np.log(1.0 - alphas_cumprod),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod - 1),
        posterior_variance=posterior_variance,
        posterior_log_variance_clipped=posterior_log_variance_clipped,
        posterior_mean_coef1=betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod),
        posterior_mean_coef2=(1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod),
        fixed_large_variance=fixed_large,
        fixed_large_log_variance=np.log(fixed_large),
    )


def space_timesteps(num_timesteps: int, section_counts: Union[str, Sequence[int]]) -> set:
    """Select the subset of base timesteps to keep when respacing.

    Semantics parity with the reference (``respace.py:12-62``): either the
    DDIM fixed stride ("ddimN") or per-section fractional striding for a list
    of counts (or a comma-separated string of counts).
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(f"cannot create exactly {desired} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]

    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        frac_stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return set(all_steps)


def respaced_betas(base_betas: np.ndarray, use_timesteps) -> "tuple[np.ndarray, np.ndarray]":
    """Recompute betas for a kept-timestep subset and return
    ``(new_betas, timestep_map)`` where ``timestep_map[i]`` is the original
    index of respaced step ``i`` (reference ``respace.py:73-87``)."""
    use_timesteps = set(use_timesteps)
    base = compute_coefficients(np.asarray(base_betas, dtype=np.float64))
    last_alpha_cumprod = 1.0
    new_betas = []
    timestep_map = []
    for i, alpha_cumprod in enumerate(base.alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1 - alpha_cumprod / last_alpha_cumprod)
            last_alpha_cumprod = alpha_cumprod
            timestep_map.append(i)
    return np.array(new_betas, dtype=np.float64), np.array(timestep_map, dtype=np.int32)
