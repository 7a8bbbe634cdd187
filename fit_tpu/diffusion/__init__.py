"""Diffusion processes and jitted samplers."""

from fit_tpu.core.schedules import space_timesteps
from fit_tpu.diffusion.dpm_solver import dpm_solver_pp_2m
from fit_tpu.diffusion.gaussian import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    continuous_gaussian_log_likelihood,
    create_diffusion,
    discretized_gaussian_log_likelihood,
    masked_global_mse,
    normal_kl,
)
from fit_tpu.diffusion.samplers import (
    cfg_model_fn,
    ddim_reverse_loop,
    ddim_sample_loop,
    p_sample_loop,
)
from fit_tpu.diffusion.timestep_samplers import (
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)

__all__ = [
    "space_timesteps",
    "dpm_solver_pp_2m",
    "GaussianDiffusion",
    "LossType",
    "ModelMeanType",
    "ModelVarType",
    "create_diffusion",
    "discretized_gaussian_log_likelihood",
    "masked_global_mse",
    "normal_kl",
    "cfg_model_fn",
    "ddim_reverse_loop",
    "ddim_sample_loop",
    "continuous_gaussian_log_likelihood",
    "p_sample_loop",
    "LossSecondMomentResampler",
    "UniformSampler",
    "create_named_schedule_sampler",
]
