"""Flax AutoencoderKL (sd-vae architecture) + torch weight conversion."""

from fit_tpu.vae.convert import convert_torch_state_dict, load_torch_checkpoint
from fit_tpu.vae.model import SD_VAE_SCALING, AutoencoderKL, DiagonalGaussian

__all__ = [
    "convert_torch_state_dict",
    "load_torch_checkpoint",
    "SD_VAE_SCALING",
    "AutoencoderKL",
    "DiagonalGaussian",
]
