"""Pure math core: positional embeddings, patch geometry, noise schedules."""

from fit_tpu.core.geometry import (
    pad_latent_to_canvas,
    pad_tokens,
    patchify,
    patchify_np,
    token_count,
    unpad_latent,
    unpatchify,
)
from fit_tpu.core.pos_embed import (
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
    grid_positions_2d,
    ntk_scaled_theta,
    precompute_freqs_cis_2d,
    rope_freqs_1d_from_positions,
    rope_freqs_2d,
    sincos_1d,
    sincos_2d,
)
from fit_tpu.core.schedules import (
    DiffusionCoefficients,
    beta_schedule,
    betas_from_alpha_bar,
    compute_coefficients,
    named_beta_schedule,
    respaced_betas,
    space_timesteps,
)

__all__ = [
    "pad_latent_to_canvas",
    "pad_tokens",
    "patchify",
    "patchify_np",
    "token_count",
    "unpad_latent",
    "unpatchify",
    "get_1d_sincos_pos_embed",
    "get_2d_sincos_pos_embed",
    "grid_positions_2d",
    "ntk_scaled_theta",
    "precompute_freqs_cis_2d",
    "rope_freqs_1d_from_positions",
    "rope_freqs_2d",
    "sincos_1d",
    "sincos_2d",
    "DiffusionCoefficients",
    "beta_schedule",
    "betas_from_alpha_bar",
    "compute_coefficients",
    "named_beta_schedule",
    "respaced_betas",
    "space_timesteps",
]
