"""Patchify / unpatchify / pad / unpad as pure JAX reshapes.

These mirror the latent-geometry helpers of the reference
(``/root/reference/FiT/models/fit.py:444-472`` and
``/root/reference/FiT/train.py:97-166``) but are written as stateless jnp
functions with static shape arguments, so they trace cleanly under ``jit``
and fuse into neighbouring ops (on TPU a patchify is just a relayout XLA
folds into the consumer matmul).

Conventions:
* images/latents are channel-first ``(N, C, H, W)`` like the reference;
* token sequences are ``(N, T, p*p*C)`` with token order row-major over the
  ``(H/p, W/p)`` patch grid and per-token layout ``(p, p, C)`` flattened —
  i.e. channel is the fastest-varying *last* axis inside a token (reference
  ``fit.py:470``: ``permute(0, 2, 4, 3, 5, 1)``).
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

__all__ = [
    "patchify",
    "unpatchify",
    "patchify_np",
    "pad_tokens",
    "pad_latent_to_canvas",
    "unpad_latent",
    "token_count",
]


def token_count(h: int, w: int, patch_size: int) -> int:
    """Number of tokens for an (h, w) latent at the given patch size."""
    return (h // patch_size) * (w // patch_size)


def patchify(x: Array, patch_size: int) -> Array:
    """(N, C, H, W) -> (N, T, p*p*C) with T = (H/p)*(W/p).

    Parity: reference ``fit.py:466-472``.
    """
    n, c, h, w = x.shape
    p = patch_size
    nh, nw = h // p, w // p
    x = x.reshape(n, c, nh, p, nw, p)
    x = x.transpose(0, 2, 4, 3, 5, 1)  # (N, nh, nw, p, p, C)
    return x.reshape(n, nh * nw, p * p * c)


def unpatchify(x: Array, h: int, w: int, patch_size: int, channels: int) -> Array:
    """(N, T, p*p*C) -> (N, C, H, W). Inverse of :func:`patchify`.

    Parity: reference ``fit.py:444-456``. ``h``/``w`` are the target latent
    height/width (static), ``channels`` the output channel count.
    """
    n = x.shape[0]
    p = patch_size
    nh, nw = h // p, w // p
    x = x.reshape(n, nh, nw, p, p, channels)
    x = x.transpose(0, 5, 1, 3, 2, 4)  # (N, C, nh, p, nw, p)
    return x.reshape(n, channels, nh * p, nw * p)


def patchify_np(latent: np.ndarray, patch_size: int) -> np.ndarray:
    """Host-side single-image patchify: (C, H, W) -> (T, p*p*C), numpy.

    Used by the data pipeline (parity: reference
    ``preprocess/iterators.py:127-133``).
    """
    c, h, w = latent.shape
    p = patch_size
    nh, nw = h // p, w // p
    latent = latent.reshape(c, nh, p, nw, p)
    latent = latent.transpose(1, 3, 2, 4, 0)  # (nh, nw, p, p, c)
    return latent.reshape(nh * nw, p * p * c)


def pad_tokens(tokens: Union[Array, np.ndarray], max_length: int) -> Array:
    """Zero-pad (T, D) token array to (max_length, D) along the token axis."""
    t = tokens.shape[0]
    if t >= max_length:
        return jnp.asarray(tokens[:max_length])
    pad = [(0, max_length - t)] + [(0, 0)] * (tokens.ndim - 1)
    return jnp.pad(jnp.asarray(tokens), pad)


def pad_latent_to_canvas(
    x: Array, patch_size: int, max_size: int, max_length: int
) -> Array:
    """Embed an (N, C, H, W) latent into a square (N, C, max_size, max_size)
    canvas by patchifying, zero-padding the token axis to ``max_length`` and
    unpatchifying onto the square grid.

    This is the sampling-time packing step (parity: reference
    ``train.py:114-125``): the denoiser always sees a fixed square canvas and
    the validity mask marks which tokens are real. If the latent already has
    more tokens than ``max_length`` it is returned unchanged (the
    extrapolation path, where the canvas IS the latent).
    """
    n, c, _, _ = x.shape
    tokens = patchify(x, patch_size)
    if tokens.shape[1] > max_length:
        return x
    padded = jnp.zeros((n, max_length, patch_size * patch_size * c), dtype=x.dtype)
    padded = padded.at[:, : tokens.shape[1]].set(tokens)
    return unpatchify(padded, max_size, max_size, patch_size, c)


def unpad_latent(
    x: Array, valid_t: int, h: int, w: int, patch_size: int
) -> Array:
    """Inverse of :func:`pad_latent_to_canvas`: crop the first ``valid_t``
    tokens out of a square canvas and reshape to the true (N, C, h, w).

    Parity: reference ``train.py:127-134``.
    """
    c = x.shape[1]
    tokens = patchify(x, patch_size)
    tokens = tokens[:, :valid_t]
    return unpatchify(tokens, h, w, patch_size, c)
