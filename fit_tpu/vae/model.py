"""AutoencoderKL (the Stable-Diffusion VAE, `sd-vae-ft-ema/-mse`) in flax.

The reference delegates VAE encode/decode to diffusers' pretrained torch
AutoencoderKL (``/root/reference/preprocess/preprocess.py:30-32``,
``FiT/sample_lightning.py:24,74``). This is a TPU-native implementation of
that exact architecture (block_out_channels (128, 256, 512, 512), 2 resnet
layers per encoder block, 3 per decoder block, mid-block attention,
GroupNorm(32), SiLU), so published sd-vae checkpoints convert weight-for-
weight (``fit_tpu.vae.convert``).

TPU-first: all convs run in NHWC (the TPU-native conv layout); the public
API takes/returns NCHW to match the reference's tensor contract, with
transposes only at the boundary. Latents follow the SD convention:
``z = sample(mean, logvar) * 0.18215`` on encode, ``decode(z / 0.18215)``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["AutoencoderKL", "DiagonalGaussian", "SD_VAE_SCALING"]

SD_VAE_SCALING = 0.18215  # reference preprocess.py:42, sample_lightning.py:74


def _gn(x: Array, scale: Array, bias: Array, groups: int = 32, eps: float = 1e-6) -> Array:
    """GroupNorm over NHWC."""
    n, h, w, c = x.shape
    xg = x.reshape(n, h, w, groups, c // groups).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(n, h, w, c).astype(x.dtype)
    return x * scale + bias


class GroupNorm(nn.Module):
    groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        groups = min(self.groups, c)  # SD uses 32; small test configs shrink
        assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
        return _gn(x, scale, bias, groups, self.eps)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = GroupNorm(name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention (SD VAE mid-block)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        y = GroupNorm(name="norm")(x)
        y = y.reshape(n, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="v")(y)
        scores = jnp.einsum("nqc,nkc->nqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(scores * (c**-0.5), axis=-1).astype(y.dtype)
        y = jnp.einsum("nqk,nkc->nqc", attn, v, preferred_element_type=jnp.float32).astype(y.dtype)
        y = nn.Dense(c, dtype=self.dtype, name="proj_out")(y)
        return x + y.reshape(n, h, w, c)


class Downsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # SD VAE pads asymmetrically (0,1) then uses stride-2 VALID conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.channels, (3, 3), strides=2, padding="VALID", dtype=self.dtype, name="conv"
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                x = ResnetBlock(ch, dtype=self.dtype, name=f"down_{i}_block_{j}")(x)
            if i < len(self.block_out_channels) - 1:
                x = Downsample(ch, dtype=self.dtype, name=f"down_{i}_downsample")(x)
        x = ResnetBlock(self.block_out_channels[-1], dtype=self.dtype, name="mid_block_1")(x)
        x = AttnBlock(dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(self.block_out_channels[-1], dtype=self.dtype, name="mid_block_2")(x)
        x = GroupNorm(name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * self.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        # diffusers applies an extra identity-initialized 1x1 "quant_conv"
        x = nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv")(x)
        return x  # (N, H/8, W/8, 2*latent)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    latent_channels: int = 4
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        z = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")(z)
        x = nn.Conv(self.block_out_channels[-1], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = ResnetBlock(self.block_out_channels[-1], dtype=self.dtype, name="mid_block_1")(x)
        x = AttnBlock(dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(self.block_out_channels[-1], dtype=self.dtype, name="mid_block_2")(x)
        # up blocks run in reversed channel order
        rev = list(reversed(self.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block):
                x = ResnetBlock(ch, dtype=self.dtype, name=f"up_{i}_block_{j}")(x)
            if i < len(rev) - 1:
                x = Upsample(ch, dtype=self.dtype, name=f"up_{i}_upsample")(x)
        x = GroupNorm(name="norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class DiagonalGaussian:
    """Latent distribution head: mean/logvar split, sample/mode."""

    def __init__(self, moments: Array):
        self.mean, logvar = jnp.split(moments, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng: jax.Array) -> Array:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> Array:
        return self.mean


class AutoencoderKL(nn.Module):
    """Public NCHW API matching the reference usage:

    * ``encode_moments(images)``: (N,3,H,W) in [-1,1] -> NHWC moments
    * ``encode(images, rng)``: -> scaled latent (N,4,H/8,W/8)
      (``latent_dist.sample() * 0.18215``, reference preprocess.py:42)
    * ``decode(latents)``: scaled latent -> images (N,3,H,W)
      (``vae.decode(z / 0.18215)``, reference sample_lightning.py:74)
    """

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            self.block_out_channels, latent_channels=self.latent_channels, dtype=self.dtype
        )
        self.decoder = Decoder(
            self.block_out_channels, latent_channels=self.latent_channels, dtype=self.dtype
        )

    def encode_moments(self, images: Array) -> Array:
        x = jnp.transpose(images, (0, 2, 3, 1))  # NCHW -> NHWC
        return self.encoder(x)

    def encode(self, images: Array, rng: jax.Array) -> Array:
        moments = self.encode_moments(images)
        z = DiagonalGaussian(moments).sample(rng)
        return jnp.transpose(z, (0, 3, 1, 2)) * SD_VAE_SCALING

    def encode_mode(self, images: Array) -> Array:
        moments = self.encode_moments(images)
        return jnp.transpose(DiagonalGaussian(moments).mode(), (0, 3, 1, 2)) * SD_VAE_SCALING

    def decode(self, latents: Array) -> Array:
        z = jnp.transpose(latents / SD_VAE_SCALING, (0, 2, 3, 1))
        images = self.decoder(z)
        return jnp.transpose(images, (0, 3, 1, 2))

    def __call__(self, images: Array, rng: jax.Array) -> Array:
        """Round trip (for init/tests)."""
        return self.decode(self.encode(images, rng))
