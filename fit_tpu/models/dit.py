"""DiT: square-image Diffusion Transformer with absolute 2D sincos positions.

Capability parity with the reference's DiT tree
(``/root/reference/FiT/models/dit.py:145-370``): fixed-resolution patch
embedding, a frozen sincos positional table, GELU-MLP adaLN-Zero blocks
(no RoPE, no masking), ``learn_sigma=True`` by default (the 8-channel
eps+variance output consumed by LEARNED_RANGE diffusion), and the 12-size
registry. The 3-channel CFG variant of the reference (``dit.py:262``) is kept
on this model.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from fit_tpu.core.geometry import patchify, unpatchify
from fit_tpu.core.pos_embed import sincos_2d
from fit_tpu.models.layers import (
    FinalLayer,
    FiTBlock,
    LabelEmbedder,
    TimestepEmbedder,
    default_kernel_init,
)

Array = jnp.ndarray

__all__ = ["DiT", "DiT_models", "create_dit"]


class DiT(nn.Module):
    """Square-image DiT. ``__call__(x, t, y, train)`` with x: (N, C, H, W)."""

    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True
    attn_backend: str = "auto"
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @nn.compact
    def __call__(self, x: Array, t: Array, y: Array, train: bool = True) -> Array:
        n, _, h, w = x.shape
        x = patchify(x, self.patch_size).astype(self.dtype)
        x = nn.Dense(
            self.hidden_size, kernel_init=default_kernel_init, dtype=self.dtype,
            name="x_embedder",
        )(x)
        # frozen sincos table for the compile-time grid (reference dit.py:174)
        table = sincos_2d(self.hidden_size, h // self.patch_size, w // self.patch_size)
        x = x + jnp.asarray(table, dtype=x.dtype)[None]

        t_emb = TimestepEmbedder(self.hidden_size, dtype=self.dtype, name="t_embedder")(t)
        y_emb = LabelEmbedder(
            self.num_classes, self.hidden_size, self.class_dropout_prob,
            dtype=self.dtype, name="y_embedder",
        )(y, train=train)
        c = t_emb + y_emb

        for i in range(self.depth):
            x = FiTBlock(
                self.hidden_size,
                self.num_heads,
                mlp_ratio=self.mlp_ratio,
                ffn="mlp",  # DiT uses the tanh-GELU MLP (reference dit.py:110-112)
                use_rope=False,
                attn_backend=self.attn_backend,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, c, mask=None, freqs_cis=None)

        x = FinalLayer(
            self.hidden_size, self.patch_size, self.out_channels, dtype=self.dtype, name="final"
        )(x, c)
        return unpatchify(x.astype(jnp.float32), h, w, self.patch_size, self.out_channels)

    def forward_with_cfg(self, x: Array, t: Array, y: Array, cfg_scale) -> Array:
        """CFG batched forward guiding the first 3 channels only
        (reference ``dit.py:254-267``)."""
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        out = self(combined, t, y, train=False)
        eps, rest = out[:, :3], out[:, 3:]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        guided = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([guided, guided], axis=0)
        return jnp.concatenate([eps, rest], axis=1)


def _sizes():
    return {"XL": (28, 1152, 16), "L": (24, 1024, 16), "B": (12, 768, 12), "S": (12, 384, 6)}


def create_dit(name: str, **kwargs) -> DiT:
    """Build a DiT by registry name, e.g. ``create_dit("DiT-XL/2")``."""
    size, patch = name.removeprefix("DiT-").split("/")
    depth, hidden, heads = _sizes()[size]
    return DiT(
        depth=depth, hidden_size=hidden, num_heads=heads, patch_size=int(patch), **kwargs
    )


DiT_models = {
    f"DiT-{size}/{patch}": (lambda s=size, p=patch: (lambda **kw: create_dit(f"DiT-{s}/{p}", **kw)))()
    for size in _sizes()
    for patch in (2, 4, 8)
}
