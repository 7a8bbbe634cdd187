"""int8 (w8a8) quantized dense path for SAMPLING — a TPU-native serving
optimization beyond the reference's capability envelope.

v5e's MXU runs int8 at 2x the bf16 rate (measured here: 250 vs 197
TFLOP/s-equiv on the qkv-projection shape, chained fori_loop bench). The
FiT denoiser's sampling step is ~74% dense matmul at the 256^2 headline
config, so quantizing the per-block projections (qkv, attention out,
SwiGLU gate/up/down) buys a large step-time cut at inference while
training and the quality-critical small layers (timestep/label embedders,
adaLN modulation, final layer) stay in bf16/fp32.

Scheme: symmetric per-output-channel int8 weights (scale = max|w|/127
over the fan-in axis, computed OFFLINE by :func:`quantize_params`) and
symmetric per-token dynamic activation quant (scale = max|x|/127 over the
feature axis, computed inline — XLA fuses the absmax/round/clip into the
surrounding elementwise work). Accumulation in int32 on the MXU, dequant
as one fp32 rescale fused into the bias add.

No reference counterpart (the reference samples in fp32 torch,
``FiT/sample_lightning.py:60-68``); quality is validated by latent-drift
measurement against the bf16 path (see bench.py --quant) rather than
parity tests.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jnp.ndarray

__all__ = [
    "Int8Dense",
    "dynamic_quant",
    "int8_matmul",
    "quantize_params",
    "QUANT_KERNEL_PATHS",
]

# (parent module, kernel param) pairs that switch to int8 under
# quant="int8". Everything else (embedders, adaLN, final layer, norms)
# stays in the model dtype — those are the quality-critical <2% of FLOPs.
QUANT_KERNEL_PATHS = (
    ("attn", "qkv"),
    ("attn", "proj"),
    ("ffn", "fc1_g"),
    ("ffn", "fc1_x"),
    ("ffn", "fc1"),
    ("ffn", "fc2"),
)


def dynamic_quant(x: Array) -> "tuple[Array, Array]":
    """Per-token symmetric int8: returns (x_i8, scale) with
    x ~= x_i8 * scale[..., None]. Zero rows quantize to zeros (scale
    clamped away from 0)."""
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(ax, 1e-12) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def int8_matmul(
    x: Array,
    kernel_i8: Array,
    kernel_scale: Array,
    bias: Optional[Array] = None,
    out_dtype: Any = jnp.bfloat16,
) -> Array:
    """(..., K) bf16 @ (K, N) int8 -> (..., N) out_dtype via int8 MXU.

    Dynamic per-token activation quant; int32 accumulation; one fused
    fp32 rescale ``acc * (x_scale * kernel_scale)`` + bias."""
    xq, sx = dynamic_quant(x)
    acc = jax.lax.dot_general(
        xq,
        kernel_i8,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * kernel_scale.astype(jnp.float32))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class Int8Dense(nn.Module):
    """Drop-in for nn.Dense on the quantized sampling path. Parameters are
    the OFFLINE-quantized ``kernel`` (int8, (K, N)) + ``kernel_scale``
    (f32, (N,)) produced by :func:`quantize_params`; init gives structure
    only (a fresh-initialized quant model is not meaningful — always
    convert trained/initialized bf16 params)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.param(
            "kernel",
            lambda key, shape: jnp.zeros(shape, jnp.int8),
            (x.shape[-1], self.features),
        )
        scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return int8_matmul(x, k, scale, bias, out_dtype=self.dtype)


def _quantize_kernel(w: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Symmetric per-output-channel quant over the fan-in axis.

    Dense kernels are (K, N) (or scan-stacked (L, K, N)): reduce axis -2.
    The grouped qkv kernel is (D, 3, C) / (L, D, 3, C): reduce the D axis
    (-3), giving a (3, C) scale — still per output channel."""
    w = np.asarray(w, np.float32)
    axis = -2 if w.shape[-2] != 3 or w.ndim < 3 else -3
    amax = np.max(np.abs(w), axis=axis, keepdims=True)
    scale = np.maximum(amax, 1e-12) / 127.0
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return wq, np.squeeze(scale, axis=axis)


def quantize_params(params: Any) -> Any:
    """bf16/f32 FiT params -> the int8-model param tree: kernels on
    :data:`QUANT_KERNEL_PATHS` become int8 + a ``kernel_scale`` sibling;
    everything else passes through. Works on plain and scan-stacked
    (leading layer dim) trees."""
    def convert(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, sub in tree.items():
            if isinstance(sub, dict):
                converted = dict(convert(sub))
                for parent, kname in QUANT_KERNEL_PATHS:
                    if name == parent and kname in converted:
                        leaf = converted[kname]
                        if isinstance(leaf, dict) and "kernel" in leaf:
                            wq, scale = _quantize_kernel(leaf["kernel"])
                            leaf = dict(leaf)
                            leaf["kernel"] = jnp.asarray(wq)
                            leaf["kernel_scale"] = jnp.asarray(scale)
                            converted[kname] = leaf
                out[name] = converted
            else:
                out[name] = sub
        return out

    # unwrap/rewrap the {"params": ...} collection if present
    if isinstance(params, dict) and "params" in params:
        res = dict(params)
        res["params"] = convert(params["params"])
        return res
    return convert(params)


def quantize_model(model, params) -> "tuple[Any, Any]":
    """(bf16 FiT, bf16/f32 params) -> (int8-path FiT, converted params).
    The returned pair drops into FiTSampler unchanged."""
    return model.clone(quant="int8"), quantize_params(params)
