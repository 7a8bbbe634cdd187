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

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental import pallas as pl

Array = jnp.ndarray

__all__ = [
    "Int8Dense",
    "adaln_quant",
    "dynamic_quant",
    "int8_matmul",
    "quantize_params",
    "silu_mul_quant",
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
    x,
    kernel_i8: Array,
    kernel_scale: Array,
    bias: Optional[Array] = None,
    out_dtype: Any = jnp.bfloat16,
) -> Array:
    """(..., K) bf16 @ (K, N) int8 -> (..., N) out_dtype via int8 MXU.

    ``x`` is either a float activation (per-token quant happens inline) or
    an already-quantized ``(x_i8, scale)`` pair from one of the fused
    quant-epilogue kernels below — the profiled second-pass read+write of
    the bf16 activation is the single largest int8-path overhead (r3 trace:
    ~10 ms/step at the 256^2 batch-32 config), so producers quantize in
    VMEM where possible. int32 accumulation; one fused fp32 rescale
    ``acc * (x_scale * kernel_scale)`` + bias."""
    if isinstance(x, tuple):
        xq, sx = x
    else:
        xq, sx = dynamic_quant(x)
    acc = jax.lax.dot_general(
        xq,
        kernel_i8,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * kernel_scale.astype(jnp.float32))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# fused quant-epilogue Pallas kernels
#
# XLA necessarily splits dynamic row quantization into two passes over HBM:
# pass 1 computes the activation + its rowwise absmax (one fusion), pass 2
# re-reads the full bf16 activation to emit int8. Both passes are pure HBM
# bandwidth on the LARGEST tensors in the block (the (B,T,3072) SwiGLU
# hidden, the (B,T,D) modulated inputs). These kernels compute the producer
# op, the rowwise absmax, and the int8 write in ONE VMEM pass — the bf16
# intermediate never touches HBM. r3 profile of the XLA path at the 256^2
# batch-32 serving config: second-pass fusions = ~10 ms of the 72.9 ms step.
#
# Numerics: producer math in fp32 (better than the bf16 XLA composition),
# then the same round/clip as dynamic_quant — outputs match the unfused
# path within +-1 quant step (tolerance-tested, not bit-pinned).
# ---------------------------------------------------------------------------


# Measured gate (v5e, FiT-XL/2 256^2, 50/250-step DDPM serving bench):
#   batch 8  (cfg-doubled 16x256 = 4096 rows):  XLA 18.7 ms/step, fused 19.5
#   batch 32 (cfg-doubled 64x256 = 16384 rows): XLA 72.9 ms/step, fused 70.9
# The kernels win once the activation tensors are large enough that the
# second HBM pass dominates the kernel-launch/pipeline cost; below that XLA's
# fusions (which also co-schedule with neighbors) are faster.
_FUSED_EPILOGUE_MIN_ROWS = 16384


def use_fused_epilogue(batch: int, tokens: int) -> bool:
    """True when the Pallas quant-epilogue kernels beat the XLA two-pass
    composition for a (batch, tokens) activation — see the measured table
    above. Always False off-TPU (interpret mode is for tests)."""
    return (
        jax.default_backend() == "tpu"
        and batch * tokens >= _FUSED_EPILOGUE_MIN_ROWS
    )


def _rowwise_quant(h: Array) -> "tuple[Array, Array]":
    ax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    scale = jnp.maximum(ax, 1e-12) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(h / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _silu_mul_quant_kernel(g_ref, v_ref, q_ref, s_ref):
    g = g_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    q, scale = _rowwise_quant(jax.nn.silu(g) * v)
    q_ref[0] = q
    s_ref[0] = scale


def silu_mul_quant(gate: Array, val: Array, *, block_t: int = 256):
    """``rowwise_int8(silu(gate) * val)`` in one VMEM pass.

    gate, val: (B, T, H) float. Returns ``(q (B,T,H) int8, scale (B,T,1)
    f32)`` ready for :func:`int8_matmul` — the SwiGLU fc2 feed on the
    quantized serving path."""
    b, t, h = gate.shape
    tc = min(t, block_t)
    q, s = pl.pallas_call(
        _silu_mul_quant_kernel,
        grid=(b, pl.cdiv(t, tc)),
        in_specs=[
            pl.BlockSpec((1, tc, h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tc, h), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tc, h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tc, 1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, h), jnp.int8),
            jax.ShapeDtypeStruct((b, t, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(gate, val)
    return q, s


def _adaln_quant_kernel(x_ref, shift_ref, scale_ref, q_ref, s_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)  # (tc, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    shift = shift_ref[0].astype(jnp.float32)  # (1, D) broadcasts over tokens
    scale = scale_ref[0].astype(jnp.float32)
    q, rowscale = _rowwise_quant(normed * (1.0 + scale) + shift)
    q_ref[0] = q
    s_ref[0] = rowscale


def adaln_quant(
    x: Array,
    shift: Array,
    scale: Array,
    *,
    eps: float = 1e-6,
    block_t: int = 256,
):
    """``rowwise_int8(modulate(layer_norm_fp32(x), shift, scale))`` in one
    VMEM pass — the quantized-path replacement for the block-input adaLN
    chain (`models.layers.FiTBlock`). x: (B, T, D); shift/scale: (B, D).
    Returns ``(q (B,T,D) int8, rowscale (B,T,1) f32)``."""
    b, t, d = x.shape
    tc = min(t, block_t)
    q, s = pl.pallas_call(
        functools.partial(_adaln_quant_kernel, eps=eps),
        grid=(b, pl.cdiv(t, tc)),
        in_specs=[
            pl.BlockSpec((1, tc, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tc, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tc, 1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), jnp.int8),
            jax.ShapeDtypeStruct((b, t, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x, shift[:, None, :], scale[:, None, :])
    return q, s


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
    def __call__(self, x) -> Array:
        # x: float activation, or a pre-quantized (x_i8, scale) pair from a
        # fused quant-epilogue kernel (silu_mul_quant / adaln_quant)
        d_in = (x[0] if isinstance(x, tuple) else x).shape[-1]
        k = self.param(
            "kernel",
            lambda key, shape: jnp.zeros(shape, jnp.int8),
            (d_in, self.features),
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


def quantize_model(model, params, calib_batches=None, alpha: float = 0.5) -> "tuple[Any, Any]":
    """(bf16 FiT, bf16/f32 params) -> (int8-path FiT, converted params).
    The returned pair drops into FiTSampler unchanged.

    ``calib_batches`` (optional): iterable of ``train=False`` apply-arg
    tuples — when given, SmoothQuant equalization (``ops.equalize``) runs
    first: activation-outlier difficulty migrates into the weights via
    calibrated per-channel scales folded into the producers (numerically
    equivalent in bf16, substantially lower int8 quantization error on
    outlier-prone trained checkpoints)."""
    if calib_batches is not None:
        from fit_tpu.ops.equalize import calibrate, equalize_params

        stats = calibrate(model, params, calib_batches)
        params = equalize_params(params, stats, alpha=alpha)
    return model.clone(quant="int8"), quantize_params(params)


# ---------------------------------------------------------------------------
# offline quantized serving artifacts: quantize once, serve many. The int8
# artifact is ~4x smaller than the fp32 training checkpoint and loads
# without the conversion pass — the deployment-side counterpart of
# quantize_params (cli.quantize writes one, sample/serve CLIs load it).
# ---------------------------------------------------------------------------


def save_quantized(path: str, params, meta: Optional[dict] = None) -> None:
    """Write already-quantized params (from :func:`quantize_params`) plus a
    ``quant.json`` marker to ``path`` (Orbax standard format)."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), params)
    ckptr.wait_until_finished()
    import json

    with open(os.path.join(path, "quant.json"), "w") as f:
        json.dump({"scheme": "w8a8-int8", **(meta or {})}, f, indent=1)


def is_quantized_artifact(path: str) -> bool:
    import os

    return os.path.exists(os.path.join(path, "quant.json"))


def load_quantized(path: str):
    """Restore a :func:`save_quantized` artifact -> (params, meta)."""
    import json
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "quant.json")) as f:
        meta = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, "params"))
    # orbax restores unannotated trees with f64-capable numpy leaves; the
    # serving contract is int8 kernels + f32 scales + f32 everything else,
    # which StandardCheckpointer preserves from the saved dtypes
    return jax.tree.map(jnp.asarray, params), meta
