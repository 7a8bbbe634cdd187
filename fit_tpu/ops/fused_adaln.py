"""Fused elementwise kernels: adaLN (LayerNorm + modulate) and SwiGLU glue.

These are the remaining fusion candidates from SURVEY.md §7.6. Each has the
same contract as its XLA composition in ``fit_tpu.models.layers`` and is
verified equivalent in tests. Micro-benchmarks on v5e show XLA already fuses
these chains into the adjacent matmuls (the LN statistics ride the proj
matmul's epilogue, the silu-glue rides fc2's prologue — see the HLO fusion
names in the training trace), so the kernels are OFF by default and exist
as (a) the switchable-backend capability the build plan specifies and (b) a
measurement harness for future layouts where XLA's fusion breaks.

Run the micro-benchmark: ``python -m fit_tpu.ops.fused_adaln``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

__all__ = ["adaln_modulate", "swiglu_glue"]


def _adaln_kernel(x_ref, shift_ref, scale_ref, o_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)  # (T, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    shift = shift_ref[0].astype(jnp.float32)  # (1, D) broadcasts over T
    scale = scale_ref[0].astype(jnp.float32)
    o_ref[0] = (normed * (1.0 + scale) + shift).astype(o_ref.dtype)


def adaln_modulate(
    x: Array, shift: Array, scale: Array, *, eps: float = 1e-6, use_kernel: bool = True
) -> Array:
    """``LN(x) * (1 + scale) + shift`` with affine-free fp32 LayerNorm.

    x: (B, T, D); shift/scale: (B, D). Equivalent to
    ``modulate(layer_norm_fp32(x), shift, scale)`` in ``models.layers``.
    """
    if not use_kernel:
        from fit_tpu.models.layers import layer_norm_fp32, modulate

        return modulate(layer_norm_fp32(x, eps), shift, scale)
    b, t, d = x.shape
    return pl.pallas_call(
        functools.partial(_adaln_kernel, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x, shift[:, None, :], scale[:, None, :])


def _swiglu_kernel(g_ref, x_ref, o_ref):
    g = g_ref[0].astype(jnp.float32)
    o_ref[0] = (jax.nn.silu(g) * x_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def swiglu_glue(gate: Array, value: Array, *, use_kernel: bool = True) -> Array:
    """``silu(gate) * value`` — the SwiGLU elementwise stage between fc1 and
    fc2 (``models.layers.SwiGLU``)."""
    if not use_kernel:
        import flax.linen as nn

        return nn.silu(gate) * value
    b, t, h = gate.shape
    return pl.pallas_call(
        _swiglu_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, h), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t, h), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, h), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(gate.shape, gate.dtype),
        interpret=jax.default_backend() != "tpu",
    )(gate, value)


def _microbench():  # pragma: no cover — manual perf harness
    import numpy as np

    from fit_tpu.utils.profiling import timeit

    rng = np.random.default_rng(0)
    b, t, d, h = 64, 256, 1152, 3072
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32)).astype(jnp.bfloat16)
    shift = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)).astype(jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32)).astype(jnp.bfloat16)

    for name, fn in [
        ("adaln kernel", jax.jit(lambda: adaln_modulate(x, shift, scale))),
        ("adaln xla", jax.jit(lambda: adaln_modulate(x, shift, scale, use_kernel=False))),
        ("swiglu kernel", jax.jit(lambda: swiglu_glue(g, v))),
        ("swiglu xla", jax.jit(lambda: swiglu_glue(g, v, use_kernel=False))),
    ]:
        print(name, timeit(fn, iters=20))


if __name__ == "__main__":  # pragma: no cover
    _microbench()
