"""Equivalence tests for the fused adaLN / SwiGLU elementwise kernels."""

import numpy as np
import jax
import jax.numpy as jnp

from fit_tpu.models.layers import layer_norm_fp32, modulate
from fit_tpu.ops.fused_adaln import adaln_modulate, swiglu_glue


def test_adaln_modulate_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 48)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(2, 48)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(2, 48)).astype(np.float32))
    got = adaln_modulate(x, shift, scale)
    want = modulate(layer_norm_fp32(x), shift, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_adaln_modulate_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 32)).astype(np.float32)).astype(jnp.bfloat16)
    shift = jnp.zeros((2, 32), jnp.bfloat16)
    scale = jnp.zeros((2, 32), jnp.bfloat16)
    got = adaln_modulate(x, shift, scale)
    assert got.dtype == jnp.bfloat16
    want = modulate(layer_norm_fp32(x), shift, scale)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_swiglu_glue_matches_xla():
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(size=(2, 16, 24)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 16, 24)).astype(np.float32))
    got = swiglu_glue(g, v)
    want = jax.nn.silu(g) * v
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
