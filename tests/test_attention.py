"""Masked-attention backend equivalence: Pallas flash kernel (interpreted on
CPU) vs the XLA reference path, forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fit_tpu.ops.attention import mask_to_lengths, masked_attention


def make_inputs(b=2, h=3, t=256, d=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    return q, k, v


def prefix_mask(lengths, t):
    return jnp.arange(t)[None, :] < jnp.asarray(lengths)[:, None]


def test_mask_to_lengths():
    m = prefix_mask([3, 256], 256)
    np.testing.assert_array_equal(np.asarray(mask_to_lengths(m)), [3, 256])


def test_full_mask_matches_xla():
    q, k, v = make_inputs()
    ref = masked_attention(q, k, v, None, backend="xla")
    out = masked_attention(q, k, v, None, backend="flash")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("lengths", [[240, 130], [256, 1], [255, 129]])
def test_prefix_mask_matches_xla_on_valid_rows(lengths):
    q, k, v = make_inputs()
    t = q.shape[2]
    m = prefix_mask(lengths, t)
    ref = masked_attention(q, k, v, m, backend="xla")
    out = masked_attention(q, k, v, m, backend="flash")
    # compare only valid query rows; the reference computes garbage on padded
    # rows (fit.py:184-185 masks keys only). Padded rows inside a
    # partially-valid q block compute the same key-masked attention as the
    # reference; fully-padded q blocks are skipped and written as zeros.
    bq = 128
    for b, n in enumerate(lengths):
        edge = -(-n // bq) * bq  # first fully-padded block boundary
        np.testing.assert_allclose(
            np.asarray(out)[b, :, :edge], np.asarray(ref)[b, :, :edge], atol=2e-5
        )
        np.testing.assert_array_equal(np.asarray(out)[b, :, edge:], 0.0)


def test_small_sequence_single_block():
    q, k, v = make_inputs(t=96)
    m = prefix_mask([50, 96], 96)
    ref = masked_attention(q, k, v, m, backend="xla")
    out = masked_attention(q, k, v, m, backend="flash")
    np.testing.assert_allclose(np.asarray(out)[0, :, :50], np.asarray(ref)[0, :, :50], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out)[1], np.asarray(ref)[1], atol=2e-5)


def test_flash_gradients_match_xla():
    q, k, v = make_inputs(b=2, h=2, t=128, d=64)
    m = prefix_mask([100, 128], 128)
    qmaskf = m.astype(jnp.float32)[:, None, :, None]

    def loss_flash(q, k, v):
        o = masked_attention(q, k, v, m, backend="flash")
        return jnp.sum(jnp.sin(o) * qmaskf)  # only valid rows contribute

    def loss_xla(q, k, v):
        o = masked_attention(q, k, v, m, backend="xla")
        return jnp.sum(jnp.sin(o) * qmaskf)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_scale_default_is_rsqrt_head_dim():
    q, k, v = make_inputs(t=128)
    a = masked_attention(q, k, v, None, backend="xla")
    b = masked_attention(q, k, v, None, backend="xla", scale=64**-0.5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bfloat16_inputs():
    q, k, v = make_inputs(t=128)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    m = prefix_mask([100, 128], 128)
    out = masked_attention(qb, kb, vb, m, backend="flash")
    ref = masked_attention(qb, kb, vb, m, backend="xla")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out[:, :, :100], dtype=np.float32),
        np.asarray(ref[:, :, :100], dtype=np.float32),
        atol=3e-2,
    )
