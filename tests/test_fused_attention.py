"""Fused RoPE+attention kernel: equivalence with the unfused reference path
(apply_rope + masked softmax attention), gradients, and model integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fit_tpu.core.pos_embed import rope_freqs_2d
from fit_tpu.models.layers import apply_rope_bthd
from fit_tpu.ops.attention import masked_attention
from fit_tpu.ops.fused_attention import (
    rope_flash_attention,
    rotation_matrix,
    split_rope_tables,
)

B, T, H, D = 2, 64, 3, 16


def make_inputs(seed=0, lengths=(48, 64)):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    fc = np.zeros((T, D), np.float32)
    grid = rope_freqs_2d(D, 8, 8)
    fc[: grid.shape[0]] = grid[:T]
    fc = jnp.asarray(np.broadcast_to(fc, (B, T, D)).copy())
    lengths = jnp.asarray(lengths, jnp.int32)
    return q, k, v, fc, lengths


def unfused_reference(q, k, v, fc, lengths):
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    qh, kh, vh = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
    qh, kh = apply_rope_bthd(
        qh.transpose(0, 2, 1, 3), kh.transpose(0, 2, 1, 3), fc
    )
    qh, kh = qh.transpose(0, 2, 1, 3), kh.transpose(0, 2, 1, 3)
    out = masked_attention(qh, kh, vh, mask, scale=D**-0.5, backend="xla")
    return out.transpose(0, 2, 1, 3)  # back to (B, T, H, D)


def test_rotation_matrix():
    s = np.asarray(rotation_matrix(6))
    x = np.array([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0]], np.float32)
    rot = x @ s
    np.testing.assert_array_equal(rot, [[-2.0, 1.0, -4.0, 3.0, -6.0, 5.0]])


def test_split_rope_tables():
    fc = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 1, 8))
    cos, sin = split_rope_tables(fc)
    np.testing.assert_array_equal(np.asarray(cos)[0, 0], [0, 0, 2, 2, 4, 4, 6, 6])
    np.testing.assert_array_equal(np.asarray(sin)[0, 0], [1, 1, 3, 3, 5, 5, 7, 7])


def test_fused_matches_unfused():
    q, k, v, fc, lengths = make_inputs()
    cos, sin = split_rope_tables(fc)
    got = rope_flash_attention(q, k, v, cos, sin, lengths, D**-0.5)
    want = unfused_reference(q, k, v, fc, lengths)
    # valid rows (all rows are computed with key masking in both paths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_mask_semantics():
    """Padded key values must not affect valid-row outputs."""
    q, k, v, fc, lengths = make_inputs(lengths=(30, 50))
    cos, sin = split_rope_tables(fc)
    out1 = rope_flash_attention(q, k, v, cos, sin, lengths, D**-0.5)
    k2 = k.at[:, 50:].set(99.0)
    v2 = v.at[:, 50:].set(-99.0)
    k2 = k2.at[0, 30:].set(77.0)
    v2 = v2.at[0, 30:].set(-77.0)
    out2 = rope_flash_attention(q, k2, v2, cos, sin, lengths, D**-0.5)
    np.testing.assert_allclose(
        np.asarray(out1)[0, :30], np.asarray(out2)[0, :30], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out1)[1, :50], np.asarray(out2)[1, :50], atol=1e-6
    )


def test_fused_gradients_match_unfused():
    q, k, v, fc, lengths = make_inputs()
    cos, sin = split_rope_tables(fc)
    qmask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)[..., None, None]

    def loss_fused(q, k, v):
        o = rope_flash_attention(q, k, v, cos, sin, lengths, D**-0.5)
        return jnp.sum(jnp.sin(o) * qmask)

    def loss_ref(q, k, v):
        o = unfused_reference(q, k, v, fc, lengths)
        return jnp.sum(jnp.sin(o) * qmask)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_fused_gradients_t1024_pallas_bwd(monkeypatch):
    """Gradient equivalence at T=1024 (the 512x512 extrapolation shape),
    forcing the Pallas flash-backward (VMEM head-chunked: hc=4 of 8 heads at
    d=64) against the XLA einsum backward (VERDICT round-1 item 10)."""
    b, t, h, d = 1, 1024, 8, 64
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    fc = jnp.asarray(rope_freqs_2d(d, 32, 32)[None].astype(np.float32))  # (1, 1024, d)
    lengths = jnp.asarray([1000], jnp.int32)
    cos, sin = split_rope_tables(fc)
    qmask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)[..., None, None]

    # head-chunking must actually engage at these shapes
    from fit_tpu.ops.fused_attention import _head_chunk

    assert _head_chunk(h, t, d, 4) < h

    def loss(q, k, v):
        o = rope_flash_attention(q, k, v, cos, sin, lengths, d**-0.5)
        return jnp.sum(jnp.sin(o) * qmask)

    monkeypatch.setenv("FIT_TPU_PALLAS_BWD", "always")
    g_pallas = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("FIT_TPU_PALLAS_BWD", "never")
    g_xla = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_model_fused_backend_matches_xla():
    """FiT with attn_backend='fused' == attn_backend='xla' numerically."""
    from fit_tpu.models import FiT

    kw = dict(
        patch_size=2, in_channels=4, hidden_size=48, depth=2, num_heads=3,
        num_classes=5, class_dropout_prob=0.0,
    )
    m_x = FiT(**kw, attn_backend="xla")
    m_f = FiT(**kw, attn_backend="fused")
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.normal(size=(2, T, 16)).astype(np.float32))
    pos = jnp.asarray(np.broadcast_to(rope_freqs_2d(16, 8, 8), (2, T, 16)).copy())
    mask = jnp.asarray(np.arange(T)[None] < np.array([[40], [64]]))
    t = jnp.asarray([3, 700])
    y = jnp.asarray([1, 2])

    params = m_x.init({"params": jax.random.PRNGKey(0)}, tokens, t, y, pos, mask, train=True)
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree.unflatten(
        td, [0.05 * jax.random.normal(kk, l.shape, l.dtype) for kk, l in zip(keys, leaves)]
    )
    want = np.asarray(m_x.apply(params, tokens, t, y, pos, mask, train=True))
    got = np.asarray(m_f.apply(params, tokens, t, y, pos, mask, train=True))
    np.testing.assert_allclose(got[:, :40], want[:, :40], atol=3e-5)


def _qkv_from_parts(q, k, v):
    b, t, h, d = q.shape
    return jnp.concatenate(
        [q.reshape(b, t, h * d), k.reshape(b, t, h * d), v.reshape(b, t, h * d)],
        axis=-1,
    )


def test_qkv_natural_matches_split_kernel():
    """qkv_rope_flash_attention (natural (B,T,3C) layout, VMEM head
    extraction) == rope_flash_attention on the split tensors."""
    from fit_tpu.ops.fused_attention import qkv_rope_flash_attention

    q, k, v, fc, lengths = make_inputs()
    cos, sin = split_rope_tables(fc)
    want = rope_flash_attention(q, k, v, cos, sin, lengths, D**-0.5)
    got = qkv_rope_flash_attention(
        _qkv_from_parts(q, k, v), cos, sin, lengths, D**-0.5, H
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want).reshape(B, T, H * D), atol=2e-6
    )


def test_qkv_natural_full_length_branch():
    """The mask-skip fast path (every row full length) matches the masked
    branch's math."""
    from fit_tpu.ops.fused_attention import qkv_rope_flash_attention

    q, k, v, fc, _ = make_inputs()
    cos, sin = split_rope_tables(fc)
    full = jnp.asarray([T, T], jnp.int32)
    got = qkv_rope_flash_attention(_qkv_from_parts(q, k, v), cos, sin, full, D**-0.5, H)
    want = unfused_reference(q, k, v, fc, full).reshape(B, T, H * D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("bwd_mode", ["always", "never"])
def test_qkv_natural_gradients(monkeypatch, bwd_mode):
    """d(qkv) through the natural kernel (Pallas flash bwd AND the XLA
    fallback) == gradients through the split reference path."""
    from fit_tpu.ops.fused_attention import qkv_rope_flash_attention

    q, k, v, fc, lengths = make_inputs()
    cos, sin = split_rope_tables(fc)
    qkv = _qkv_from_parts(q, k, v)
    qmask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)[..., None]

    def loss_natural(qkv):
        o = qkv_rope_flash_attention(qkv, cos, sin, lengths, D**-0.5, H)
        return jnp.sum(jnp.sin(o) * qmask)

    def loss_ref(qkv):
        b, t, w = qkv.shape
        q, k, v = (
            qkv[..., :w // 3].reshape(b, t, H, D),
            qkv[..., w // 3 : 2 * w // 3].reshape(b, t, H, D),
            qkv[..., 2 * w // 3 :].reshape(b, t, H, D),
        )
        o = unfused_reference(q, k, v, fc, lengths).reshape(b, t, w // 3)
        return jnp.sum(jnp.sin(o) * qmask)

    monkeypatch.setenv("FIT_TPU_PALLAS_BWD", bwd_mode)
    g = jax.grad(loss_natural)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-5)


def test_qkv_natural_chunked_long_t():
    """t > 1024 takes the K-chunked online-softmax branch; it must match the
    fp32 oracle on both full-length and padded rows (incl. a fully-masked
    trailing chunk)."""
    from fit_tpu.ops.fused_attention import _xla_reference, qkv_rope_flash_attention

    b, t, h, d = 2, 1280, 2, 8  # 2 chunks of 640
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    fc = jnp.asarray(
        np.broadcast_to(rope_freqs_2d(d, 32, 40), (b, t, d)).copy()
    )
    cos, sin = split_rope_tables(fc)
    # row 1's length (500) leaves chunk 2 fully masked
    lengths = jnp.asarray([t, 500], jnp.int32)
    qkv = jnp.concatenate(
        [q.reshape(b, t, h * d), k.reshape(b, t, h * d), v.reshape(b, t, h * d)],
        axis=-1,
    )
    got = qkv_rope_flash_attention(qkv, cos, sin, lengths, d**-0.5, h)
    want, _ = _xla_reference(q, k, v, cos, sin, lengths, d**-0.5)
    valid = (jnp.arange(t)[None, :] < lengths[:, None]).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(got).reshape(b, t, h, d) * np.asarray(valid)[..., None, None],
        np.asarray(want) * np.asarray(valid)[..., None, None],
        atol=3e-5,
    )


def _chunked_grad_case(b, t, h, d, lengths):
    """grads through qkv_rope_flash_attention vs the fp32 XLA oracle, on
    query rows inside ``lengths`` (padded rows carry garbage by key-only
    masking semantics, same as the forward)."""
    from fit_tpu.ops.fused_attention import _xla_reference, qkv_rope_flash_attention

    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.normal(size=(b, t, 3 * h * d)).astype(np.float32))
    fc = jnp.asarray(np.broadcast_to(rope_freqs_2d(d, 64, 64)[:t], (b, t, d)).copy())
    cos, sin = split_rope_tables(fc)
    lengths = jnp.asarray(lengths, jnp.int32)
    qmask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)[..., None]

    def loss_natural(x):
        o = qkv_rope_flash_attention(x, cos, sin, lengths, d**-0.5, h)
        return jnp.sum(jnp.sin(o) * qmask)

    def loss_ref(x):
        q5 = x.reshape(b, t, 3, h, d)
        o, _ = _xla_reference(q5[:, :, 0], q5[:, :, 1], q5[:, :, 2], cos, sin, lengths, d**-0.5)
        return jnp.sum(jnp.sin(o.reshape(b, t, h * d)) * qmask)

    g = jax.grad(loss_natural)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-5)


def test_qkv_chunked_gradients_long_t():
    """t > 1024 now takes the K-chunked Pallas BACKWARD (VERDICT r2 item 1:
    the 768^2-budget training gap — previously the XLA fallback materialized
    (B, H, T, T) fp32 scores). Gradient equivalence vs the fp32 oracle at
    t=1280 (2 key chunks of 640), incl. a row whose length leaves the last
    chunk fully masked."""
    _chunked_grad_case(2, 1280, 2, 8, lengths=(1280, 500))


def test_qkv_q_chunked_forward_and_gradients(monkeypatch):
    """Lowered thresholds force the 3D (b, q-chunk, k-chunk) grid — the
    T=4096 (1024x1024 extrapolation) configuration — at test-size shapes:
    t=256 with cq=128 (2 q chunks) and ck=64 (4 k chunks)."""
    monkeypatch.setenv("FIT_TPU_CHUNK_T", "64")
    monkeypatch.setenv("FIT_TPU_QCHUNK_T", "128")
    _chunked_grad_case(2, 256, 2, 8, lengths=(256, 200))


def test_qkv_two_pass_chunked_gradients(monkeypatch):
    """t above the single-pass backward's VMEM ceiling routes to the
    TWO-PASS fully-chunked backward (dq pass + [dk|dv] pass, no full-T
    block — the r3 T=4096 training unlock). Lowered gates force it at
    test-size shapes: t=256, 4 chunks of 64, with a padded row."""
    monkeypatch.setenv("FIT_TPU_CHUNK_T", "64")
    monkeypatch.setenv("FIT_TPU_QCHUNK_T", "128")
    monkeypatch.setenv("FIT_TPU_SINGLE_BWD_T", "64")
    _chunked_grad_case(2, 256, 2, 8, lengths=(256, 200))
    # chunk-boundary masking: a length leaving the final chunk fully dead
    _chunked_grad_case(2, 256, 2, 8, lengths=(128, 65))


def test_chunk_picker_and_degenerate_t_gate():
    """_pick_chunk bounds the chunk floor (a prime T in the chunked range
    would degenerate to 1-row chunks — advisor finding r2); fused_supported
    reports such T as unsupported so FiT routes them to the blocked kernel."""
    from fit_tpu.ops.fused_attention import _pick_chunk, fused_supported

    assert _pick_chunk(2304) == 768
    assert _pick_chunk(4096) == 1024
    assert _pick_chunk(1280) == 640
    assert _pick_chunk(1283) is None  # prime
    assert _pick_chunk(2 * 1069) is None  # 2138: best divisor 2 < floor 128
    assert fused_supported(1024) and fused_supported(2304) and fused_supported(4096)
    assert not fused_supported(1283) and not fused_supported(2138)
