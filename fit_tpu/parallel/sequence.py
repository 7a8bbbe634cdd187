"""Sequence (context) parallelism: Ulysses-style token<->head all-to-all.

The reference's only distribution story is DDP capability
(``/root/reference/FiT/train.py:283``); this module extends the TPU scaling
envelope along the TOKEN axis, the dimension FiT is explicitly built to grow
(VisionNTK extrapolation, ``/root/reference/FiT/preprocess/pos_embed.py:117``):
shard the token axis of every activation over a ``"seq"`` mesh axis so the
per-chip memory and compute of a long-sequence step drop by ``sp``.

Design (DeepSpeed-Ulysses pattern, arXiv:2309.14509 — see PAPERS.md):

* every token-wise op (x_embedder, LN/adaLN, FFN, projections, final layer)
  is embarrassingly parallel over tokens — GSPMD propagates the
  ``P('data', 'seq', None)`` activation sharding through them with zero
  collectives;
* attention is the ONLY token-coupled op. Around it, two ``all_to_all``s
  swap the sharded axis: tokens -> heads going in (each chip gets FULL-T
  q/k/v for ``H/sp`` of the heads), heads -> tokens coming out. In between,
  the measured fused RoPE+flash kernel (``ops.fused_attention``) runs
  UNCHANGED per shard — heads never interact in attention, so the math is
  bit-identical to the unsharded step (tested).

Cost model: 2 all-to-alls per block moving ``~4·B·T·C/sp`` bytes each over
ICI — the same wire bytes as all-gather SP but without holding full-T K/V
per chip, and without ring attention's ``sp-1`` serialized ppermute steps.
The head-granularity bound (``sp`` must divide the local head count
``H/tp``) is not binding at FiT scales: XL has 16 heads, one v5e/v5p ICI
domain rarely wants sp > 8 on top of dp x tp.

Composition: the ``seq`` axis multiplies with ``data`` (batch) and
``model`` (tensor-parallel head groups) — a qkv activation sharded
``P('data', 'seq', None, 'model')`` enters the all-to-all with local heads
``H/tp`` and leaves with ``H/(tp·sp)``; the TP boundary stays head-aligned
because the head-grouped qkv layout (``models.layers.QKVProject``) makes
every contiguous C-slice a whole head group.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS

Array = jnp.ndarray

__all__ = ["SEQ_AXIS", "ulysses_attention", "token_spec"]


def token_spec(ndim: int, *, data_axis: str = DATA_AXIS, seq_axis: str = SEQ_AXIS):
    """PartitionSpec for a (B, T, ...) activation: batch over data, tokens
    over seq, feature dims replicated."""
    from jax.sharding import PartitionSpec as P

    return P(data_axis, seq_axis, *([None] * (ndim - 2)))


def _rotate_pairs(x: Array) -> Array:
    """Lane-pair rotation (a, b) -> (-b, a) — the RoPE quarter turn, matching
    ``ops.fused_attention.rotation_matrix`` (x @ S) elementwise."""
    a = x[..., 0::2]
    b = x[..., 1::2]
    return jnp.stack([-b, a], axis=-1).reshape(x.shape)


def _xla_inner(qkv: Array, cos: Array, sin: Array, lengths: Array, scale: float,
               head_dim: int) -> Array:
    """Reference attention math on the (B, T, 3, C) qkv activation with
    pair-duplicated cos/sin RoPE tables — the shard-local fallback when the
    Pallas kernel doesn't cover T (equals the kernel to bf16 tolerance)."""
    b, t, _, c = qkv.shape
    h = c // head_dim
    q3 = qkv.reshape(b, t, 3, h, head_dim)
    q, k, v = q3[:, :, 0], q3[:, :, 1], q3[:, :, 2]
    cos_h = cos.astype(jnp.float32)[:, :, None, :]
    sin_h = sin.astype(jnp.float32)[:, :, None, :]

    def rope(x):
        xf = x.astype(jnp.float32)
        return (xf * cos_h + _rotate_pairs(xf) * sin_h).astype(x.dtype)

    q, k = rope(q), rope(k)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * jnp.float32(scale)
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    s = jnp.where(mask[:, None, None, :], s, float("-inf"))
    w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32)
    return o.astype(qkv.dtype).reshape(b, t, c)


def ulysses_attention(
    qkv: Array,
    cos: Array,
    sin: Array,
    lengths: Array,
    scale: float,
    head_dim: int,
    mesh,
    *,
    seq_axis: str = SEQ_AXIS,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
    inner: str = "fused",
) -> Array:
    """Sequence-parallel fused RoPE + masked attention.

    qkv: (B, T, 3, C) head-grouped projection output (or flat (B, T, 3C)),
    globally sharded ``P(data, seq, None[, model])``; cos/sin: (B, T, d)
    fp32 pair-duplicated tables sharded ``P(data, seq, None)``; lengths:
    (B,) int32 prefix-valid lengths (replicated over seq). Returns
    (B, T, C) sharded ``P(data, seq, None)`` in qkv's dtype.

    ``inner``: "fused" routes each shard through the Pallas kernel family
    (interpret mode off-TPU); "xla" uses the einsum fallback (e.g. T past
    the kernel gate).
    """
    if qkv.ndim == 3:
        b_, t_, w_ = qkv.shape
        qkv = qkv.reshape(b_, t_, 3, w_ // 3)
    sp = mesh.shape[seq_axis]
    tp = dict(mesh.shape).get(model_axis, 1)
    t_global, c_global = qkv.shape[1], qkv.shape[3]
    h_global = c_global // head_dim
    assert t_global % sp == 0, f"T={t_global} not divisible by sp={sp}"
    assert (h_global // tp) % sp == 0, (
        f"local head count {h_global}//{tp} not divisible by sp={sp}"
    )

    from jax.sharding import PartitionSpec as P

    model_in_mesh = model_axis in mesh.axis_names
    qkv_spec = P(data_axis, seq_axis, None, model_axis if model_in_mesh else None)
    tab_spec = P(data_axis, seq_axis, None)
    len_spec = P(data_axis)

    def body(qkv_l, cos_l, sin_l, lengths_l):
        # qkv_l: (Bl, T/sp, 3, Cl) — Cl is a whole head group (grouped qkv
        # storage => any contiguous C-slice is [q|k|v]-complete heads)
        # tokens -> heads: split the head axis over seq, gather full T
        x = jax.lax.all_to_all(
            qkv_l, seq_axis, split_axis=3, concat_axis=1, tiled=True
        )  # (Bl, T, 3, Cl/sp)
        cos_f = jax.lax.all_gather(cos_l, seq_axis, axis=1, tiled=True)
        sin_f = jax.lax.all_gather(sin_l, seq_axis, axis=1, tiled=True)
        h_loc = x.shape[-1] // head_dim
        if inner == "fused":
            from fit_tpu.ops.fused_attention import (
                force_raw_kernel_calls,
                qkv_rope_flash_attention,
            )

            # inside shard_map everything is already per-shard: bypass the
            # GSPMD custom_partitioning wrappers (they are a jit-level
            # contract; here they'd just be an unfused call boundary)
            with force_raw_kernel_calls():
                o = qkv_rope_flash_attention(
                    x, cos_f, sin_f, lengths_l, scale, h_loc
                )  # (Bl, T, Cl/sp)
        else:
            o = _xla_inner(x, cos_f, sin_f, lengths_l, scale, head_dim)
        # heads -> tokens: re-shard T, restore the full (head-major) C
        return jax.lax.all_to_all(
            o, seq_axis, split_axis=1, concat_axis=2, tiled=True
        )  # (Bl, T/sp, Cl)

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(qkv_spec, tab_spec, tab_spec, len_spec),
        out_specs=P(data_axis, seq_axis, model_axis if model_in_mesh else None),
        check_vma=False,
    )(qkv, cos, sin, lengths)
    return out
