"""Pipeline parallelism: GPipe microbatch streaming over a 'pipe' mesh axis.

The reference has no model-partitioning story at all (its only distribution
is DDP capability, ``/root/reference/FiT/train.py:283``); this module closes
the last classic parallelism axis for fit_tpu: the depth-``D`` block stack is
split into ``pp`` contiguous stages (each device holds ``D/pp`` layers of the
scan-over-layers stacked params), and microbatches stream through the stages
with ``ppermute`` hops over ICI — the standard SPMD pipelining pattern on
TPU (one program, every stage executes the same code on its own layer
shard; bubbles are idle-shaped compute, not control flow).

Schedule: plain GPipe — ``M`` microbatches take ``M + pp - 1`` ticks, bubble
fraction ``(pp-1)/(M+pp-1)``. Each tick every stage (a) selects its current
microbatch's conditioning/mask/RoPE slices, (b) applies its local layers
(a ``lax.scan`` over the stage's stacked params — the same compiled block
body as the single-chip scan-over-layers path, including the remat policy),
and (c) ``ppermute``\\ s its activation to the next stage. Stage 0 injects
fresh microbatches; the last stage accumulates outputs, reduced across the
pipe axis at the end (every other stage contributes zeros).

What runs OUTSIDE the pipeline: the embedders and the final layer — tiny,
replicated over 'pipe' and sharded over 'data' like the single-mesh path.

Composition: 'pipe' multiplies with 'data' (each stage processes its DP
shard of every microbatch). TP/SP inside a stage would need manual
collectives inside the shard_map body and is intentionally not wired —
FiT-XL at 675M params wants pp for memory headroom, not intra-layer
splits; assert accordingly.

Differentiability: everything in the tick loop (ppermute, dynamic
index/update, scan) has an exact transpose, so ``jax.grad`` through
:func:`pipelined_apply` is the 1F1B-equivalent backward GPipe implies —
verified bit-exact against the single-mesh model in
``tests/test_pipeline_parallel.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fit_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS

Array = jnp.ndarray

__all__ = ["pipelined_apply", "make_pipelined_apply"]


def _dyn(tree, i):
    """Index the leading (microbatch) axis of a pytree at traced ``i``."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False), tree
    )


def pipelined_apply(
    model,
    params,
    tokens: Array,
    t: Array,
    y: Array,
    pos: Array,
    mask: Array,
    *,
    mesh,
    microbatches: int,
    pipe_axis: str = PIPE_AXIS,
    train: bool = True,
    rngs: Optional[dict] = None,
):
    """GPipe forward of a scan-blocks FiT. Drop-in for
    ``model.apply(params, tokens, t, y, pos, mask, train=..., rngs=...)``
    in TRAIN mode (token inputs) — same outputs, block stack streamed over
    the 'pipe' mesh axis.

    Requires ``model.scan_blocks`` (stacked (depth, ...) block params),
    ``pos_kind='rotate'``, depth % pp == 0, batch % microbatches == 0.
    The embedder/final sublayers run outside the pipeline; their code here
    mirrors ``FiT.__call__`` exactly (guarded by the parity test).
    """
    from fit_tpu.models.layers import (
        FiTBlock,
        FinalLayer,
        LabelEmbedder,
        TimestepEmbedder,
        default_kernel_init,
    )
    from fit_tpu.ops.fused_attention import force_raw_kernel_calls, split_rope_tables
    import flax.linen as nn

    assert model.scan_blocks, "pipeline parallelism needs scan-over-layers params"
    assert model.pos_kind == "rotate", "pipeline parallelism needs RoPE"
    assert model.quant == "none", "pipeline + int8 serving unsupported"
    assert model.seq_mesh is None, "pipe x seq composition not wired"
    pp = mesh.shape[pipe_axis]
    assert model.depth % pp == 0, f"depth {model.depth} % pp {pp} != 0"
    mdict = dict(mesh.shape)
    assert mdict.get("model", 1) == 1, "pipe x tensor-parallel not wired"

    p = params["params"]
    dtype = model.dtype
    hidden = model.hidden_size

    # ---- embedders (replicated over pipe; mirrors FiT.__call__) ----
    x = tokens.astype(dtype)
    x = nn.Dense(hidden, kernel_init=default_kernel_init, dtype=dtype).apply(
        {"params": p["x_embedder"]}, x
    )
    t_emb = TimestepEmbedder(hidden, dtype=dtype).apply({"params": p["t_embedder"]}, t)
    y_kwargs = {}
    if rngs and "label_dropout" in rngs:
        y_kwargs["rngs"] = {"label_dropout": rngs["label_dropout"]}
    y_emb = LabelEmbedder(
        model.num_classes, hidden, model.class_dropout_prob, dtype=dtype
    ).apply({"params": p["y_embedder"]}, y, train, **y_kwargs)
    c = t_emb + y_emb
    cos, sin = split_rope_tables(pos)

    # ---- microbatch split ----
    b, t_len, _ = x.shape
    m = microbatches
    assert b % m == 0, f"batch {b} % microbatches {m} != 0"
    mb = b // m
    dp = mdict.get(DATA_AXIS, 1)
    assert mb % dp == 0, f"microbatch {mb} % dp {dp} != 0"
    xs = x.reshape(m, mb, *x.shape[1:])
    cs = c.reshape(m, mb, *c.shape[1:])
    masks = mask.reshape(m, mb, *mask.shape[1:])
    cos_s = cos.reshape(m, mb, *cos.shape[1:])
    sin_s = sin.reshape(m, mb, *sin.shape[1:])

    # ---- per-stage block application (same classes as FiT.__call__) ----
    block_kwargs = dict(
        hidden_size=hidden,
        num_heads=model.num_heads,
        mlp_ratio=model.mlp_ratio,
        ffn=model.ffn,
        use_rope=True,
        attn_backend=model.attn_backend,
        dtype=dtype,
    )
    if model.remat == "dots":
        block_cls = nn.remat(
            FiTBlock, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    elif model.remat:
        block_cls = nn.remat(FiTBlock)
    else:
        block_cls = FiTBlock
    block = block_cls(**block_kwargs)

    stacked = p["blocks"]["block"]  # (depth, ...) leaves

    from jax.sharding import PartitionSpec as P

    def body(blocks_local, xs, cs, masks, cos_s, sin_s):
        s = jax.lax.axis_index(pipe_axis)
        pp_sz = jax.lax.axis_size(pipe_axis)

        def stage(xc, c_i, mask_i, cos_i, sin_i):
            def one(xc, p_layer):
                return block.apply({"params": p_layer}, xc, c_i, mask_i, (cos_i, sin_i)), None

            with force_raw_kernel_calls():
                out, _ = jax.lax.scan(one, xc, blocks_local)
            return out

        def tick(i, carry):
            inp, outputs = carry
            # stage 0 injects microbatch i; later stages consume the hop
            x0 = jax.lax.dynamic_index_in_dim(xs, jnp.clip(i, 0, m - 1), 0, keepdims=False)
            cur = jnp.where(s == 0, x0, inp)
            # the microbatch THIS stage processes at tick i is (i - s)
            mb_i = jnp.clip(i - s, 0, m - 1)
            yv = stage(cur, _dyn(cs, mb_i), _dyn(masks, mb_i), _dyn(cos_s, mb_i), _dyn(sin_s, mb_i))
            # last stage records the finished microbatch (i - pp + 1)
            oi = i - (pp_sz - 1)
            oc = jnp.clip(oi, 0, m - 1)
            prev = jax.lax.dynamic_index_in_dim(outputs, oc, 0, keepdims=False)
            val = jnp.where((s == pp_sz - 1) & (oi >= 0), yv, prev)
            outputs = jax.lax.dynamic_update_index_in_dim(outputs, val, oc, 0)
            nxt = jax.lax.ppermute(yv, pipe_axis, [(k, k + 1) for k in range(pp - 1)])
            return nxt, outputs

        inp0 = jnp.zeros_like(xs[0])
        outs0 = jnp.zeros_like(xs)
        _, outputs = jax.lax.fori_loop(0, m + pp - 1, tick, (inp0, outs0))
        # only the last stage wrote non-zeros: the psum both reduces and
        # replicates, so the out_spec can claim pipe-replication
        return jax.lax.psum(outputs, pipe_axis)

    mb_spec4 = P(None, DATA_AXIS, None, None)
    mb_spec3 = P(None, DATA_AXIS, None)
    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(pipe_axis), mb_spec4, mb_spec3, mb_spec3, mb_spec4, mb_spec4),
        out_specs=mb_spec4,
        check_vma=False,
    )(stacked, xs, cs, masks, cos_s, sin_s)
    x = out.reshape(b, t_len, hidden)

    # ---- final layer (replicated over pipe; mirrors FiT.__call__) ----
    return FinalLayer(
        hidden, model.patch_size, model.out_channels, dtype=dtype
    ).apply({"params": p["final"]}, x, c)


def make_pipelined_apply(model, mesh, microbatches: int, pipe_axis: str = PIPE_AXIS):
    """``model.apply``-compatible callable for :func:`make_train_step`:
    ``fn(params, tokens, t, y, pos, mask, train=..., rngs=...)``."""

    def apply_fn(params, tokens, t, y, pos, mask, train=True, rngs=None):
        return pipelined_apply(
            model, params, tokens, t, y, pos, mask,
            mesh=mesh, microbatches=microbatches, pipe_axis=pipe_axis,
            train=train, rngs=rngs,
        )

    return apply_fn
