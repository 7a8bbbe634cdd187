"""Fused 2D-RoPE + masked attention Pallas kernel (the FiT hot op).

One program per batch element computes, per head, entirely in VMEM:

    q_rot = q * cos + (q @ S) * sin        (RoPE, fp32)
    k_rot = k * cos + (k @ S) * sin
    out   = softmax(mask(q_rot k_rot^T * scale)) v

eliminating three HBM round trips the XLA path pays per block: the fp32
rotated q/k tensors and — the big one — the materialized ``(B, H, T, T)``
fp32 score tensor (at XL/2 shapes that alone is ~270 MB per block per step).

Design notes (TPU-first):
* The pairwise rotation ``(a, b) -> (-b, a)`` is expressed as a matmul with
  a constant (d, d) permutation-sign matrix ``S`` — on TPU a lane shuffle is
  cheapest as a tiny MXU op, and each output lane is a single product so the
  values are bit-identical to the reference's ``a*c - b*d`` / ``b*c + a*d``
  complex multiply (``/root/reference/FiT/models/fit.py:144-174``).
* ``cos`` / ``sin`` arrive pre-duplicated per lane pair, (B, T, d), built
  once per forward from the interleaved RoPE table — the per-block strided
  deinterleave the XLA path does is hoisted out of the layer stack.
* The validity mask enters as per-sequence lengths (FiT masks are prefix
  masks by construction) and masks key columns with -inf, matching the
  reference's key-only masking semantics (``fit.py:184-185``).
* Gradients are Pallas too at the shapes where that wins (flash-style
  recompute, no O(T^2) residuals): per-head full-score backward for
  256 <= T <= 1024, K-chunked backward (probabilities rebuilt from the
  forward's saved log2-sum-exp) for 1024 < T <= 2304; exact-XLA-einsum
  fallback elsewhere. All gates carry v5e measurements.

Two kernel families share the math:

* the SPLIT family (``rope_flash_attention``): q, k, v, out are (B, T, H, d)
  — the layout-preserving convention of ``models.layers.SelfAttention``.
* the NATURAL family (``qkv_rope_flash_attention``): consumes the raw
  (B, T, 3, C) qkv projection output with per-head extraction in VMEM
  (zero XLA relayout copies), full-score to T=1024, K-chunked online
  softmax to T=2304, K+Q-chunked 3D grid to T=4096; beyond that the
  blocked kernel in ``ops.attention`` takes over.

Both families carry GSPMD partitioning contracts (``_shard_over_batch`` /
``_shard_batch_model``) so sharded jits run them per-shard — batch split
over 'data', head groups split over 'model' — instead of the partitioner's
default replicate-the-custom-call.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

Array = jnp.ndarray

__all__ = [
    "rope_flash_attention",
    "qkv_rope_flash_attention",
    "split_rope_tables",
    "rotation_matrix",
    "fused_supported",
]

NEG_INF = float("-inf")
LOG2_E = 1.4426950408889634  # log2(e): softmax via exp2 (VPU-native)


_FORCE_RAW_DEPTH = 0  # trace-time: >0 inside force_raw_kernel_calls()


def force_raw_kernel_calls():
    """Context manager: route kernel calls traced inside it past the GSPMD
    custom_partitioning wrappers. Used by code that is ALREADY per-shard —
    a ``shard_map`` body (``parallel.sequence``, ``parallel.pipeline``)
    owns its collectives explicitly, so the jit-level partitioning contract
    would be nothing but an unfused call boundary there."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        global _FORCE_RAW_DEPTH
        _FORCE_RAW_DEPTH += 1
        try:
            yield
        finally:
            _FORCE_RAW_DEPTH -= 1

    return _ctx()


def _use_partition_contract() -> bool:
    """Route kernel calls through the custom_partitioning wrappers only when
    partitioning is possible at all. The wrapper is a call boundary XLA does
    not fuse across — measured r3 on the single-chip 256^2 bench as ~11 ms
    of extra batch-scaling HBM copies per step (111.8 vs 100.5 ms at B=32) —
    so single-device processes take the raw pallas path. Multi-device
    processes keep the contract: without it the partitioner REPLICATES the
    opaque custom call (full-batch all-gathers), which costs ~dp x.
    Override with $FIT_TPU_KERNEL_PARTITION = always | never | auto."""
    import os

    if _FORCE_RAW_DEPTH > 0:
        return False
    v = os.environ.get("FIT_TPU_KERNEL_PARTITION", "auto")
    if v in ("0", "never"):
        return False
    if v in ("1", "always"):
        return True
    return jax.device_count() > 1


def _shard_over_batch(fn, static_argnums, rule):
    """GSPMD partitioning contract for a batch-parallel Pallas kernel.

    ``pallas_call`` lowers to an opaque custom call the SPMD partitioner has
    no rule for, so under a sharded ``jit`` it REPLICATES the op: measured on
    the 8-device mesh, every operand gets a full-batch all-gather and the
    kernel output comes back fully replicated — a silent ~dp x throughput
    loss exactly where multi-chip perf matters (VERDICT r2: the reference's
    DDP capability analogue, ``/root/reference/FiT/train.py:283``).

    Every kernel in this family is embarrassingly parallel over the leading
    batch axis (the grid's first dim; rows never interact), so the correct
    contract is: split ALL operands and results on dim 0 across whatever
    mesh axes shard the caller's batch, and run the kernel per-shard with
    ZERO collectives. ``rule`` is the Shardy einsum-like sharding rule
    (same factor letters = same propagation group); ``infer``/``partition``
    serve the GSPMD path. Unsharded (single-device) calls lower straight
    through. Static args must be TRAILING in ``fn``'s signature.
    """
    cp = custom_partitioning(fn, static_argnums=static_argnums)

    def _batch_axes(arg_infos):
        for a in arg_infos:
            sh = getattr(a, "sharding", None)
            spec = getattr(sh, "spec", None)
            if spec is not None and len(spec) and spec[0] is not None:
                return spec[0]
        return None

    def _mk(mesh, ax, nd):
        return NamedSharding(mesh, PartitionSpec(ax, *([None] * (nd - 1))))

    def _outs(mesh, ax, result_infos):
        if isinstance(result_infos, (list, tuple)):
            return tuple(_mk(mesh, ax, r.ndim) for r in result_infos)
        return _mk(mesh, ax, result_infos.ndim)

    def infer(*cb_args):
        *_, mesh, arg_infos, result_infos = cb_args
        return _outs(mesh, _batch_axes(arg_infos), result_infos)

    def partition(*cb_args):
        *statics, mesh, arg_infos, result_infos = cb_args
        ax = _batch_axes(arg_infos)
        arg_sh = tuple(_mk(mesh, ax, a.ndim) for a in arg_infos)
        out_sh = _outs(mesh, ax, result_infos)

        def lower(*ops):
            return fn(*ops, *statics)

        return mesh, lower, out_sh, arg_sh

    cp.def_partition(
        infer_sharding_from_operands=infer, partition=partition, sharding_rule=rule
    )
    return cp


def _shard_batch_model(fn, static_argnums, rule, arg_model_dims, res_model_dims):
    """Batch + head-group partitioning contract for the natural-layout family.

    Like :func:`_shard_over_batch`, plus tensor parallelism: heads never
    interact in attention, so when the ``(B, T, 3, C)`` qkv operand arrives
    with its last dim sharded over a mesh axis (the head-grouped Megatron
    layout — C is ``[head0 | head1 | ...]`` lanes, so a C-shard is a
    complete per-head [q|k|v] group), the kernel simply runs per-shard on
    its local heads: zero collectives inside the attention sublayer, exactly
    the Megatron contract (the proj all-reduce happens outside, from the
    row-parallel matmul). The lowered fn derives its local head count from
    the local C (``head_dim`` is the static arg, not ``num_heads``).

    ``arg_model_dims[i]`` / ``res_model_dims[j]`` name the dim of each
    operand / result that carries the head axis (None = replicated there —
    e.g. the RoPE tables are (B, T, head_dim), shared by every head).
    """
    cp = custom_partitioning(fn, static_argnums=static_argnums)

    def _axes(arg_infos):
        batch = model = None
        for a in arg_infos:
            spec = getattr(getattr(a, "sharding", None), "spec", None)
            if spec is not None and len(spec) and spec[0] is not None:
                batch = spec[0]
                break
        spec0 = getattr(getattr(arg_infos[0], "sharding", None), "spec", None)
        md = arg_model_dims[0]
        if spec0 is not None and md is not None and len(spec0) > md:
            model = spec0[md]
        return batch, model

    def _mk(mesh, b_ax, m_ax, nd, mdim):
        spec = [None] * nd
        spec[0] = b_ax
        if m_ax is not None and mdim is not None:
            spec[mdim] = m_ax
        return NamedSharding(mesh, PartitionSpec(*spec))

    def _outs(mesh, b_ax, m_ax, result_infos):
        if isinstance(result_infos, (list, tuple)):
            return tuple(
                _mk(mesh, b_ax, m_ax, r.ndim, md)
                for r, md in zip(result_infos, res_model_dims)
            )
        return _mk(mesh, b_ax, m_ax, result_infos.ndim, res_model_dims[0])

    def infer(*cb_args):
        *_, mesh, arg_infos, result_infos = cb_args
        b_ax, m_ax = _axes(arg_infos)
        return _outs(mesh, b_ax, m_ax, result_infos)

    def partition(*cb_args):
        *statics, mesh, arg_infos, result_infos = cb_args
        b_ax, m_ax = _axes(arg_infos)
        arg_sh = tuple(
            _mk(mesh, b_ax, m_ax, a.ndim, md)
            for a, md in zip(arg_infos, arg_model_dims)
        )
        out_sh = _outs(mesh, b_ax, m_ax, result_infos)

        def lower(*ops):
            return fn(*ops, *statics)

        return mesh, lower, out_sh, arg_sh

    cp.def_partition(
        infer_sharding_from_operands=infer, partition=partition, sharding_rule=rule
    )
    return cp


def rotation_matrix(d: int, dtype=jnp.float32) -> Array:
    """(d, d) constant: ``x @ S`` maps lane pairs (a, b) -> (-b, a)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    plus = (c == r + 1) & (r % 2 == 0)
    minus = (c == r - 1) & (r % 2 == 1)
    return plus.astype(dtype) - minus.astype(dtype)


def split_rope_tables(freqs_cis: Array) -> "tuple[Array, Array]":
    """Interleaved (B, T, d) [cos0, sin0, cos1, sin1, ...] table ->
    pair-duplicated ``cos, sin`` each (B, T, d) fp32."""
    fc = freqs_cis.astype(jnp.float32)
    cos = jnp.repeat(fc[..., 0::2], 2, axis=-1)
    sin = jnp.repeat(fc[..., 1::2], 2, axis=-1)
    return cos, sin


def _kernel(
    lengths_ref,  # (B,) int32 scalar prefetch
    q_ref,  # (1, H, T, d) — one batch row, all heads
    k_ref,
    v_ref,
    cos_ref,  # (1, T, d) f32 — loaded once per row, shared by all heads
    sin_ref,
    o_ref,  # (1, H, T, d)
    *,
    scale: float,
    num_heads: int,
):
    b = pl.program_id(0)
    t = q_ref.shape[2]
    d = q_ref.shape[3]
    length = lengths_ref[b]

    cos = cos_ref[0]  # (T, d)
    sin = sin_ref[0]
    s_rot = rotation_matrix(d)

    # RoPE for ALL heads in two big dots (M = H*T fills the MXU; 2 dots
    # instead of 2*H tiny (T,d)@(d,d) ones)
    hc = num_heads
    cos_all = jnp.broadcast_to(cos[None], (hc, t, d)).reshape(hc * t, d)
    sin_all = jnp.broadcast_to(sin[None], (hc, t, d)).reshape(hc * t, d)

    def rope_all(x_ref):
        x = x_ref[0].astype(jnp.float32).reshape(hc * t, d)
        xr = jax.lax.dot_general(
            x, s_rot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return x * cos_all + xr * sin_all

    # Score/PV dots run in the MODEL dtype: the reference casts the rotated
    # q/k back to the autocast dtype before the score matmul
    # (fit.py:169-170 ``.to(dtype)``) and softmax's output is likewise bf16
    # under autocast, so bf16 dot inputs are parity-faithful AND run the MXU
    # at full rate (fp32 matmuls decompose into multiple passes). fp32
    # inputs keep fp32 dots — the bit-parity oracle mode the tests use.
    dot_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    # fold softmax's ln2 conversion into the score scale: exp(x) == exp2(
    # x * log2 e), and exp2 is the VPU-native transcendental — one fewer
    # (T, T) multiply per head
    qr_all = (rope_all(q_ref) * (scale * LOG2_E)).astype(dot_dtype)  # (H*T, d)
    kr_all = rope_all(k_ref).astype(dot_dtype)

    # Batched-over-heads dots at short T (same measured win as the natural
    # kernel, see _qkv_kernel: Mosaic pipelines the head dim of one 3D dot,
    # hiding the tiny-dot latency). The head-major layout makes this free:
    # operands are already (hc, t, d). Single straight-line body with a
    # scalar where-select (pl.when duplication crashes Mosaic layout
    # inference, see _qkv_kernel).
    if t <= 256:
        key_col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
        neg_mask = jnp.where(key_col < length, 0.0, NEG_INF)
        q3 = qr_all.reshape(hc, t, d)
        k3 = kr_all.reshape(hc, t, d)
        v3 = v_ref[0].astype(dot_dtype)
        s = jax.lax.dot_general(
            q3, k3, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = jnp.where(length >= t, s, s + neg_mask)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m).astype(dot_dtype)
        z = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v3, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        o_ref[0] = (o / z).astype(o_ref.dtype)
        return

    def heads(masked: bool):
        # (1, T) key mask broadcasts across query rows — materializing the
        # (T, T) form costs 4 MB of VMEM at T=1024 (scoped-vmem OOM)
        key_col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
        neg_mask = jnp.where(key_col < length, 0.0, NEG_INF)  # (1, T)
        for h in range(num_heads):  # static unroll; leading-dim slices are free
            qr = qr_all[h * t : (h + 1) * t]
            kr = kr_all[h * t : (h + 1) * t]
            v = v_ref[0, h].astype(dot_dtype)
            s = jax.lax.dot_general(
                qr, kr, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            if masked:
                s = s + neg_mask
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m).astype(dot_dtype)
            # normalize on the (T, d) output, not the (T, T) matrix: T/d fewer
            # VPU divides (d=72 vs T=256+ at FiT shapes); z sums the SAME
            # rounded p the PV dot consumes, so o/z is an exact average
            z = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            o_ref[0, h] = (o / z).astype(o_ref.dtype)

    # Full-length rows (every sampling batch at a single resolution) skip the
    # mask add entirely — one fewer (T, T) VPU pass per head.
    @pl.when(length >= t)
    def _():
        heads(masked=False)

    @pl.when(length < t)
    def _():
        heads(masked=True)


def _kernel_direct(
    lengths_ref,  # (B,) int32 scalar prefetch
    q_ref,  # (1, T, H, d) — the model's native layout, NO XLA-side transpose
    k_ref,
    v_ref,
    cos_ref,  # (1, T, d) f32
    sin_ref,
    o_ref,  # (1, T, H, d)
    *,
    scale: float,
    num_heads: int,
):
    """Same math as :func:`_kernel`, but blocks arrive in the model's
    (B, T, H, d) layout and heads are accessed with strided per-head VMEM
    slices; output is written head-major (one XLA transpose on the way back).

    Status: env-gated EXPERIMENT ($FIT_TPU_ATTN_LAYOUT=direct), measured
    SLOWER than the default transpose feed. Context: XLA feeds the default
    (B, H, T, d) kernel through a 3-stage relayout pipeline that scales
    super-linearly with batch (~95 ms/forward at XL/2 B=128 — profiled via
    op_profile; the round-1 batch-throughput anomaly). Every in-kernel
    alternative measured worse on v5e (XL/2 forward, ms at CFG-batch
    16/128): XLA-transpose feed 52.6/316 (best), in-VMEM bulk transpose
    60.3/327, strided per-head slices (this kernel) 61.8/359, 128-lane
    head padding 58.2/357. At d=72 there is no cheap relayout on this
    hardware/toolchain; the XLA copies win. Kept as the measurement record
    and for future Mosaic versions.
    """
    b = pl.program_id(0)
    t = q_ref.shape[1]
    d = q_ref.shape[3]
    length = lengths_ref[b]

    cos = cos_ref[0]  # (T, d)
    sin = sin_ref[0]
    s_rot = rotation_matrix(d)

    # (1, T) key mask broadcasts across query rows — materializing the
    # (T, T) form costs 4 MB of VMEM at T=1024 (scoped-vmem OOM)
    key_col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    neg_mask = jnp.where(key_col < length, 0.0, NEG_INF)  # (1, T)

    def rope(x):
        xr = jax.lax.dot_general(
            x, s_rot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return x * cos + xr * sin

    for h in range(num_heads):
        q = q_ref[0, :, h, :].astype(jnp.float32)  # strided (T, d) slice
        k = k_ref[0, :, h, :].astype(jnp.float32)
        v = v_ref[0, :, h, :].astype(jnp.float32)
        qr = rope(q) * (scale * LOG2_E)
        kr = rope(k)
        s = jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + neg_mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        z = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # output block is HEAD-MAJOR (1, hc, T, d): leading-index writes are
        # the one store pattern Mosaic lowers cleanly; the single XLA
        # transpose back to (B, T, H, d) is cheap next to the 3-stage input
        # relayout this kernel avoids
        o_ref[0, h] = (o / z).astype(o_ref.dtype)


def _forward_direct(q, k, v, cos, sin, lengths, scale):
    """q, k, v: (B, T, H, d) — the model layout, consumed directly.
    Returns (B, H, T, d) — callers transpose back (one XLA copy total)."""
    b, t, h, d = q.shape
    hc = _head_chunk(h, t, d, q.dtype.itemsize)
    kernel = functools.partial(_kernel_direct, scale=scale, num_heads=hc)
    spec = pl.BlockSpec((1, t, hc, d), lambda i, j, lens: (i, 0, j, 0))
    spec_tab = pl.BlockSpec((1, t, d), lambda i, j, lens: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hc),
            in_specs=[spec, spec, spec, spec_tab, spec_tab],
            out_specs=pl.BlockSpec((1, hc, t, d), lambda i, j, lens: (i, j, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(lengths, q, k, v, cos, sin)


def _head_chunk(h: int, t: int, d: int, itemsize: int, budget_bytes: int = 6 << 20) -> int:
    """Largest divisor of ``h`` whose 3x(double-buffered) qkv block fits the
    VMEM budget (all heads per program at T=256; chunks of 4 at T=1024)."""
    per_head = t * d * itemsize * 3 * 2
    hc = max(1, min(h, budget_bytes // max(per_head, 1)))
    while h % hc:
        hc -= 1
    return hc


def _forward(q, k, v, cos, sin, lengths, scale):
    """q, k, v: (B, H, T, d) here (kernel-internal layout)."""
    b, h, t, d = q.shape
    hc = _head_chunk(h, t, d, q.dtype.itemsize)
    kernel = functools.partial(_kernel, scale=scale, num_heads=hc)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hc),
            in_specs=[
                pl.BlockSpec((1, hc, t, d), lambda i, j, lens: (i, j, 0, 0)),
                pl.BlockSpec((1, hc, t, d), lambda i, j, lens: (i, j, 0, 0)),
                pl.BlockSpec((1, hc, t, d), lambda i, j, lens: (i, j, 0, 0)),
                pl.BlockSpec((1, t, d), lambda i, j, lens: (i, 0, 0)),
                pl.BlockSpec((1, t, d), lambda i, j, lens: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, hc, t, d), lambda i, j, lens: (i, j, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            # batch dim "parallel": v5e has 2 megacores; this distributes
            # grid rows across them (guide: megacore parallelism)
            dimension_semantics=("parallel", "arbitrary"),
            # T=1024 keeps two (T, T) fp32 score temporaries live (~8 MB)
            # alongside the qkv blocks; the default 16 MB scoped limit OOMs
            vmem_limit_bytes=(32 << 20) if t >= 1024 else None,
        ),
        interpret=jax.default_backend() != "tpu",
    )(lengths, q, k, v, cos, sin)


def _bwd_kernel(
    lengths_ref,  # (B,) int32 scalar prefetch
    q_ref,  # (1, H, T, d)
    k_ref,
    v_ref,
    g_ref,  # (1, H, T, d) upstream gradient
    cos_ref,  # (1, T, d) f32
    sin_ref,
    dq_ref,  # (1, H, T, d)
    dk_ref,
    dv_ref,
    *,
    scale: float,
    num_heads: int,
):
    """Flash-style attention backward: recompute p in VMEM, no O(T^2) HBM.

    Uses ``delta_i = sum_k p_ik dp_ik`` (== g.o) to avoid recomputing o.
    The RoPE VJP is ``g*cos + (g*sin) @ S^T`` with the same constant
    rotation matrix as the forward (``S^T = -S``: dot with S then negate).
    """
    b = pl.program_id(0)
    t = q_ref.shape[2]
    d = q_ref.shape[3]
    length = lengths_ref[b]

    cos = cos_ref[0]
    sin = sin_ref[0]
    s_rot = rotation_matrix(d)

    # (1, T) key mask broadcasts across query rows — materializing the
    # (T, T) form costs 4 MB of VMEM at T=1024 (scoped-vmem OOM)
    key_col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    neg_mask = jnp.where(key_col < length, 0.0, NEG_INF)  # (1, T)

    def dot(a, bb, dims):
        return jax.lax.dot_general(a, bb, (dims, ((), ())), preferred_element_type=jnp.float32)

    # batched-across-heads RoPE (see forward kernel): 2 big dots, not 2*H tiny
    hc = num_heads
    cos_all = jnp.broadcast_to(cos[None], (hc, t, d)).reshape(hc * t, d)
    sin_all = jnp.broadcast_to(sin[None], (hc, t, d)).reshape(hc * t, d)

    def rope_all(x_ref):
        x = x_ref[0].astype(jnp.float32).reshape(hc * t, d)
        xr = dot(x, s_rot, ((1,), (0,)))
        return x * cos_all + xr * sin_all

    def rope_vjp(gx):
        # S is antisymmetric: gx*sin @ S^T == -(gx*sin @ S)
        return gx * cos - dot(gx * sin, s_rot, ((1,), (0,)))

    # bf16 dot inputs on bf16 activations (reference-faithful: autocast
    # backward runs the same-dtype matmuls); fp32 keeps the oracle mode.
    dot_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    # exp2 with log2e folded into the score scale, as in the forward
    qr_all = (rope_all(q_ref) * (scale * LOG2_E)).astype(dot_dtype)
    kr_all = rope_all(k_ref).astype(dot_dtype)

    for h in range(num_heads):
        qr = qr_all[h * t : (h + 1) * t]
        kr = kr_all[h * t : (h + 1) * t]
        v = v_ref[0, h].astype(dot_dtype)
        g = g_ref[0, h].astype(dot_dtype)

        s = dot(qr, kr, ((1,), (1,))) + neg_mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dot_dtype)

        dv = dot(p, g, ((0,), (0,)))  # p^T g: (Tk, d)
        dp = dot(g, v, ((1,), (1,)))  # (Tq, Tk)
        pf = p.astype(jnp.float32)
        delta = jnp.sum(pf * dp, axis=-1, keepdims=True)  # (Tq, 1)
        ds = (pf * (dp - delta)).astype(dot_dtype)
        # ds is in the natural-log score domain; kr is unscaled, qr carries
        # scale*log2e — divide the fold back out of dkr
        dqr = dot(ds, kr, ((1,), (0,))) * scale
        dkr = dot(ds, qr, ((0,), (0,))) * (1.0 / LOG2_E)  # ds^T qr: (Tk, d)

        dq_ref[0, h] = rope_vjp(dqr).astype(dq_ref.dtype)
        dk_ref[0, h] = rope_vjp(dkr).astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _backward(q, k, v, g, cos, sin, lengths, scale):
    """q, k, v, g: (B, H, T, d). Returns (dq, dk, dv) same shape."""
    b, h, t, d = q.shape
    # 7 head-blocks live (4 in + 3 out): scale the chunk budget accordingly
    hc = _head_chunk(h, t, d, q.dtype.itemsize, budget_bytes=(6 << 20) * 3 // 7)
    kernel = functools.partial(_bwd_kernel, scale=scale, num_heads=hc)
    spec4 = pl.BlockSpec((1, hc, t, d), lambda i, j, lens: (i, j, 0, 0))
    spec3 = pl.BlockSpec((1, t, d), lambda i, j, lens: (i, 0, 0))
    out = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hc),
            in_specs=[spec4, spec4, spec4, spec4, spec3, spec3],
            out_specs=(spec4, spec4, spec4),
        ),
        out_shape=(out, out, out),
        compiler_params=pltpu.CompilerParams(
            # batch dim "parallel": v5e has 2 megacores; this distributes
            # grid rows across them (guide: megacore parallelism)
            dimension_semantics=("parallel", "arbitrary"),
            # see _forward: (T, T) temporaries exceed the 16 MB scope at 1024
            vmem_limit_bytes=(48 << 20) if t >= 1024 else None,
        ),
        interpret=jax.default_backend() != "tpu",
    )(lengths, q, k, v, g, cos, sin)


def _xla_reference(q, k, v, cos, sin, lengths, scale):
    """Same math in XLA (used for the backward recompute and as the
    correctness oracle)."""
    qf, kf, vf = (a.astype(jnp.float32) for a in (q, k, v))
    d = q.shape[-1]
    s_rot = rotation_matrix(d)

    def rope(x):
        return x * cos[:, :, None, :] + jnp.einsum(
            "bthd,de->bthe", x, s_rot, preferred_element_type=jnp.float32
        ) * sin[:, :, None, :]

    qr = rope(qf)
    kr = rope(kf)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qr, kr, preferred_element_type=jnp.float32) * scale
    t = q.shape[1]
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, vf, preferred_element_type=jnp.float32)
    return out, (qr, kr, p)


# GSPMD batch-partitioning contracts (see _shard_over_batch). The "direct"
# env-gated experiment kernel stays unwrapped — it never runs in production.
_forward_p = _shard_over_batch(
    _forward, (6,),
    "b h t d, b h t d, b h t d, b t d, b t d, b -> b h t d",
)
_backward_p = _shard_over_batch(
    _backward, (7,),
    "b h t d, b h t d, b h t d, b h t d, b t d, b t d, b"
    " -> b h t d, b h t d, b h t d",
)


def _forward_bthd(q, k, v, cos, sin, lengths, scale, partition=None):
    import os

    # "transpose" (default): XLA-side transposes around the (B, H, T, d)
    # kernel — measured faster than "direct" (kernel consumes (B, T, H, d)
    # and relayouts in VMEM), which loses to Mosaic's in-VMEM shuffle cost.
    # (A per-(b, h) grid whose strided input DMA would do the relayout during
    # the fetch is rejected by Pallas: block dim -2 must be divisible by 8 or
    # equal to the array dim, so H cannot be tiled at granularity 1.)
    if os.environ.get("FIT_TPU_ATTN_LAYOUT", "transpose") == "direct":
        out = _forward_direct(q, k, v, cos, sin, lengths, scale)
        return out.transpose(0, 2, 1, 3)
    qh, kh, vh = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
    if partition is None:
        partition = _use_partition_contract()
    fwd = _forward_p if partition else _forward
    out = fwd(qh, kh, vh, cos, sin, lengths, scale)
    return out.transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _rope_flash_core(q, k, v, cos, sin, lengths, scale, partition):
    return _forward_bthd(q, k, v, cos, sin, lengths, scale, partition)


def rope_flash_attention(q, k, v, cos, sin, lengths, scale):
    """Fused RoPE + masked attention. q/k/v: (B, T, H, d); cos/sin: (B, T, d)
    fp32 pair-duplicated tables (see :func:`split_rope_tables`); lengths:
    (B,) int32 prefix-valid lengths. Returns (B, T, H, d) in q's dtype.

    The GSPMD-contract choice is frozen STATICALLY at forward-trace time
    (like the qkv family) so a backward traced later — e.g. during shard_map
    transposition — takes the same raw/partitioned route.
    """
    return _rope_flash_core(q, k, v, cos, sin, lengths, scale, _use_partition_contract())


def _fwd(q, k, v, cos, sin, lengths, scale, partition):
    out = _forward_bthd(q, k, v, cos, sin, lengths, scale, partition)
    return out, (q, k, v, cos, sin, lengths)


def _use_pallas_bwd(t: int) -> bool:
    """Measured per-T backend choice for the attention backward.

    v5e measurements (FiT-B/2 training step, bf16, batch 128; see PROGRESS):

    ========  =====================  =====================  ========
    T         Pallas flash bwd       XLA einsum bwd         winner
    ========  =====================  =====================  ========
    32-128    ~3x slower             fast (tiny tiles)      XLA
    256       484 img/s in-training  429 img/s (B/2 micro-  Pallas
              (+12%, micro-batch     batch 64: 800 MB of
              64)                    fp32 scores)
    512       wins (same regime)     materializes scores    Pallas
    1024      5.3 ms/grad (B=8,      7.8 ms/grad (1.46x     Pallas
              H=16, d=72, r2         slower)
              grad micro-bench)
    ========  =====================  =====================  ========

    At small batch AND T=256 the margin flips (micro-bench B=8: Pallas 4.1 vs
    XLA 3.6 ms — the score tensor fits comfortably), but training batches
    are large, so the T-gate keeps the in-training winner.

    T > 1024 takes the K-CHUNKED Pallas backward instead (routed via the
    lse-saving residual in _qkv_fwd, not this gate): measured r3 at T=2304
    b=2 XL bf16, 8.4 ms vs 15.5 ms XLA fallback (1.85x, and no (B,H,T,T)
    fp32 HBM); ceiling 2304 (see _chunked_bwd_supported).

    Override with $FIT_TPU_PALLAS_BWD = always | never | auto.
    """
    import os

    mode = os.environ.get("FIT_TPU_PALLAS_BWD", "auto")
    if mode == "always":
        return True
    if mode == "never":
        return False
    if jax.default_backend() != "tpu":
        # interpret-mode kernels are slow; keep CPU tests quick but still
        # exercise the kernel path at the training shapes
        return t <= 512
    return 256 <= t <= 1024


def _bwd(scale, partition, res, g):
    q, k, v, cos, sin, lengths = res
    t = q.shape[1]
    if _use_pallas_bwd(t):
        qh, kh, vh, gh = (a.transpose(0, 2, 1, 3) for a in (q, k, v, g))
        bwd = _backward_p if partition else _backward
        dq, dk, dv = bwd(qh, kh, vh, gh, cos, sin, lengths, scale)
        return (
            dq.transpose(0, 2, 1, 3),
            dk.transpose(0, 2, 1, 3),
            dv.transpose(0, 2, 1, 3),
            None, None, None,
        )
    _, (qr, kr, p) = _xla_reference(q, k, v, cos, sin, lengths, scale)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, v.astype(jnp.float32), preferred_element_type=jnp.float32)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32), preferred_element_type=jnp.float32)
    delta = jnp.sum(gf * o, axis=-1)  # (B, T, H)
    ds = p * (dp - delta.transpose(0, 2, 1)[..., None])  # (B, H, Tq, Tk)
    dqr = jnp.einsum("bhqk,bkhd->bqhd", ds, kr, preferred_element_type=jnp.float32) * scale
    dkr = jnp.einsum("bhqk,bqhd->bkhd", ds, qr, preferred_element_type=jnp.float32) * scale

    d = q.shape[-1]
    s_rot = rotation_matrix(d)

    def rope_t(gx):  # VJP of x -> x*cos + (x@S)*sin  is  g*cos + (g*sin)@S^T
        return gx * cos[:, :, None, :] + jnp.einsum(
            "bthd,ed->bthe", gx * sin[:, :, None, :], s_rot,
            preferred_element_type=jnp.float32,
        )

    dq = rope_t(dqr).astype(q.dtype)
    dk = rope_t(dkr).astype(k.dtype)
    return dq, dk, dv.astype(v.dtype), None, None, None


_rope_flash_core.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Natural-layout fused attention: consumes the raw qkv projection output.
#
# XLA feeds the (B, H, T, d) kernel above through a 3-stage HBM relayout
# pipeline ((B,T,3C) -> {1,2,0} copy -> 5D copy -> per-tensor transposes)
# because d=72 head tiles are lane-misaligned; profiled at ~45 ms of a 157 ms
# XL/2 T=1024 forward (~29% of the step, running at ~2% of HBM bandwidth).
# This kernel takes the qkv matmul output (B, T, 3C) in its NATIVE layout —
# q/k/v enter as three lane-block views of the same array (aligned, dense
# DMA) — and does the per-head (t, d) extraction in VMEM, where the
# misaligned lane slice is a register shuffle instead of an HBM round trip.
# The output lands dense (B, T, C), ready for the out-projection: ZERO
# XLA-side copies around the attention sublayer. Measured (XL/2, T=1024,
# CFG batch 16, v5e, device-chained): 3.38 -> 2.72 ms per attention sublayer,
# bit-identical outputs.
# ---------------------------------------------------------------------------


def _qkv_kernel(
    lengths_ref,  # (B,) int32 scalar prefetch
    q_ref,  # (1, T, C) — lane-block view of qkv at columns [0, C)
    k_ref,  # (1, T, C) — view at [C, 2C)
    v_ref,  # (1, T, C) — view at [2C, 3C)
    cos_ref,  # (1, T, d) f32
    sin_ref,
    o_ref,  # (1, T, C)
    *,
    scale: float,
    num_heads: int,
):
    b = pl.program_id(0)
    t = q_ref.shape[1]
    d = q_ref.shape[2] // num_heads
    length = lengths_ref[b]

    cos = cos_ref[0]
    sin = sin_ref[0]
    s_rot = rotation_matrix(d)
    dot_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    def rope(x):
        xr = jax.lax.dot_general(
            x, s_rot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return x * cos + xr * sin

    # Two loop structures over heads, measured on v5e at (B=16, H=16, d=72),
    # bit-identical outputs:
    # * t <= 256: ONE batched 3D dot per score/PV stage over stacked (H, T, d)
    #   operands — Mosaic pipelines the head dim, hiding the tiny-dot latency
    #   that dominates at short T (0.69 vs 0.78 ms/layer at T=256, -12%).
    # * t > 256: per-head 2D dots — the batched form's (H, T, T) fp32 score
    #   block (64 MB at T=1024) defeats VMEM scheduling (2.30 vs 2.18 ms at
    #   T=1024). Mid-T probed r3 (b=16 XL, per-head vs batched ms/call):
    #   T=512 2.17/2.24, T=576 2.12/2.02, T=768 2.21/2.05 — non-monotonic
    #   and within +-7%, so the gate stays at the r2-measured 256 boundary.
    #   $FIT_TPU_BATCHED_T moves the crossover for probing.
    import os

    batched = t <= int(os.environ.get("FIT_TPU_BATCHED_T", "256"))

    def heads_batched():
        # single straight-line body: the full-length fast path is a scalar
        # jnp.where select (duplicating this body under two pl.when branches
        # crashes Mosaic layout inference: "limits[i] <= dim(i)")
        key_col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
        neg_mask = jnp.where(key_col < length, 0.0, NEG_INF)
        q3 = jnp.stack(
            [q_ref[0, :, i * d : (i + 1) * d] for i in range(num_heads)]
        ).astype(jnp.float32)
        k3 = jnp.stack(
            [k_ref[0, :, i * d : (i + 1) * d] for i in range(num_heads)]
        ).astype(jnp.float32)
        v3 = jnp.stack(
            [v_ref[0, :, i * d : (i + 1) * d] for i in range(num_heads)]
        ).astype(dot_dtype)

        def rope3(x3, s):
            xr = jax.lax.dot_general(
                x3, s_rot, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return ((x3 * cos[None] + xr * sin[None]) * s).astype(dot_dtype)

        qr = rope3(q3, scale * LOG2_E)
        kr = rope3(k3, 1.0)
        s = jax.lax.dot_general(
            qr, kr, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = jnp.where(length >= t, s, s + neg_mask)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m).astype(dot_dtype)
        z = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v3, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        o = (o / z).astype(o_ref.dtype)  # (H, T, d)
        for i in range(num_heads):
            o_ref[0, :, i * d : (i + 1) * d] = o[i]

    def heads(masked: bool):
        key_col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
        neg_mask = jnp.where(key_col < length, 0.0, NEG_INF)
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            q = q_ref[0, :, sl].astype(jnp.float32)
            k = k_ref[0, :, sl].astype(jnp.float32)
            v = v_ref[0, :, sl].astype(dot_dtype)
            qr = (rope(q) * (scale * LOG2_E)).astype(dot_dtype)
            kr = rope(k).astype(dot_dtype)
            s = jax.lax.dot_general(
                qr, kr, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            if masked:
                s = s + neg_mask
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m).astype(dot_dtype)
            z = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            o_ref[0, :, sl] = (o / z).astype(o_ref.dtype)

    if batched:
        heads_batched()
    else:

        @pl.when(length >= t)
        def _():
            heads(False)

        @pl.when(length < t)
        def _():
            heads(True)


def _chunk_threshold() -> int:
    """T above which the natural kernel takes the chunked online-softmax
    grid (no (T, T) score block). 1024 on hardware — measured r3 at the
    boundary (T=1024 b=16 XL bf16): full-score branch 3.13 ms vs 2x512-chunk
    grid 4.30 ms (+27% for chunking: the online-softmax rescale passes cost
    more than the score block saves at this size), so 1024 stays. Tests
    lower it via $FIT_TPU_CHUNK_T to exercise the chunked fwd+bwd at small
    shapes."""
    import os

    return int(os.environ.get("FIT_TPU_CHUNK_T", "1024"))


def _q_chunk_threshold() -> int:
    """T above which the QUERY side is chunked too (3D grid). 2304 on
    hardware — the largest T where full-T query scratch was measured to fit
    VMEM (round 2); beyond it (1024x1024 -> T=4096) q-chunking is required
    to compile at all. Tests lower it via $FIT_TPU_QCHUNK_T."""
    import os

    return int(os.environ.get("FIT_TPU_QCHUNK_T", "2304"))


def _pick_chunk(t: int, target: int = 1024, min_ck: Optional[int] = None) -> Optional[int]:
    """Largest divisor of ``t`` that is <= ``target``, or None when every
    such divisor is < ``min_ck``. The floor guards the degenerate grids a
    divisor-free T would produce (a prime T in the chunked range yields
    1-row chunks and a (b, T) sequential grid — advisor finding r2); callers
    gate on :func:`fused_supported` and fall back to the blocked kernel."""
    if min_ck is None:
        min_ck = min(128, target)
    for n in range(-(-t // target), t // min_ck + 1):
        if t % n == 0:
            return t // n
    return None


def fused_supported(t: int) -> bool:
    """Can the natural fused kernel family handle sequence length ``t``?
    (Gate used by ``FiT.__call__`` before routing to the fused path.)"""
    if t <= _chunk_threshold():
        return True
    if _pick_chunk(t, min(1024, _chunk_threshold())) is None:
        return False
    if t > _q_chunk_threshold() and _pick_chunk(t, min(1024, _q_chunk_threshold())) is None:
        return False
    return True


def _qkv_chunked_kernel(
    lengths_ref,  # (B,) int32 scalar prefetch
    q_ref,  # (1, CQ, C) — one query chunk (lane-block view of qkv)
    k_ref,  # (1, CK, C) — ONE key chunk (grid dim 2 walks the chunks)
    v_ref,  # (1, CK, C)
    cos_q_ref,  # (1, CQ, d) f32 — q-chunk rows of the RoPE table
    sin_q_ref,
    cos_k_ref,  # (1, CK, d) f32 — k-chunk rows
    sin_k_ref,
    o_ref,  # (1, CQ, C) — written on the last key chunk
    *rest,  # [lse_ref (1, CQ, H) f32,] qr_s, m_s, z_s, acc_s scratch
    scale: float,
    num_heads: int,
    chunk: int,
    n_chunks: int,
    with_lse: bool,
):
    """t > 1024: flash-style online softmax with the CHUNK LOOPS IN THE
    GRID (extrapolated resolutions, 768^2 -> T=2304, 1024^2 -> T=4096; keep
    the zero-relayout natural layout with no (T, T) score block). Grid is
    (B, n_q_chunks, n_k_chunks), key chunks innermost; running (m, z, acc)
    live in VMEM scratch across key-chunk steps and reset at kj == 0; Pallas
    pipelines the chunk DMAs. An in-kernel python chunk loop was tried
    first: 3 chunks x 16 heads unrolls to a program the remote compiler
    chews >10 min on. All math in the exp2 domain (log2e folded into qr's
    scale): rescale = exp2(m_old - m_new).

    ``with_lse`` additionally emits the per-row log2-sum-exp
    ``lse2 = m + log2(z)`` (softmax_ij = exp2(s_ij - lse2_i)) — the residual
    the chunked backward needs to recompute probabilities without a second
    online-softmax pass."""
    if with_lse:
        lse_ref, qr_s, m_s, z_s, acc_s = rest
    else:
        qr_s, m_s, z_s, acc_s = rest
    b = pl.program_id(0)
    j = pl.program_id(2)
    c = q_ref.shape[2]
    d = c // num_heads
    length = lengths_ref[b]
    s_rot = rotation_matrix(d)
    dot_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    @pl.when(j == 0)
    def _():
        cos = cos_q_ref[0]
        sin = sin_q_ref[0]
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            q = q_ref[0, :, sl].astype(jnp.float32)
            xr = jax.lax.dot_general(
                q, s_rot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            qr = (q * cos + xr * sin) * (scale * LOG2_E)
            qr_s[:, sl] = qr.astype(qr_s.dtype)
        m_s[...] = jnp.full(m_s.shape, NEG_INF, jnp.float32)
        z_s[...] = jnp.zeros(z_s.shape, jnp.float32)
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

    ck = k_ref.shape[1]
    cos_c = cos_k_ref[0]
    sin_c = sin_k_ref[0]
    key_col = jax.lax.broadcasted_iota(jnp.int32, (1, ck), 1) + j * chunk
    neg = jnp.where(key_col < length, 0.0, NEG_INF)
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        kchunk = k_ref[0, :, sl].astype(jnp.float32)
        xr = jax.lax.dot_general(
            kchunk, s_rot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        kr = (kchunk * cos_c + xr * sin_c).astype(dot_dtype)
        v_c = v_ref[0, :, sl].astype(dot_dtype)
        qr = qr_s[:, sl]
        s = jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = jnp.where(length >= (j + 1) * chunk, s, s + neg)
        m_run = m_s[:, h : h + 1]
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new).astype(dot_dtype)
        alpha = jnp.exp2(m_run - m_new)
        z_s[:, h : h + 1] = z_s[:, h : h + 1] * alpha + jnp.sum(
            p.astype(jnp.float32), axis=-1, keepdims=True
        )
        acc_s[:, sl] = acc_s[:, sl] * alpha + jax.lax.dot_general(
            p, v_c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_s[:, h : h + 1] = m_new

    @pl.when(j == n_chunks - 1)
    def _():
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            o_ref[0, :, sl] = (acc_s[:, sl] / z_s[:, h : h + 1]).astype(o_ref.dtype)
        if with_lse:
            lse_ref[0] = m_s[...] + jnp.log2(z_s[...])


def _qkv_forward_chunked(qkv3, cos, sin, lengths, scale, head_dim, with_lse):
    """Chunked online-softmax forward (t > threshold). Returns ``out`` or
    ``(out, lse2)`` where lse2 is (B, T, H) f32 in the exp2 domain."""
    b, t, _, c = qkv3.shape
    qkv = qkv3.reshape(b, t, 3 * c)
    d = head_dim
    num_heads = c // d
    ck = _pick_chunk(t, min(1024, _chunk_threshold()))
    if ck is None:
        raise ValueError(
            f"T={t} has no key-chunk divisor; gate with fused_supported()"
        )
    n_chunks = t // ck
    cq = t if t <= _q_chunk_threshold() else _pick_chunk(t, min(1024, _q_chunk_threshold()))
    if cq is None:
        raise ValueError(
            f"T={t} has no query-chunk divisor; gate with fused_supported()"
        )
    n_q = t // cq
    kernel = functools.partial(
        _qkv_chunked_kernel, scale=scale, num_heads=num_heads,
        chunk=ck, n_chunks=n_chunks, with_lse=with_lse,
    )
    out_specs = [pl.BlockSpec((1, cq, c), lambda i, qi, kj, lens: (i, qi, 0))]
    out_shapes = [jax.ShapeDtypeStruct((b, t, c), qkv.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, cq, num_heads), lambda i, qi, kj, lens: (i, qi, 0))
        )
        out_shapes.append(jax.ShapeDtypeStruct((b, t, num_heads), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_q, n_chunks),
            in_specs=[
                pl.BlockSpec((1, cq, c), lambda i, qi, kj, lens: (i, qi, 0)),
                pl.BlockSpec((1, ck, c), lambda i, qi, kj, lens: (i, kj, 1)),
                pl.BlockSpec((1, ck, c), lambda i, qi, kj, lens: (i, kj, 2)),
                pl.BlockSpec((1, cq, d), lambda i, qi, kj, lens: (i, qi, 0)),
                pl.BlockSpec((1, cq, d), lambda i, qi, kj, lens: (i, qi, 0)),
                pl.BlockSpec((1, ck, d), lambda i, qi, kj, lens: (i, kj, 0)),
                pl.BlockSpec((1, ck, d), lambda i, qi, kj, lens: (i, kj, 0)),
            ],
            out_specs=tuple(out_specs) if with_lse else out_specs[0],
            scratch_shapes=[
                pltpu.VMEM((cq, c), qkv.dtype),  # roped+scaled q
                pltpu.VMEM((cq, num_heads), jnp.float32),  # running max
                pltpu.VMEM((cq, num_heads), jnp.float32),  # running z
                pltpu.VMEM((cq, c), jnp.float32),  # running PV accum
            ],
        ),
        out_shape=tuple(out_shapes) if with_lse else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            # The q-chunk dim is truly parallel: scratch state (m, z, acc)
            # resets at kj == 0 and flushes at kj == n-1, so each q-chunk's
            # key loop is self-contained. Declaring it "parallel" lets
            # Mosaic stream the per-q-chunk output DMAs instead of
            # serializing on a possible revisit — measured r3 on v5e at
            # T=4096 (B=2 XL): 12.25 -> 4.94 ms/layer (2.5x), bit-identical.
            # At T <= 2304 cq == t (n_q == 1), where this is a no-op.
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=(110 << 20),
        ),
        interpret=jax.default_backend() != "tpu",
    )(lengths, qkv, qkv, qkv, cos, sin, cos, sin)
    return res


def _qkv_forward(qkv3, cos, sin, lengths, scale, head_dim):
    b, t, _, c = qkv3.shape
    d = head_dim
    num_heads = c // d
    if t > _chunk_threshold():
        return _qkv_forward_chunked(
            qkv3, cos, sin, lengths, scale, head_dim, with_lse=False
        )
    qkv = qkv3.reshape(b, t, 3 * c)

    kernel = functools.partial(_qkv_kernel, scale=scale, num_heads=num_heads)
    spec_c = pl.BlockSpec((1, t, c), lambda i, lens: (i, 0, 0))
    spec_k = pl.BlockSpec((1, t, c), lambda i, lens: (i, 0, 1))
    spec_v = pl.BlockSpec((1, t, c), lambda i, lens: (i, 0, 2))
    spec_tab = pl.BlockSpec((1, t, d), lambda i, lens: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[spec_c, spec_k, spec_v, spec_tab, spec_tab],
            out_specs=pl.BlockSpec((1, t, c), lambda i, lens: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # q/k/v/out blocks + two (T, T) score temporaries at T=1024
            vmem_limit_bytes=(64 << 20) if t >= 512 else None,
        ),
        interpret=jax.default_backend() != "tpu",
    )(lengths, qkv, qkv, qkv, cos, sin)


def _qkv_bwd_kernel(
    lengths_ref,  # (B,) int32 scalar prefetch
    q_ref,  # (1, T, C) lane-block views of qkv, as in the forward
    k_ref,
    v_ref,
    g_ref,  # (1, T, C) upstream gradient
    cos_ref,  # (1, T, d) f32
    sin_ref,
    dqkv_ref,  # (1, T, 3C)
    *,
    scale: float,
    num_heads: int,
):
    """Flash backward in the natural layout: recompute p per head in VMEM,
    write dq/dk/dv into the (T, 3C) gradient block at their native offsets."""
    b = pl.program_id(0)
    t = q_ref.shape[1]
    c = q_ref.shape[2]
    d = c // num_heads
    length = lengths_ref[b]

    cos = cos_ref[0]
    sin = sin_ref[0]
    s_rot = rotation_matrix(d)
    dot_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    key_col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    neg_mask = jnp.where(key_col < length, 0.0, NEG_INF)

    def dot(a, bb, dims):
        return jax.lax.dot_general(a, bb, (dims, ((), ())), preferred_element_type=jnp.float32)

    def rope(x):
        xr = dot(x, s_rot, ((1,), (0,)))
        return x * cos + xr * sin

    def rope_vjp(gx):
        # S is antisymmetric: gx*sin @ S^T == -(gx*sin @ S)
        return gx * cos - dot(gx * sin, s_rot, ((1,), (0,)))

    # NOTE: a batched-over-heads form of this backward (mirroring the
    # forward's t<=256 branch) was built and crashes Mosaic layout inference
    # ("limits[i] <= dim(i)"): the backward needs dim1xdim1 (transpose-style)
    # batched contractions for dv/dk, which the toolchain rejects. Per-head
    # 2D dots are kept for all T.
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl].astype(jnp.float32)
        k = k_ref[0, :, sl].astype(jnp.float32)
        v = v_ref[0, :, sl].astype(dot_dtype)
        g = g_ref[0, :, sl].astype(dot_dtype)

        qr = (rope(q) * (scale * LOG2_E)).astype(dot_dtype)
        kr = rope(k).astype(dot_dtype)
        s = dot(qr, kr, ((1,), (1,))) + neg_mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dot_dtype)

        dv = dot(p, g, ((0,), (0,)))  # p^T g: (Tk, d)
        dp = dot(g, v, ((1,), (1,)))  # (Tq, Tk)
        pf = p.astype(jnp.float32)
        delta = jnp.sum(pf * dp, axis=-1, keepdims=True)
        ds = (pf * (dp - delta)).astype(dot_dtype)
        # ds is in the natural-log score domain; kr is unscaled, qr carries
        # scale*log2e — divide the fold back out of dk
        dq = rope_vjp(dot(ds, kr, ((1,), (0,))) * scale)
        dk = rope_vjp(dot(ds, qr, ((0,), (0,))) * (1.0 / LOG2_E))

        dqkv_ref[0, :, sl] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, c + h * d : c + (h + 1) * d] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * c + h * d : 2 * c + (h + 1) * d] = dv.astype(dqkv_ref.dtype)


def _qkv_backward(qkv3, g, cos, sin, lengths, scale, head_dim):
    b, t, _, c = qkv3.shape
    w = 3 * c
    qkv = qkv3.reshape(b, t, w)
    d = head_dim
    num_heads = c // d
    kernel = functools.partial(_qkv_bwd_kernel, scale=scale, num_heads=num_heads)
    spec_c = pl.BlockSpec((1, t, c), lambda i, lens: (i, 0, 0))
    spec_k = pl.BlockSpec((1, t, c), lambda i, lens: (i, 0, 1))
    spec_v = pl.BlockSpec((1, t, c), lambda i, lens: (i, 0, 2))
    spec_tab = pl.BlockSpec((1, t, d), lambda i, lens: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[spec_c, spec_k, spec_v, spec_c, spec_tab, spec_tab],
            out_specs=pl.BlockSpec((1, t, w), lambda i, lens: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, w), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=(96 << 20) if t >= 512 else None,
        ),
        interpret=jax.default_backend() != "tpu",
    )(lengths, qkv, qkv, qkv, g, cos, sin).reshape(b, t, 3, c)


def _qkv_chunked_bwd_kernel(
    lengths_ref,  # (B,) int32 scalar prefetch
    q_ref,  # (1, T, C) — full query rows (lane-block view of qkv)
    k_ref,  # (1, CK, C) — ONE key chunk (grid dim 1 walks the chunks)
    v_ref,  # (1, CK, C)
    g_ref,  # (1, T, C) — full upstream gradient rows
    o_ref,  # (1, T, C) — full forward OUTPUT rows (for delta = sum(g*o))
    lse_ref,  # (1, T, H) f32 — forward log2-sum-exp (exp2 domain)
    cos_q_ref,  # (1, T, d) f32
    sin_q_ref,
    cos_k_ref,  # (1, CK, d) f32 — k-chunk rows
    sin_k_ref,
    dq_ref,  # (1, T, C) — written on the last chunk from the accumulator
    dkv_ref,  # (1, CK, 2C) — [dk | dv] lanes, streamed out per chunk
    qr_s,  # scratch (T, C) model-dtype: roped+scaled q, built on chunk 0
    delta_s,  # scratch (T, H) f32: per-row per-head sum(g * o)
    dq_acc,  # scratch (T, C) f32: rotated-domain dq accumulator
    *,
    scale: float,
    num_heads: int,
    chunk: int,
    n_chunks: int,
):
    """K-chunked flash backward for t > 1024 (768^2-budget TRAINING — the
    r2 gap where the XLA fallback materialized (B, H, T, T) fp32 scores).

    Probabilities are recomputed per key chunk from the forward's saved
    log2-sum-exp: ``p = exp2(s - lse2)`` is the FINAL softmax weight, so no
    second online pass is needed. Per chunk, per head:

        dv_chunk = p^T g            -> streamed to the dkv output block
        dp       = g v^T
        ds       = p * (dp - delta),  delta_i = sum_d g_id o_id  (== p.dp)
        dq      += ds kr * scale      (accumulated across chunks in VMEM)
        dk_chunk = rope_vjp(ds^T qr / log2e)  -> streamed out

    dq leaves in the rotated domain and gets the RoPE VJP on the last
    chunk. Scale folding matches :func:`_qkv_bwd_kernel`: qr carries
    scale*log2e, kr is unscaled."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    c = q_ref.shape[2]
    d = c // num_heads
    length = lengths_ref[b]
    s_rot = rotation_matrix(d)
    dot_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    def dot(a, bb, dims):
        return jax.lax.dot_general(a, bb, (dims, ((), ())), preferred_element_type=jnp.float32)

    def rope_vjp(gx, cos, sin):
        # S is antisymmetric: gx*sin @ S^T == -(gx*sin @ S)
        return gx * cos - dot(gx * sin, s_rot, ((1,), (0,)))

    @pl.when(j == 0)
    def _():
        cos = cos_q_ref[0]
        sin = sin_q_ref[0]
        go = g_ref[0].astype(jnp.float32) * o_ref[0].astype(jnp.float32)
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            q = q_ref[0, :, sl].astype(jnp.float32)
            xr = dot(q, s_rot, ((1,), (0,)))
            qr = (q * cos + xr * sin) * (scale * LOG2_E)
            qr_s[:, sl] = qr.astype(qr_s.dtype)
            delta_s[:, h : h + 1] = jnp.sum(go[:, sl], axis=-1, keepdims=True)
        dq_acc[...] = jnp.zeros(dq_acc.shape, jnp.float32)

    ck = k_ref.shape[1]
    cos_c = cos_k_ref[0]
    sin_c = sin_k_ref[0]
    key_col = jax.lax.broadcasted_iota(jnp.int32, (1, ck), 1) + j * chunk
    neg = jnp.where(key_col < length, 0.0, NEG_INF)
    lse = lse_ref[0]  # (T, H) f32
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        kchunk = k_ref[0, :, sl].astype(jnp.float32)
        xr = dot(kchunk, s_rot, ((1,), (0,)))
        kr = (kchunk * cos_c + xr * sin_c).astype(dot_dtype)
        v_c = v_ref[0, :, sl].astype(dot_dtype)
        g_h = g_ref[0, :, sl].astype(dot_dtype)
        qr = qr_s[:, sl]
        s = dot(qr, kr, ((1,), (1,)))  # (T, CK) f32
        s = jnp.where(length >= (j + 1) * chunk, s, s + neg)
        p = jnp.exp2(s - lse[:, h : h + 1])  # final softmax weights
        pc = p.astype(dot_dtype)
        dv = dot(pc, g_h, ((0,), (0,)))  # p^T g: (CK, d)
        dp = dot(g_h, v_c, ((1,), (1,)))  # (T, CK)
        ds = (p * (dp - delta_s[:, h : h + 1])).astype(dot_dtype)
        dq_acc[:, sl] = dq_acc[:, sl] + dot(ds, kr, ((1,), (0,))) * scale
        dk = rope_vjp(dot(ds, qr, ((0,), (0,))) * (1.0 / LOG2_E), cos_c, sin_c)
        dkv_ref[0, :, sl] = dk.astype(dkv_ref.dtype)
        dkv_ref[0, :, c + h * d : c + (h + 1) * d] = dv.astype(dkv_ref.dtype)

    @pl.when(j == n_chunks - 1)
    def _():
        cos = cos_q_ref[0]
        sin = sin_q_ref[0]
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            dq_ref[0, :, sl] = rope_vjp(dq_acc[:, sl], cos, sin).astype(dq_ref.dtype)


def _qkv_backward_chunked(qkv3, g, out, lse, cos, sin, lengths, scale, head_dim):
    """dqkv for the chunked (t > 1024) path: single-pass kernel while the
    full-T query blocks fit VMEM (t <= 2304, measured faster — one score
    recompute), two-pass fully-chunked kernels beyond (t = 4096 and up,
    where the single pass fails Mosaic VMEM checks)."""
    t = qkv3.shape[1]
    if t > _single_pass_bwd_max_t():
        return _qkv_backward_chunked2(
            qkv3, g, out, lse, cos, sin, lengths, scale, head_dim
        )
    return _qkv_backward_chunked1(
        qkv3, g, out, lse, cos, sin, lengths, scale, head_dim
    )


def _single_pass_bwd_max_t() -> int:
    """Largest T routed to the single-pass chunked backward. 2304 holds
    five full-T blocks (~60 MB at XL) — the verified VMEM ceiling; the
    two-pass kernels take over above. Measured at the boundary (v5e,
    T=2304 B=2 XL, full fwd+bwd vjp): single-pass 4.64 ms vs two-pass
    6.14 ms — the extra score recompute costs ~32%, so the single pass
    stays preferred wherever it fits. $FIT_TPU_SINGLE_BWD_T lowers the
    gate to exercise the two-pass path at test sizes."""
    return int(os.environ.get("FIT_TPU_SINGLE_BWD_T", "2304"))


def _qkv_backward_chunked1(qkv3, g, out, lse, cos, sin, lengths, scale, head_dim):
    """Single-pass chunked dqkv. Streams dk/dv per key chunk;
    dq accumulates in VMEM scratch (queries stay un-chunked: full-T query
    scratch is what the forward already proved fits to T=2304)."""
    b, t, _, c = qkv3.shape
    qkv = qkv3.reshape(b, t, 3 * c)
    d = head_dim
    num_heads = c // d
    # smaller chunks than the forward (768 target): the backward holds ~3x
    # the full-T blocks (q, g, o, dq, accumulators), so trade pipeline
    # granularity for VMEM headroom
    ck = _pick_chunk(t, min(768, _chunk_threshold()))
    if ck is None:
        ck = _pick_chunk(t, min(1024, _chunk_threshold()))
    n_chunks = t // ck
    kernel = functools.partial(
        _qkv_chunked_bwd_kernel, scale=scale, num_heads=num_heads,
        chunk=ck, n_chunks=n_chunks,
    )
    full_c = pl.BlockSpec((1, t, c), lambda i, j, lens: (i, 0, 0))
    full_d = pl.BlockSpec((1, t, d), lambda i, j, lens: (i, 0, 0))
    dq, dkv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_chunks),
            in_specs=[
                full_c,  # q view
                pl.BlockSpec((1, ck, c), lambda i, j, lens: (i, j, 1)),  # k
                pl.BlockSpec((1, ck, c), lambda i, j, lens: (i, j, 2)),  # v
                full_c,  # g
                full_c,  # forward out
                pl.BlockSpec((1, t, num_heads), lambda i, j, lens: (i, 0, 0)),
                full_d,  # cos (q rows)
                full_d,  # sin
                pl.BlockSpec((1, ck, d), lambda i, j, lens: (i, j, 0)),  # cos (k rows)
                pl.BlockSpec((1, ck, d), lambda i, j, lens: (i, j, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, t, c), lambda i, j, lens: (i, 0, 0)),
                pl.BlockSpec((1, ck, 2 * c), lambda i, j, lens: (i, j, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((t, c), qkv.dtype),  # roped+scaled q
                pltpu.VMEM((t, num_heads), jnp.float32),  # delta
                pltpu.VMEM((t, c), jnp.float32),  # dq accumulator
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, t, 2 * c), qkv.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=(120 << 20),
        ),
        interpret=jax.default_backend() != "tpu",
    )(lengths, qkv, qkv, qkv, g, out, lse, cos, sin, cos, sin)
    return jnp.concatenate([dq, dkv], axis=-1).reshape(b, t, 3, c)


def _qkv_chunked_dq_kernel(
    lengths_ref,  # (B,) int32 scalar prefetch
    q_ref,  # (1, CQ, C) — ONE query chunk (lane-block view of qkv)
    k_ref,  # (1, CK, C) — ONE key chunk (grid dim 2 walks the chunks)
    v_ref,  # (1, CK, C)
    g_ref,  # (1, CQ, C) — upstream gradient rows of this q-chunk
    o_ref,  # (1, CQ, C) — forward output rows (for delta = sum(g*o))
    lse_ref,  # (1, CQ, H) f32 — forward log2-sum-exp (exp2 domain)
    cos_q_ref,  # (1, CQ, d) f32
    sin_q_ref,
    cos_k_ref,  # (1, CK, d) f32
    sin_k_ref,
    dq_ref,  # (1, CQ, C) — written on the last key chunk
    qr_s,  # scratch (CQ, C) model-dtype: roped+scaled q, built at kj == 0
    delta_s,  # scratch (CQ, H) f32: per-row per-head sum(g * o)
    dq_acc,  # scratch (CQ, C) f32: rotated-domain dq accumulator
    *,
    scale: float,
    num_heads: int,
    chunk: int,
    n_chunks: int,
):
    """dq pass of the TWO-PASS fully-chunked backward (t > 2304): no
    full-T block anywhere, so VMEM stays chunk-sized at any T (the
    single-pass :func:`_qkv_chunked_bwd_kernel` holds five full-T blocks
    and exceeds VMEM at T=4096). Grid (B, n_q, n_k), key chunks innermost;
    dq accumulates across key chunks in scratch exactly as the single-pass
    kernel does, using the same recompute math (p from the saved lse)."""
    b = pl.program_id(0)
    j = pl.program_id(2)
    c = q_ref.shape[2]
    d = c // num_heads
    length = lengths_ref[b]
    s_rot = rotation_matrix(d)
    dot_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    def dot(a, bb, dims):
        return jax.lax.dot_general(a, bb, (dims, ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        cos = cos_q_ref[0]
        sin = sin_q_ref[0]
        go = g_ref[0].astype(jnp.float32) * o_ref[0].astype(jnp.float32)
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            q = q_ref[0, :, sl].astype(jnp.float32)
            xr = dot(q, s_rot, ((1,), (0,)))
            qr = (q * cos + xr * sin) * (scale * LOG2_E)
            qr_s[:, sl] = qr.astype(qr_s.dtype)
            delta_s[:, h : h + 1] = jnp.sum(go[:, sl], axis=-1, keepdims=True)
        dq_acc[...] = jnp.zeros(dq_acc.shape, jnp.float32)

    ck = k_ref.shape[1]
    cos_c = cos_k_ref[0]
    sin_c = sin_k_ref[0]
    key_col = jax.lax.broadcasted_iota(jnp.int32, (1, ck), 1) + j * chunk
    neg = jnp.where(key_col < length, 0.0, NEG_INF)
    lse = lse_ref[0]  # (CQ, H) f32
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        kchunk = k_ref[0, :, sl].astype(jnp.float32)
        xr = dot(kchunk, s_rot, ((1,), (0,)))
        kr = (kchunk * cos_c + xr * sin_c).astype(dot_dtype)
        v_c = v_ref[0, :, sl].astype(dot_dtype)
        g_h = g_ref[0, :, sl].astype(dot_dtype)
        qr = qr_s[:, sl]
        s = dot(qr, kr, ((1,), (1,)))  # (CQ, CK) f32
        s = jnp.where(length >= (j + 1) * chunk, s, s + neg)
        p = jnp.exp2(s - lse[:, h : h + 1])
        dp = dot(g_h, v_c, ((1,), (1,)))  # (CQ, CK)
        ds = (p * (dp - delta_s[:, h : h + 1])).astype(dot_dtype)
        dq_acc[:, sl] = dq_acc[:, sl] + dot(ds, kr, ((1,), (0,))) * scale

    @pl.when(j == n_chunks - 1)
    def _():
        cos = cos_q_ref[0]
        sin = sin_q_ref[0]
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            gx = dq_acc[:, sl]
            dq_ref[0, :, sl] = (
                gx * cos - dot(gx * sin, s_rot, ((1,), (0,)))
            ).astype(dq_ref.dtype)


def _qkv_chunked_dkv_kernel(
    lengths_ref,  # (B,) int32 scalar prefetch
    q_ref,  # (1, CQ, C) — ONE query chunk (grid dim 2 walks the chunks)
    k_ref,  # (1, CK, C) — ONE key chunk (grid dim 1)
    v_ref,  # (1, CK, C)
    g_ref,  # (1, CQ, C)
    o_ref,  # (1, CQ, C)
    lse_ref,  # (1, CQ, H) f32
    cos_q_ref,  # (1, CQ, d) f32
    sin_q_ref,
    cos_k_ref,  # (1, CK, d) f32
    sin_k_ref,
    dkv_ref,  # (1, CK, 2C) — [dk | dv] lanes, written on the last q chunk
    kr_s,  # scratch (CK, C) model-dtype: roped (unscaled) k, built at qi == 0
    dk_acc,  # scratch (CK, C) f32: rotated-domain dk accumulator (pre 1/log2e)
    dv_acc,  # scratch (CK, C) f32
    *,
    scale: float,
    num_heads: int,
    chunk: int,
    n_q: int,
):
    """dk/dv pass of the two-pass chunked backward. Grid (B, n_k, n_q),
    QUERY chunks innermost: dk/dv accumulate across query chunks in
    chunk-sized scratch (reset at qi == 0, RoPE-VJP'd and flushed at
    qi == n_q - 1). q is re-roped per (kj, qi) visit — RoPE is VPU-cheap
    next to the three MXU dots per head. Scale/log2e folding matches the
    single-pass kernel: qr carries scale*log2e, kr is unscaled, dk gets
    1/log2e at flush (rope_vjp is linear, so deferring it is exact)."""
    b = pl.program_id(0)
    kj = pl.program_id(1)
    qi = pl.program_id(2)
    c = q_ref.shape[2]
    d = c // num_heads
    length = lengths_ref[b]
    s_rot = rotation_matrix(d)
    dot_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    def dot(a, bb, dims):
        return jax.lax.dot_general(a, bb, (dims, ((), ())), preferred_element_type=jnp.float32)

    @pl.when(qi == 0)
    def _():
        cos = cos_k_ref[0]
        sin = sin_k_ref[0]
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            kchunk = k_ref[0, :, sl].astype(jnp.float32)
            xr = dot(kchunk, s_rot, ((1,), (0,)))
            kr_s[:, sl] = (kchunk * cos + xr * sin).astype(kr_s.dtype)
        dk_acc[...] = jnp.zeros(dk_acc.shape, jnp.float32)
        dv_acc[...] = jnp.zeros(dv_acc.shape, jnp.float32)

    ck = k_ref.shape[1]
    cos_q = cos_q_ref[0]
    sin_q = sin_q_ref[0]
    key_col = jax.lax.broadcasted_iota(jnp.int32, (1, ck), 1) + kj * chunk
    neg = jnp.where(key_col < length, 0.0, NEG_INF)
    lse = lse_ref[0]  # (CQ, H) f32
    go = g_ref[0].astype(jnp.float32) * o_ref[0].astype(jnp.float32)
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl].astype(jnp.float32)
        xr = dot(q, s_rot, ((1,), (0,)))
        qr = ((q * cos_q + xr * sin_q) * (scale * LOG2_E)).astype(dot_dtype)
        kr = kr_s[:, sl].astype(dot_dtype)
        v_c = v_ref[0, :, sl].astype(dot_dtype)
        g_h = g_ref[0, :, sl].astype(dot_dtype)
        delta = jnp.sum(go[:, sl], axis=-1, keepdims=True)  # (CQ, 1)
        s = dot(qr, kr, ((1,), (1,)))  # (CQ, CK) f32
        s = jnp.where(length >= (kj + 1) * chunk, s, s + neg)
        p = jnp.exp2(s - lse[:, h : h + 1])
        pc = p.astype(dot_dtype)
        dv_acc[:, sl] = dv_acc[:, sl] + dot(pc, g_h, ((0,), (0,)))  # p^T g
        dp = dot(g_h, v_c, ((1,), (1,)))  # (CQ, CK)
        ds = (p * (dp - delta)).astype(dot_dtype)
        dk_acc[:, sl] = dk_acc[:, sl] + dot(ds, qr, ((0,), (0,)))  # ds^T qr

    @pl.when(qi == pl.num_programs(2) - 1)
    def _():
        cos = cos_k_ref[0]
        sin = sin_k_ref[0]
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            gx = dk_acc[:, sl] * (1.0 / LOG2_E)
            dkv_ref[0, :, sl] = (
                gx * cos - dot(gx * sin, s_rot, ((1,), (0,)))
            ).astype(dkv_ref.dtype)
            dkv_ref[0, :, c + h * d : c + (h + 1) * d] = dv_acc[:, sl].astype(
                dkv_ref.dtype
            )


def _qkv_backward_chunked2(qkv3, g, out, lse, cos, sin, lengths, scale, head_dim):
    """Two-pass fully-chunked dqkv for t beyond the single-pass kernel's
    VMEM ceiling (t > 2304; the single pass holds five full-T blocks and
    fails Mosaic VMEM checks at T=4096). Pass 1 streams dq per query chunk,
    pass 2 streams [dk|dv] per key chunk; both recompute p from the saved
    lse. Costs one extra score+dp matmul pair per (qi, kj, h) vs the single
    pass — the price of never materializing a full-T operand."""
    b, t, _, c = qkv3.shape
    qkv = qkv3.reshape(b, t, 3 * c)
    d = head_dim
    num_heads = c // d
    ck = _pick_chunk(t, min(1024, _chunk_threshold()))
    if ck is None:
        raise ValueError(
            f"T={t} has no key-chunk divisor; gate with fused_supported()"
        )
    cq = ck
    n_chunks = t // ck
    n_q = t // cq
    spec_q = pl.BlockSpec((1, cq, c), lambda i, qi, kj, lens: (i, qi, 0))
    spec_lse = pl.BlockSpec((1, cq, num_heads), lambda i, qi, kj, lens: (i, qi, 0))
    spec_dq = pl.BlockSpec((1, cq, d), lambda i, qi, kj, lens: (i, qi, 0))
    dq = pl.pallas_call(
        functools.partial(
            _qkv_chunked_dq_kernel, scale=scale, num_heads=num_heads,
            chunk=ck, n_chunks=n_chunks,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_q, n_chunks),
            in_specs=[
                spec_q,  # q chunk (qkv view)
                pl.BlockSpec((1, ck, c), lambda i, qi, kj, lens: (i, kj, 1)),
                pl.BlockSpec((1, ck, c), lambda i, qi, kj, lens: (i, kj, 2)),
                spec_q,  # g
                spec_q,  # forward out
                spec_lse,
                spec_dq,  # cos (q rows)
                spec_dq,  # sin
                pl.BlockSpec((1, ck, d), lambda i, qi, kj, lens: (i, kj, 0)),
                pl.BlockSpec((1, ck, d), lambda i, qi, kj, lens: (i, kj, 0)),
            ],
            out_specs=pl.BlockSpec((1, cq, c), lambda i, qi, kj, lens: (i, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((cq, c), qkv.dtype),  # roped+scaled q
                pltpu.VMEM((cq, num_heads), jnp.float32),  # delta
                pltpu.VMEM((cq, c), jnp.float32),  # dq accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            # q-chunk dim parallel: each q-chunk's key loop is self-contained
            # (scratch resets at kj == 0) — see _qkv_forward_chunked
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=(110 << 20),
        ),
        interpret=jax.default_backend() != "tpu",
    )(lengths, qkv, qkv, qkv, g, out, lse, cos, sin, cos, sin)

    spec_q2 = pl.BlockSpec((1, cq, c), lambda i, kj, qi, lens: (i, qi, 0))
    spec_lse2 = pl.BlockSpec((1, cq, num_heads), lambda i, kj, qi, lens: (i, qi, 0))
    spec_dq2 = pl.BlockSpec((1, cq, d), lambda i, kj, qi, lens: (i, qi, 0))
    dkv = pl.pallas_call(
        functools.partial(
            _qkv_chunked_dkv_kernel, scale=scale, num_heads=num_heads,
            chunk=ck, n_q=n_q,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_chunks, n_q),
            in_specs=[
                spec_q2,  # q chunk (qkv view)
                pl.BlockSpec((1, ck, c), lambda i, kj, qi, lens: (i, kj, 1)),
                pl.BlockSpec((1, ck, c), lambda i, kj, qi, lens: (i, kj, 2)),
                spec_q2,  # g
                spec_q2,  # forward out
                spec_lse2,
                spec_dq2,  # cos (q rows)
                spec_dq2,  # sin
                pl.BlockSpec((1, ck, d), lambda i, kj, qi, lens: (i, kj, 0)),
                pl.BlockSpec((1, ck, d), lambda i, kj, qi, lens: (i, kj, 0)),
            ],
            out_specs=pl.BlockSpec((1, ck, 2 * c), lambda i, kj, qi, lens: (i, kj, 0)),
            scratch_shapes=[
                pltpu.VMEM((ck, c), qkv.dtype),  # roped k
                pltpu.VMEM((ck, c), jnp.float32),  # dk accumulator
                pltpu.VMEM((ck, c), jnp.float32),  # dv accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, 2 * c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            # k-chunk dim parallel: each k-chunk's query loop is
            # self-contained (scratch resets at qi == 0)
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=(110 << 20),
        ),
        interpret=jax.default_backend() != "tpu",
    )(lengths, qkv, qkv, qkv, g, out, lse, cos, sin, cos, sin)
    return jnp.concatenate([dq, dkv], axis=-1).reshape(b, t, 3, c)


def _qkv_xla_bwd(qkv3, g, cos, sin, lengths, scale, head_dim):
    """XLA fallback backward for small T (tiny score tiles, where the einsum
    backward measured faster than the Pallas flash — see _use_pallas_bwd)."""
    b, t, _, c = qkv3.shape
    d = head_dim
    num_heads = c // d
    qkv5 = qkv3.reshape(b, t, 3, num_heads, d)
    q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]
    g4 = g.reshape(b, t, num_heads, d)

    def f(q, k, v):
        return _xla_reference(q, k, v, cos, sin, lengths, scale)[0]

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g4.astype(jnp.float32))
    return jnp.stack(
        [
            dq.reshape(b, t, c).astype(qkv3.dtype),
            dk.reshape(b, t, c).astype(qkv3.dtype),
            dv.reshape(b, t, c).astype(qkv3.dtype),
        ],
        axis=2,
    )


# GSPMD batch+head partitioning contracts for the natural-layout family
# (see _shard_batch_model): operand 0 is qkv3 (B, T, 3, C) whose last dim is
# the head-grouped lane axis — a 'model'-axis shard of it is a complete set
# of per-head [q|k|v] groups, so TP runs the kernel on local heads with no
# collectives. RoPE tables are (B, T, head_dim), shared across heads.
_qkv_forward_p = _shard_batch_model(
    _qkv_forward, (4, 5), "b t s c, b t d, b t d, b -> b t c",
    arg_model_dims=[3, None, None, None], res_model_dims=[2],
)
_qkv_forward_lse_p = _shard_batch_model(
    _qkv_forward_chunked, (4, 5, 6), "b t s c, b t d, b t d, b -> b t c, b t h",
    arg_model_dims=[3, None, None, None], res_model_dims=[2, 2],
)
_qkv_backward_p = _shard_batch_model(
    _qkv_backward, (5, 6), "b t s c, b t c, b t d, b t d, b -> b t s c",
    arg_model_dims=[3, 2, None, None, None], res_model_dims=[3],
)
_qkv_backward_chunked_p = _shard_batch_model(
    _qkv_backward_chunked, (7, 8),
    "b t s c, b t c, b t c, b t h, b t d, b t d, b -> b t s c",
    arg_model_dims=[3, 2, 2, 2, None, None, None], res_model_dims=[3],
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _qkv_rope_core(qkv3, cos, sin, lengths, scale, head_dim, partition):
    # `partition` is STATIC and decided at the call site (trace time of the
    # forward) so the backward rule — which may trace outside a
    # force_raw_kernel_calls() block, e.g. during shard_map transposition —
    # takes the same raw/partitioned route as its forward.
    fwd = _qkv_forward_p if partition else _qkv_forward
    return fwd(qkv3, cos, sin, lengths, scale, head_dim)


def qkv_rope_flash_attention(qkv, cos, sin, lengths, scale, num_heads):
    """Fused RoPE + masked attention over the RAW qkv projection output.

    qkv: (B, T, 3, C) — the qkv DenseGeneral output, untouched (each C block
    is head-major [h0 | h1 | ...] lanes of ``C/num_heads``, reference
    ``fit.py:234``) — or the flat (B, T, 3*C) [q|k|v] equivalent (same
    memory layout; reshaped free). cos/sin: (B, T, d) fp32 pair-duplicated
    tables (:func:`split_rope_tables`); lengths: (B,) int32 prefix lengths.
    Returns (B, T, C) in qkv's dtype, laid out for the out-projection.
    """
    if qkv.ndim == 3:
        b, t, w = qkv.shape
        qkv = qkv.reshape(b, t, 3, w // 3)
    head_dim = qkv.shape[-1] // num_heads
    return _qkv_rope_core(
        qkv, cos, sin, lengths, scale, head_dim, _use_partition_contract()
    )


def _chunked_bwd_supported(t: int) -> bool:
    """The chunked Pallas backward is verified on v5e to T=4096 (1024^2
    budget): single-pass kernel to T=2304 (bf16 err 4e-3 vs the fp32
    oracle, 8.4 ms vs 15.5 ms for the XLA fallback at b=2 XL), two-pass
    fully-chunked kernels beyond (the single pass holds five full-T blocks
    and fails Mosaic VMEM checks at T=4096 — r3). Interpret mode has no
    VMEM limits, so tests exercise both paths at any T."""
    return jax.default_backend() != "tpu" or t <= 4096


def _qkv_fwd(qkv3, cos, sin, lengths, scale, head_dim, partition):
    t = qkv3.shape[1]
    if t > _chunk_threshold() and not _chunked_bwd_supported(t):
        # T too large for the Pallas backward: plain forward, XLA-bwd route
        fwd = _qkv_forward_p if partition else _qkv_forward
        out = fwd(qkv3, cos, sin, lengths, scale, head_dim)
        return out, (qkv3, cos, sin, lengths)
    if t > _chunk_threshold():
        # chunked regime: save the forward output (free — it IS the primal
        # result) + the per-row log2-sum-exp so the backward recomputes
        # probabilities chunk-by-chunk with no second online pass
        fwd_lse = _qkv_forward_lse_p if partition else _qkv_forward_chunked
        out, lse = fwd_lse(qkv3, cos, sin, lengths, scale, head_dim, True)
        return out, (qkv3, cos, sin, lengths, out, lse)
    fwd = _qkv_forward_p if partition else _qkv_forward
    out = fwd(qkv3, cos, sin, lengths, scale, head_dim)
    return out, (qkv3, cos, sin, lengths)


def _qkv_bwd(scale, head_dim, partition, res, g):
    import os

    if len(res) == 6:  # chunked regime (t > threshold), lse saved
        qkv3, cos, sin, lengths, out, lse = res
        if os.environ.get("FIT_TPU_PALLAS_BWD", "auto") == "never":
            dqkv = _qkv_xla_bwd(qkv3, g, cos, sin, lengths, scale, head_dim)
        else:
            bwd_c = _qkv_backward_chunked_p if partition else _qkv_backward_chunked
            dqkv = bwd_c(qkv3, g, out, lse, cos, sin, lengths, scale, head_dim)
        return dqkv, None, None, None
    qkv3, cos, sin, lengths = res
    t = qkv3.shape[1]
    if _use_pallas_bwd(t):
        bwd = _qkv_backward_p if partition else _qkv_backward
        dqkv = bwd(qkv3, g, cos, sin, lengths, scale, head_dim)
    else:
        dqkv = _qkv_xla_bwd(qkv3, g, cos, sin, lengths, scale, head_dim)
    return dqkv, None, None, None


_qkv_rope_core.defvjp(_qkv_fwd, _qkv_bwd)
