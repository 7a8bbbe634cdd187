"""Device mesh and sharding layer.

The reference's only distribution story is Lightning-DDP-over-NCCL
capability (unused in its configs — SURVEY.md §2.2); the TPU-native
replacement is a ``jax.sharding.Mesh`` over ICI with GSPMD sharding
annotations, giving:

* **DP**   — batch axis sharded over ``"data"``;
* **FSDP** — parameters additionally sharded over ``"data"`` (ZeRO-3 style;
  XLA inserts all-gathers around use and reduce-scatters for grads);
* **TP**   — attention-head / FFN-hidden dims sharded over ``"model"``
  (Megatron-style: qkv/fc1 column-parallel, proj/fc2 row-parallel, so each
  block needs one all-reduce per sublayer, riding ICI).

All of it is annotation-driven: the train/sample steps are ordinary jitted
functions; XLA inserts the collectives.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "param_partition_spec",
    "shard_params",
    "batch_sharding",
    "replicated",
]

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"
EXPERT_AXIS = "expert"


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    sp: int = 1,
    pp: int = 1,
    ep: int = 1,
) -> Mesh:
    """Build a (['pipe',] 'data'[, 'seq'][, 'expert'], 'model') mesh. ``dp``
    defaults to n_devices // (pp * sp * ep * tp). The 'seq' axis
    (sequence/context parallelism, ``parallel.sequence``), the 'pipe' axis
    (GPipe microbatch pipelining, ``parallel.pipeline``) and the 'expert'
    axis (MoE expert parallelism, ``models.moe``) are only materialized when
    their factor is > 1, so existing 2-axis specs and tests are untouched.

    On multi-host slices, ``jax.devices()`` is globally ordered so the model
    axis lands on adjacent devices (fastest ICI hops), the expert axis next
    (its dispatch all-to-alls move ~2·B·T·D/ep bytes per MoE block), the seq
    axis next, data-parallel replicas next, and pipeline stages outermost
    (one ppermute hop per tick — the cheapest pattern, fine across the
    slowest links).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (pp * tp * sp * ep) == 0, (
            f"{n} devices not divisible by pp*sp*ep*tp={pp * sp * ep * tp}"
        )
        dp = n // (pp * tp * sp * ep)
    assert dp * tp * sp * pp * ep == n, (
        f"pp({pp}) * dp({dp}) * sp({sp}) * ep({ep}) * tp({tp}) != devices({n})"
    )
    dims = [(PIPE_AXIS, pp)] if pp > 1 else []
    dims.append((DATA_AXIS, dp))
    if sp > 1:
        dims.append((SEQ_AXIS, sp))
    if ep > 1:
        dims.append((EXPERT_AXIS, ep))
    dims.append((MODEL_AXIS, tp))
    arr = np.array(devices).reshape([d for _, d in dims])
    return Mesh(arr, tuple(name for name, _ in dims))


# ---------------------------------------------------------------------------
# parameter partitioning rules for the FiT/DiT family
# ---------------------------------------------------------------------------

# (path regex, PartitionSpec) — first match wins. Paths are "/"-joined flax
# param paths, e.g. "params/blocks_3/attn/qkv/kernel".
_TP_RULES = [
    # column-parallel: split output features over the model axis.
    # qkv is stored head-grouped (D, 3, C): sharding the LAST dim keeps every
    # shard a complete per-head [q|k|v] group (Megatron head locality — a
    # flat (D, 3C) split would cross the q/k/v boundary, VERDICT r2 weak #2)
    (r".*attn/qkv/kernel$", P(None, None, MODEL_AXIS)),
    (r".*attn/qkv/bias$", P(None, MODEL_AXIS)),
    (r".*ffn/fc1_[gx]/kernel$", P(None, MODEL_AXIS)),
    (r".*ffn/fc1_[gx]/bias$", P(MODEL_AXIS)),
    (r".*ffn/fc1/kernel$", P(None, MODEL_AXIS)),
    (r".*ffn/fc1/bias$", P(MODEL_AXIS)),
    # row-parallel: split input features; output needs an all-reduce
    (r".*attn/proj/kernel$", P(MODEL_AXIS, None)),
    (r".*ffn/fc2/kernel$", P(MODEL_AXIS, None)),
    # int8 serving path (ops.quant): per-output-channel dequant scales
    # follow their column-parallel kernel's output sharding; row-parallel
    # (proj/fc2) scales stay replicated (their output dim is unsharded)
    (r".*attn/qkv/kernel_scale$", P(None, MODEL_AXIS)),
    (r".*ffn/fc1(_[gx])?/kernel_scale$", P(MODEL_AXIS)),
    # MoE expert stacks without expert parallelism (ffn="moe", ep=1): the
    # hidden dim is Megatron column/row-parallel exactly like the dense
    # SwiGLU — w1 (E, D, H) splits H (column), w2 (E, H, D) splits H (row);
    # the output all-reduce rides the combine einsum. Without these the
    # E-times parameter mass would silently replicate under tp (ADVICE r3).
    (r".*ffn/w1_[gx]$", P(None, None, MODEL_AXIS)),
    (r".*ffn/b1_[gx]$", P(None, MODEL_AXIS)),
    (r".*ffn/w2$", P(None, MODEL_AXIS, None)),
]

# MoE expert-parallel rules (models.moe.MoeSwiGLU): the stacked expert
# kernels (E, D, H)/(E, H, D) shard their leading EXPERT dim over the
# 'expert' mesh axis — each device holds E/ep whole experts, and the
# dispatch/combine einsums become all-to-alls over ICI (GShard pattern,
# arXiv:2006.16668). The hidden dim additionally TP-shards over 'model'
# (size-1 axis when tp is off, so the spec is always valid). The router
# stays replicated: every device must score every local token.
_EP_RULES = [
    (r".*ffn/w1_[gx]$", P(EXPERT_AXIS, None, MODEL_AXIS)),
    (r".*ffn/b1_[gx]$", P(EXPERT_AXIS, MODEL_AXIS)),
    (r".*ffn/w2$", P(EXPERT_AXIS, MODEL_AXIS, None)),
    (r".*ffn/b2$", P(EXPERT_AXIS, None)),
]

_FSDP_RULES = [
    # shard every large 2D kernel's input dim over the data axis (ZeRO-3);
    # embeddings shard over the vocab dim. The head-grouped qkv kernel
    # (D, 3, C) needs its own rule — the generic one would right-align
    # DATA onto the 3-dim, never divide, and silently replicate.
    (r".*attn/qkv/kernel$", P(DATA_AXIS, None, None)),
    (r".*y_embedder/table/embedding$", P(DATA_AXIS, None)),
    (r".*/kernel$", P(DATA_AXIS, None)),
    # MoE expert stacks (ffn="moe" without ep/tp): shard the MODEL-WIDTH dim
    # D over the data axis (dim 1 of w1 (E, D, H), dim 2 of w2 (E, H, D)) —
    # D is a multiple of every practical dp, whereas the SwiGLU hidden
    # (2/3-width) often isn't. Without these the generic '/kernel$' rule
    # never matches the w1_g/w1_x/w2 paths and the dominant E-times
    # parameter mass silently replicates — losing ZeRO-3 exactly in the
    # memory-bound MoE config (ADVICE r3 medium).
    (r".*ffn/w1_[gx]$", P(None, DATA_AXIS, None)),
    (r".*ffn/w2$", P(None, None, DATA_AXIS)),
]

# expert-stack paths whose spare (input) dim FSDP may additionally shard
# when an EP/TP rule already matched (the analogue of the '/kernel' combine)
_MOE_STACK_RE = re.compile(r".*ffn/(w1_[gx]|w2)$")


def _match(rules, path: str):
    for pat, spec in rules:
        if re.match(pat, path):
            return spec
    return None


def param_partition_spec(params, *, tp: bool = True, fsdp: bool = False, ep: bool = False):
    """PartitionSpec pytree for a FiT/DiT params pytree.

    With both tp and fsdp, TP rules take precedence and FSDP fills the spare
    dimension of TP-sharded kernels (2D sharding). ``ep`` adds the MoE
    expert-parallel rules (requires a mesh with an 'expert' axis).
    """

    def spec_for(path_tuple, leaf) -> P:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path_tuple)
        spec = _match(_EP_RULES, path) if ep else None
        if spec is None:
            spec = _match(_TP_RULES, path) if tp else None
        if spec is not None and fsdp and path.endswith("/kernel"):
            # combine: fsdp fills the spare (input) matrix dim of TP kernels
            if spec[0] is None and spec[-1] == MODEL_AXIS:
                spec = P(DATA_AXIS, *tuple(spec)[1:])
            elif spec == P(MODEL_AXIS, None):
                spec = P(MODEL_AXIS, DATA_AXIS)
        elif spec is not None and fsdp and _MOE_STACK_RE.match(path):
            # combine for MoE expert stacks: fill the first spare non-expert
            # dim with DATA — e.g. ep: (EXPERT, None, MODEL) -> (EXPERT,
            # DATA, MODEL); tp-only w2: (None, MODEL, None) -> (None,
            # MODEL, DATA)
            axes = list(spec)
            for i in range(1, len(axes)):
                if axes[i] is None:
                    axes[i] = DATA_AXIS
                    break
            spec = P(*axes)
        if spec is None and fsdp:
            spec = _match(_FSDP_RULES, path)
        if spec is None:
            spec = P()
        # right-align: stacked scan-over-layers params carry a leading depth
        # dim that stays unsharded (e.g. (depth, in, out) kernels)
        if any(a is not None for a in spec) and leaf.ndim > len(spec):
            spec = P(*([None] * (leaf.ndim - len(spec)) + list(spec)))
        if leaf.ndim < len([a for a in spec if a is not None]):
            return P()
        return spec

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _divisible(leaf_shape, spec: P, mesh: Mesh) -> bool:
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        if dim >= len(leaf_shape) or leaf_shape[dim] % mesh.shape[axis] != 0:
            return False
    return True


def shard_params(
    params, mesh: Mesh, *, tp: bool = True, fsdp: bool = False, ep: bool = False
):
    """Place a params pytree onto the mesh according to the rules, falling
    back to replication for any leaf whose shape doesn't divide."""
    specs = param_partition_spec(params, tp=tp, fsdp=fsdp, ep=ep)

    def place(x, spec):
        if not _divisible(x.shape, spec, mesh):
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs), jax.tree.map(
        lambda x, s: s if _divisible(x.shape, s, mesh) else P(), params, specs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading axis over data, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
