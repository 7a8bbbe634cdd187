"""Mesh / sharding layer (DP, FSDP, TP, SP, PP, EP over jax.sharding)."""

from fit_tpu.parallel.mesh import (
    DATA_AXIS,
    EXPERT_AXIS,
    MODEL_AXIS,
    PIPE_AXIS,
    SEQ_AXIS,
    batch_sharding,
    make_mesh,
    param_partition_spec,
    replicated,
    shard_params,
)
from fit_tpu.parallel.pipeline import make_pipelined_apply, pipelined_apply
from fit_tpu.parallel.sequence import token_spec, ulysses_attention

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "PIPE_AXIS",
    "SEQ_AXIS",
    "make_pipelined_apply",
    "pipelined_apply",
    "batch_sharding",
    "make_mesh",
    "param_partition_spec",
    "replicated",
    "shard_params",
    "token_spec",
    "ulysses_attention",
]
