"""Mesh / sharding layer (DP, FSDP, TP over jax.sharding)."""

from fit_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_partition_spec,
    replicated,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "param_partition_spec",
    "replicated",
    "shard_params",
]
