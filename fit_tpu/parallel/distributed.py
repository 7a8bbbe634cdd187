"""Multi-host runtime initialization.

The TPU-native replacement for the reference's implicit Lightning/NCCL
process-group setup (SURVEY.md §2.2): on a multi-host TPU slice,
``jax.distributed.initialize()`` discovers coordinator/peers from the TPU
environment; on a single host it is a no-op. Call once at program start
(the train CLI does).
"""

from __future__ import annotations

import os

import jax

__all__ = ["maybe_initialize"]

_initialized = False


def maybe_initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Initialize the distributed runtime when running on a multi-host slice.

    Returns ``jax.process_count()`` after (possible) initialization. Safe to
    call multiple times and on single-host/CPU setups. Passing explicit
    coordinator/process arguments forces initialization with them (used by
    manual launches and the multi-process CPU tests); otherwise pod
    environments are auto-detected.
    """
    global _initialized
    if _initialized:
        return jax.process_count()
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
        return jax.process_count()
    # Heuristics: pod environments either set an explicit coordinator or list
    # multiple worker hostnames; plain single-host setups do neither.
    hostnames = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    multihost = (
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or len(hostnames) > 1
    )
    if multihost:
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass  # already initialized or single-process fallback
    _initialized = True
    return jax.process_count()
