"""Orbax checkpointing of the full training state.

TPU-native replacement for the reference's Lightning ``ModelCheckpoint``
(keep-all, per-epoch — ``/root/reference/FiT/train.py:272-277``) plus the
EMA-in-optimizer-state persistence (``FiT/ema.py:322-337``): one pytree
``{params, ema_params, opt_state, step}`` + a small JSON of host-side loader
state, written asynchronously so the device never waits on disk.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "restore_train_state"]


def restore_train_state(mgr: "CheckpointManager", init_params):
    """Restore a train state without knowing its optimizer-state layout.

    Checkpoints written with ``--optimizer-state-dtype bfloat16`` carry a
    different opt-state pytree (scale_by_adam_sr chain, bf16 moments + EMA)
    than the default fp32 AdamW. The Trainer stamps ``state_dtype`` into the
    host-state JSON, which selects the template directly; checkpoints from
    before the marker fall back to probing fp32 first, then SR. Returns
    ``(state, host_state)`` or ``(None, None)`` when no checkpoint exists.
    """
    import jax.numpy as jnp

    from fit_tpu.train.state import create_train_state, make_optimizer

    step = mgr.latest_step()
    if step is None:
        return None, None

    def _template(dtype_name: str):
        if dtype_name == "bfloat16":
            tx = make_optimizer(moment_dtype=jnp.bfloat16)
            return create_train_state(init_params, tx, ema_dtype=jnp.bfloat16)
        return create_train_state(init_params, make_optimizer())

    host_path = os.path.join(mgr.directory, f"host_{step}.json")
    if os.path.exists(host_path):
        with open(host_path) as f:
            marker = json.load(f).get("state_dtype")
        if marker is not None:
            return mgr.restore(template=_template(marker))

    try:
        return mgr.restore(template=_template("float32"))
    except Exception:
        return mgr.restore(template=_template("bfloat16"))


class CheckpointManager:
    """Save/restore the train state; keep-all by default like the reference."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,  # None = keep all (save_top_k=-1 parity)
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, host_state: Optional[dict] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if host_state is not None and jax.process_index() == 0:
            with open(os.path.join(self.directory, f"host_{step}.json"), "w") as f:
                json.dump(host_state, f)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        if template is not None:
            state = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:
            state = self._mgr.restore(step)
        host_path = os.path.join(self.directory, f"host_{step}.json")
        host_state = None
        if os.path.exists(host_path):
            with open(host_path) as f:
                host_state = json.load(f)
        return state, host_state

    def close(self):
        self._mgr.close()
