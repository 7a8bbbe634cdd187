"""Train state: fp32 params, AdamW, EMA as a pure pytree lerp.

Capability parity with the reference's optimizer/EMA machinery
(``/root/reference/FiT/train.py:215-217`` AdamW lr 1e-4 wd 0;
``FiT/ema.py`` decay 0.9999 post-step update). The reference needs a
350-line side-stream/offload-thread apparatus to hide the EMA update on GPU
(``ema.py:262-278``); on TPU the lerp is one fused elementwise program XLA
overlaps for free, so EMA here is three lines in the train step.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "create_train_state", "ema_update", "make_optimizer"]


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # () int32 — optimizer steps taken
    params: Any  # fp32 master params
    opt_state: Any
    ema_params: Any  # fp32 EMA shadow (decay 0.9999)


def make_optimizer(
    learning_rate: float = 1e-4, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    """Reference optimizer: AdamW(lr 1e-4, wd 0) — torch AdamW defaults
    otherwise (betas (0.9, 0.999), eps 1e-8)."""
    return optax.adamw(
        learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def ema_update(ema_params, params, decay: float = 0.9999):
    """``ema = decay * ema + (1 - decay) * params`` (reference ``ema.py:150-154``)."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)


def create_train_state(
    params, tx: Optional[optax.GradientTransformation] = None
) -> TrainState:
    tx = tx if tx is not None else make_optimizer()
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
    )
