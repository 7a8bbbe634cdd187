"""Train state: fp32 params, AdamW, EMA as a pure pytree lerp.

Capability parity with the reference's optimizer/EMA machinery
(``/root/reference/FiT/train.py:215-217`` AdamW lr 1e-4 wd 0;
``FiT/ema.py`` decay 0.9999 post-step update). The reference needs a
350-line side-stream/offload-thread apparatus to hide the EMA update on GPU
(``ema.py:262-278``); on TPU the lerp is one fused elementwise program XLA
overlaps for free, so EMA here is three lines in the train step.

Memory-reduced state (``state_dtype="bfloat16"``): Adam moments and the EMA
shadow can be STORED in bf16 with **stochastic rounding** while all update
arithmetic stays fp32. Round-to-nearest bf16 is numerically broken for these
accumulators — the per-step increments ((1-b2)=1e-3 of nu, (1-decay)=1e-4 of
the EMA) fall below bf16's ~2^-8 relative resolution, so nearest-rounding
absorbs them and the accumulator stalls; SR keeps every update unbiased in
expectation (the Gopher/large-TPU-training recipe). This halves optimizer
HBM (measured: FiT-XL/2 fp32 state is 10.8 GB — over a single v5e chip's
15.75 GB budget once grads and activations join; bf16 moments+EMA bring the
step under it, unlocking single-chip XL training).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = [
    "TrainState",
    "create_train_state",
    "ema_update",
    "make_optimizer",
    "stochastic_round",
    "scale_by_adam_sr",
]


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # () int32 — optimizer steps taken
    params: Any  # fp32 master params
    opt_state: Any
    ema_params: Any  # EMA shadow (decay 0.9999), fp32 or bf16-SR (ema_dtype)


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.0,
    moment_dtype=None,
) -> optax.GradientTransformation:
    """Reference optimizer: AdamW(lr 1e-4, wd 0) — torch AdamW defaults
    otherwise (betas (0.9, 0.999), eps 1e-8). ``moment_dtype=jnp.bfloat16``
    stores mu/nu in bf16 via stochastic rounding (same update math, half the
    optimizer HBM — see module docstring)."""
    if moment_dtype is None or jnp.dtype(moment_dtype) == jnp.dtype(jnp.float32):
        return optax.adamw(
            learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
        )
    # same transform order as optax.adamw: moments -> weight decay -> -lr
    return optax.chain(
        scale_by_adam_sr(b1=0.9, b2=0.999, eps=1e-8, moment_dtype=moment_dtype),
        optax.add_decayed_weights(weight_decay),
        optax.scale(-learning_rate),
    )


def stochastic_round(x: jnp.ndarray, key: jax.Array, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Unbiased fp32 -> bf16 cast: add uniform random low-16 bits, truncate.

    For a value between two adjacent bf16 numbers at distance ulp, the
    result is the upper neighbor with probability (x - lower)/ulp — so
    ``E[stochastic_round(x)] == x`` exactly (for finite normal x). The bit
    trick works because IEEE-754 ordering is monotone in the raw bits within
    a sign: adding a uniform 16-bit value to the fp32 pattern and truncating
    the low 16 bits rounds the MAGNITUDE up with exactly that probability
    (mantissa carries propagate into the exponent correctly at binade
    boundaries). Inputs must be fp32; NaN/Inf are not handled (moments and
    EMA values are finite by construction — grad-norm clipping and the loss
    finiteness checks run upstream).
    """
    if dtype != jnp.bfloat16:
        raise ValueError(f"stochastic_round targets bfloat16, got {dtype}")
    assert x.dtype == jnp.float32, f"stochastic_round input must be fp32, got {x.dtype}"
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rnd = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    bits = (bits + rnd) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


def _tree_stochastic_round(tree, key: jax.Array, dtype=jnp.bfloat16):
    """Per-leaf-keyed SR cast of an fp32 pytree."""
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(
        treedef, [stochastic_round(l, k, dtype) for l, k in zip(leaves, keys)]
    )


class _AdamSRState(flax.struct.PyTreeNode):
    count: jnp.ndarray  # () int32
    mu: Any  # first moment, stored in moment_dtype
    nu: Any  # second moment, stored in moment_dtype
    key: jax.Array  # PRNG chain for the stochastic-rounding casts


def scale_by_adam_sr(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype=jnp.bfloat16,
    seed: int = 0x0ADA,
) -> optax.GradientTransformation:
    """Adam moment tracking with mu/nu STORED in ``moment_dtype`` via
    stochastic rounding; all arithmetic (moment update, bias correction,
    the returned update direction) is fp32. The update is computed from the
    exact fp32 moments of THIS step and the SR cast only affects what is
    carried to the next step — per-step quantization error is zero-mean and
    uncorrelated, so the moment estimates stay unbiased.
    """

    def init(params):
        # zeros_like inherits the param's sharding (FSDP moments shard with
        # their params, exactly as optax.adamw's init does)
        zeros = lambda p: jnp.zeros_like(p, dtype=moment_dtype)
        return _AdamSRState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
            key=jax.random.PRNGKey(seed),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        mu32 = jax.tree.map(
            lambda m, g: b1 * m.astype(jnp.float32) + (1.0 - b1) * g.astype(jnp.float32),
            state.mu, updates,
        )
        nu32 = jax.tree.map(
            lambda v, g: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu, updates,
        )
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        direction = jax.tree.map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu32, nu32
        )
        key, k_mu, k_nu = jax.random.split(state.key, 3)
        new_state = _AdamSRState(
            count=count,
            mu=_tree_stochastic_round(mu32, k_mu, moment_dtype),
            nu=_tree_stochastic_round(nu32, k_nu, moment_dtype),
            key=key,
        )
        return direction, new_state

    return optax.GradientTransformation(init, update)


def ema_update(ema_params, params, decay: float = 0.9999, key: Optional[jax.Array] = None):
    """``ema = decay * ema + (1 - decay) * params`` (reference ``ema.py:150-154``).

    When the EMA shadow is stored below fp32 (``state_dtype="bfloat16"``),
    pass ``key``: the fp32 lerp result is stochastically rounded back to the
    storage dtype (nearest-rounding would absorb the 1e-4-scale increments
    and freeze the shadow — see module docstring).
    """
    lerped = jax.tree.map(
        lambda e, p: decay * e.astype(jnp.float32) + (1.0 - decay) * p.astype(jnp.float32),
        ema_params, params,
    )
    dtypes = {l.dtype for l in jax.tree.leaves(ema_params)}
    if dtypes == {jnp.dtype(jnp.float32)}:
        return lerped
    if key is None:
        raise ValueError(
            f"ema_update: EMA stored in {dtypes} needs a PRNG key for "
            "stochastic rounding (nearest-rounding stalls the shadow)"
        )
    return _tree_stochastic_round(lerped, key)


def create_train_state(
    params,
    tx: Optional[optax.GradientTransformation] = None,
    ema_dtype=jnp.float32,
) -> TrainState:
    tx = tx if tx is not None else make_optimizer()
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        # NB: astype to the same dtype is a no-op that ALIASES the param
        # buffer — the donated train step would then see the same buffer
        # twice; copy explicitly on the fp32 path
        ema_params=jax.tree.map(
            lambda p: jnp.copy(p) if p.dtype == jnp.dtype(ema_dtype) else p.astype(ema_dtype),
            params,
        ),
    )
