"""The jitted training step: noising, masked-MSE loss, grad accumulation,
AdamW update, EMA — one device program.

Loss semantics parity with the reference training step
(``/root/reference/FiT/train.py:45-69``): per step draw uniform timesteps,
Gaussian noise, form ``x_t`` with the shared linear alpha-bar table (the
diffusers ``DDIMScheduler.add_noise`` and the in-repo schedule agree — see
``fit_tpu.core.schedules``), run the denoiser on padded tokens, and take one
global mean of squared error over valid tokens only
(``F.mse_loss(out[mask], noise[mask])``).

Gradient accumulation (reference ``accumulate_grad_batches=2``,
``train.py:288``) is a ``lax.scan`` over a leading microbatch axis — grads
are averaged across microbatches, then a single optimizer + EMA update runs,
exactly the Lightning semantics without retraced Python.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from fit_tpu.diffusion.gaussian import GaussianDiffusion, masked_global_mse
from fit_tpu.train.state import TrainState, ema_update

Array = jnp.ndarray

__all__ = ["diffusion_loss", "make_train_step", "make_eval_step"]


def _masked_per_sample_mse(out: Array, target: Array, mask: Array) -> Array:
    """(B,) per-sample mean squared error over each sample's valid tokens."""
    m = mask[..., None].astype(jnp.float32)
    se = jnp.sum(jnp.square(out - target) * m, axis=(1, 2))
    denom = jnp.sum(mask.astype(jnp.float32), axis=1) * out.shape[-1]
    return se / jnp.maximum(denom, 1.0)


def diffusion_loss(
    model_apply: Callable,
    params,
    diffusion: GaussianDiffusion,
    batch: dict,
    rng: jax.Array,
    moe_aux_weight: float = 0.0,
):
    """Masked eps-prediction MSE for one microbatch. Returns
    ``(loss, (t, per_sample_loss, moe_aux))`` — t/per-sample feed the
    host-side loss-second-moment timestep resampler's history; ``moe_aux``
    is the raw Switch load-balance loss (0 when ffn != "moe") so router
    health is visible in logs separately from the combined loss.

    ``batch``: tokens (B,T,D), pos (B,T,P), mask (B,T), label (B,); plus,
    when a non-uniform timestep sampler is active, ``t`` (B,) int32 and
    ``t_weight`` (B,) f32 importance weights drawn host-side (reference
    ``timestep_sampler.py:30-47``). With weights the loss is the weighted
    mean of per-sample masked MSEs (ADM importance-sampling semantics);
    the uniform path keeps the reference's single global masked mean
    (``F.mse_loss(out[mask], noise[mask])``).
    """
    tokens = batch["tokens"]
    b = tokens.shape[0]
    rng_t, rng_noise, rng_drop, rng_jit = jax.random.split(rng, 4)
    if "t" in batch:
        t = batch["t"]
    else:
        t = jax.random.randint(rng_t, (b,), 0, diffusion.original_num_steps)
    noise = jax.random.normal(rng_noise, tokens.shape, jnp.float32)
    x_t = diffusion.q_sample(tokens.astype(jnp.float32), t, noise)

    apply_kwargs = dict(train=True, rngs={"label_dropout": rng_drop})
    if moe_aux_weight:
        # ffn="moe": blocks sow their Switch load-balance loss into the
        # "moe_aux" collection (models.moe); making it mutable collects it.
        # The router-jitter stream is supplied unconditionally (unused rngs
        # are free); the module only draws it when router_jitter > 0.
        apply_kwargs["mutable"] = ["moe_aux"]
        apply_kwargs["rngs"]["moe_jitter"] = rng_jit
    out = model_apply(
        params,
        x_t,
        t,
        batch["label"],
        batch["pos"],
        batch["mask"],
        **apply_kwargs,
    )
    aux = jnp.float32(0.0)
    if moe_aux_weight:
        out, moe_vars = out
        leaves = jax.tree.leaves(moe_vars)
        n = sum(l.size for l in leaves)
        aux = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) / max(n, 1)
    outf = out.astype(jnp.float32)
    per_sample = _masked_per_sample_mse(outf, noise, batch["mask"])
    if "t_weight" in batch:
        loss = jnp.mean(batch["t_weight"] * per_sample)
    else:
        loss = masked_global_mse(outf, noise, batch["mask"])
    return loss + moe_aux_weight * aux, (t, per_sample, aux)


def make_train_step(
    model_apply: Callable,
    diffusion: GaussianDiffusion,
    tx,
    *,
    ema_decay: float = 0.9999,
    grad_accum: int = 1,
    donate: bool = True,
    moe_aux_weight: float = 0.0,
):
    """Build the jitted train step.

    The returned function takes ``(state, batch, rng)`` where every batch
    array has a leading ``(grad_accum, micro_batch, ...)`` shape when
    ``grad_accum > 1`` (use :func:`split_for_accumulation`), and returns
    ``(state, metrics)``.
    """

    def loss_fn(params, micro, rng):
        return diffusion_loss(
            model_apply, params, diffusion, micro, rng,
            moe_aux_weight=moe_aux_weight,
        )

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, batch: dict, rng: jax.Array):
        if grad_accum == 1:
            (loss, (ts, t_losses, moe_aux)), grads = grad_fn(state.params, batch, rng)
        else:
            def micro_step(carry, xs):
                micro, key = xs
                (loss_i, aux_i), g_i = grad_fn(state.params, micro, key)
                return jax.tree.map(jnp.add, carry, g_i), (loss_i, aux_i)

            zero = jax.tree.map(jnp.zeros_like, state.params)
            keys = jax.random.split(rng, grad_accum)
            gsum, (losses, (ts, t_losses, moe_auxes)) = jax.lax.scan(
                micro_step, zero, (batch, keys)
            )
            grads = jax.tree.map(lambda g: g / grad_accum, gsum)
            loss = jnp.mean(losses)
            moe_aux = jnp.mean(moe_auxes)
            ts, t_losses = ts.reshape(-1), t_losses.reshape(-1)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        # fold_in derives an independent stream for the EMA's stochastic-
        # rounding cast (used only when the shadow is stored in bf16) without
        # changing how `rng` is consumed by the loss path — golden streams
        # and resume-exactness are unaffected on the fp32 path
        new_ema = ema_update(
            state.ema_params, new_params, ema_decay,
            key=jax.random.fold_in(rng, 0x0E3A),
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax_global_norm(grads),
            "step": state.step + 1,
            # (B,) drawn timesteps + per-sample losses: the host-side
            # loss-second-moment resampler's update stream
            "t": ts,
            "t_loss": t_losses,
        }
        if moe_aux_weight:
            # raw (unweighted) Switch aux loss: a rising value means the
            # router is collapsing onto few experts (ADVICE r3) — logged so
            # loss curves stay comparable across aux-weight settings
            metrics["moe_aux"] = moe_aux
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt,
                ema_params=new_ema,
            ),
            metrics,
        )

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def optax_global_norm(tree) -> Array:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree.leaves(tree))
    )


def make_eval_step(model_apply: Callable, diffusion: GaussianDiffusion):
    """Validation loss (reference ``train.py:71-95``: same computation as the
    training step, deterministic rng handled by the caller)."""

    @jax.jit
    def step(params, batch: dict, rng: jax.Array):
        return diffusion_loss(model_apply, params, diffusion, batch, rng)[0]

    return step


def split_for_accumulation(batch: dict, grad_accum: int) -> dict:
    """Reshape (B, ...) arrays to (grad_accum, B // grad_accum, ...)."""
    def r(x):
        b = x.shape[0]
        assert b % grad_accum == 0, f"batch {b} not divisible by accum {grad_accum}"
        return x.reshape((grad_accum, b // grad_accum) + x.shape[1:])

    return {k: r(v) for k, v in batch.items()}
