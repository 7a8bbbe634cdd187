"""Mixture-of-Experts SwiGLU FFN with expert parallelism (GShard pattern).

Beyond-reference capability (the reference FFN menu is dense swiglu/mlp,
``/root/reference/FiT/models/fit.py:117-140``): a Switch-Transformer-style
sparse FFN (arXiv:2101.03961) that scales FFN parameters without scaling
per-token FLOPs, built the TPU way (GShard, arXiv:2006.16668):

* **static shapes** — routing is top-1 with a fixed per-expert capacity
  ``C = ceil(T/E · capacity_factor)``; tokens past capacity fall through the
  residual (their FFN contribution is zero), so every shape is
  trace-constant and XLA tiles every op onto the MXU;
* **einsum dispatch** — tokens move to experts through one-hot
  dispatch/combine contractions (no scatter/gather, no dynamic shapes):
  ``xe = einsum('btd,btec->becd', x, dispatch)`` then the stacked-expert
  matmuls ``einsum('becd,edh->bech', xe, w1)``;
* **expert parallelism by annotation** — the stacked expert weights
  (E, D, H) shard their leading dim over an ``'expert'`` mesh axis
  (``parallel.mesh._EP_RULES``) and the (B, E, C, D) expert activations are
  pinned ``P('data', 'expert', None, None)``; GSPMD lowers the dispatch and
  combine einsums into the all-to-alls that ride ICI. The hidden dim
  composes with tensor parallelism over ``'model'``.

Padded tokens (``mask == False``) never route: their dispatch weight is
zero, so they consume no expert capacity and contribute nothing to the
load-balance statistics.

The Switch load-balance auxiliary loss ``E · Σ_e f_e · m_e`` (f = fraction
of tokens dispatched to e, m = mean router probability of e) is sown into
the ``"moe_aux"`` collection; ``train.step.diffusion_loss`` adds it with
weight ``moe_aux_weight`` when the collection is made mutable.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray
Dtype = Any

__all__ = ["MoeSwiGLU"]

# per-expert xavier-uniform over the trailing (in, out) dims of the stacked
# (E, in, out) weight — the leading expert dim is a batch axis for init fans
_expert_init = nn.initializers.variance_scaling(
    1.0, "fan_avg", "uniform", in_axis=-2, out_axis=-1, batch_axis=(0,)
)


class MoeSwiGLU(nn.Module):
    """Top-1 (Switch) mixture of SwiGLU experts, einsum-dispatched.

    Call with ``(x, mask)`` where x: (B, T, D) and mask: (B, T) bool token
    validity; returns (B, T, out_features) in ``dtype``. Total parameters
    ≈ num_experts × the dense SwiGLU; per-token compute ≈ 1× (top-1).
    """

    num_experts: int
    hidden_features: int
    out_features: int
    capacity_factor: float = 1.25
    # token->expert data movement strategy; the two are exactly equivalent —
    # bit-identical outputs and grads on CPU and at fp32-highest on the TPU
    # (test_moe.py::test_sort_dispatch_bit_identical; measured on the v5e).
    # At bf16 matmul precision on the TPU they agree to ~2 ulps: XLA tiles
    # the expert matmuls differently around the two dispatch forms, which
    # reorders the bf16 accumulation — routing is still identical.
    #   "einsum" — the GShard one-hot dispatch/combine contractions. The only
    #     mode with an expert-parallel lowering (GSPMD turns the einsums into
    #     all-to-alls), but it materializes (B, T, E, C) routing tensors and
    #     burns 2*2*T*(E*C)*D MACs per block moving tokens.
    #   "sort"   — group tokens by expert with one stable argsort along T and
    #     move rows with take_along_axis gathers: no (B, T, E, C) tensor, no
    #     T-contraction einsums (the combine einsum sums E*C terms of which
    #     exactly ONE is nonzero per token — a gather computes the same value
    #     bit-for-bit). Single-device / dp / fsdp / tp only: the gathers index
    #     the local token axis, so there is no 'expert'-axis lowering.
    #   "auto"   — sort when ep_mesh is None, einsum under expert parallelism.
    dispatch: str = "auto"
    # multiplicative router-input jitter (Switch Transformer §2.2, ~1e-2):
    # scales the router's input by U[1-j, 1+j] so the argmax is not a fixed
    # deterministic function early in training — anti-collapse pressure on
    # top of the aux loss. Applied only when a "moe_jitter" rng is provided
    # (the train step supplies one; sampling/eval never does).
    router_jitter: float = 0.0
    dtype: Dtype = jnp.float32
    # jax.sharding.Mesh with an 'expert' axis: pins the expert activations so
    # GSPMD lowers dispatch/combine into all-to-alls instead of choosing a
    # replicated layout. None = single-mesh/no-EP (annotations skipped).
    ep_mesh: Any = None

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        b, t, d = x.shape
        e = self.num_experts
        cap = max(1, math.ceil(t / e * self.capacity_factor))

        # --- routing (fp32: softmax/argmax stability and a bit-stable
        # aux loss regardless of compute dtype) ---
        router_in = x.astype(jnp.float32)
        if self.router_jitter > 0.0 and self.has_rng("moe_jitter"):
            j = self.router_jitter
            router_in = router_in * jax.random.uniform(
                self.make_rng("moe_jitter"), router_in.shape, jnp.float32,
                1.0 - j, 1.0 + j,
            )
        # bias on (zeros init, so bit-identical at init to a bias-free
        # router): an input-independent per-expert preference is the routing
        # degree of freedom that actually collapses in the wild — the LN'd
        # input is zero-mean per token, so kernel columns alone cannot
        # express "always expert e"; with the bias the failure mode is
        # representable and the aux loss demonstrably repairs it
        # (test_moe.py::test_aux_loss_rebalances_collapsed_router)
        logits = nn.Dense(
            e,
            use_bias=True,
            dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(),
            name="router",
        )(router_in)  # (B, T, E)
        gates = jax.nn.softmax(logits, axis=-1)
        valid = (
            mask.astype(jnp.float32)
            if mask is not None
            else jnp.ones((b, t), jnp.float32)
        )
        expert_idx = jnp.argmax(gates, axis=-1)  # (B, T)
        onehot = jax.nn.one_hot(expert_idx, e, dtype=jnp.float32)
        onehot = onehot * valid[..., None]  # padded tokens route nowhere

        # Switch aux loss over VALID tokens: E * sum_e f_e * m_e == 1 at a
        # perfectly uniform router. Computed before the capacity cut (the
        # standard formulation — overflow still counts as demand).
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        frac = jnp.sum(onehot, axis=(0, 1)) / n_valid  # (E,)
        mean_prob = jnp.sum(gates * valid[..., None], axis=(0, 1)) / n_valid
        if not self.is_initializing():
            # skipped at init so model.init never returns a stale "moe_aux"
            # collection (it would leak into the train state / checkpoints)
            self.sow("moe_aux", "load_balance", e * jnp.sum(frac * mean_prob))

        cd = self.dtype
        mode = self.dispatch
        if mode == "auto":
            mode = "einsum" if self.ep_mesh is not None else "sort"
        if mode == "sort" and self.ep_mesh is not None:
            raise ValueError(
                "dispatch='sort' gathers along the LOCAL token axis and has "
                "no expert-parallel lowering; use 'einsum' (or 'auto') with ep"
            )

        # --- stacked expert weights; leading E shards over 'expert' ---
        h = self.hidden_features
        w1_g = self.param("w1_g", _expert_init, (e, d, h))
        w1_x = self.param("w1_x", _expert_init, (e, d, h))
        b1_g = self.param("b1_g", nn.initializers.zeros, (e, h))
        b1_x = self.param("b1_x", nn.initializers.zeros, (e, h))
        w2 = self.param("w2", _expert_init, (e, h, self.out_features))
        b2 = self.param("b2", nn.initializers.zeros, (e, self.out_features))

        def experts(xe: Array) -> Array:
            """(B, E, C, D) capacity slots -> (B, E, C, out): the stacked
            SwiGLU expert matmuls, shared by both dispatch modes."""
            g = jnp.einsum("becd,edh->bech", xe, w1_g.astype(cd)) + b1_g.astype(cd)[None, :, None]
            v = jnp.einsum("becd,edh->bech", xe, w1_x.astype(cd)) + b1_x.astype(cd)[None, :, None]
            hid = nn.silu(g) * v
            return jnp.einsum("bech,ehd->becd", hid, w2.astype(cd)) + b2.astype(cd)[None, :, None]

        if mode == "einsum":
            # --- capacity assignment: slot index within the chosen expert is
            # a cumsum down the token axis; tokens past `cap` drop (residual
            # carries them — Switch overflow semantics) ---
            pos = (jnp.cumsum(onehot, axis=1) - 1.0) * onehot  # (B, T, E)
            keep = onehot * (pos < cap)
            # dispatch holds exactly {0, 1}: building it straight in the
            # compute dtype is lossless and halves the HBM footprint of the
            # largest routing tensor
            dispatch = keep.astype(cd)[..., None] * jax.nn.one_hot(
                pos.astype(jnp.int32), cap, dtype=cd
            )  # (B, T, E, C)
            gate = jnp.sum(gates * keep, axis=-1)  # (B, T), 0 if dropped
            # the classical GShard combine tensor is dispatch * gate[:, :,
            # None, None] — but gate depends only on (b, t), so the combine
            # einsum can reuse `dispatch` and scale its OUTPUT by gate
            # instead: one fewer (B, T, E, C) materialization + HBM round
            # trip per block
            xe = jnp.einsum(
                "btd,btec->becd", x.astype(cd), dispatch
            )  # (B, E, C, D)
            xe = self._pin(xe)
            ye = self._pin(experts(xe))
            # combine: empty slots have zero dispatch weight, so the
            # (bias-fed) garbage an unused expert slot computes never reaches
            # a token; dropped/padded tokens have gate == 0
            out = jnp.einsum("becd,btec->btd", ye, dispatch)
            return out * gate[..., None].astype(cd)

        # --- sort dispatch: group tokens by expert, move rows by gather ----
        # padded tokens route to a sentinel group `e` that sorts AFTER every
        # real expert, so they can never occupy a capacity slot
        valid_b = valid.astype(bool)
        e_sent = jnp.where(valid_b, expert_idx, e)  # (B, T)
        # stable: tokens keep their order inside each expert group, so slot
        # assignment == the einsum path's cumsum priority exactly
        perm = jnp.argsort(e_sent, axis=1, stable=True)  # (B, T) token ids
        sorted_e = jnp.take_along_axis(e_sent, perm, axis=1)
        counts = jnp.sum(onehot, axis=1).astype(jnp.int32)  # (B, E)
        starts = jnp.cumsum(counts, axis=1) - counts  # exclusive prefix
        c_idx = jnp.arange(cap, dtype=jnp.int32)
        src = starts[:, :, None] + c_idx[None, None, :]  # (B, E, C)
        slot_valid = c_idx[None, None, :] < jnp.minimum(counts, cap)[:, :, None]
        tok = jnp.take_along_axis(
            perm, jnp.minimum(src, t - 1).reshape(b, e * cap), axis=1
        )  # (B, E*C): which token fills each capacity slot
        xe = jnp.take_along_axis(x.astype(cd), tok[:, :, None], axis=1)
        xe = jnp.where(slot_valid.reshape(b, e * cap, 1), xe, 0)
        ye = experts(xe.reshape(b, e, cap, d)).reshape(b, e * cap, -1)
        # per-token slot: rank within its expert group in token order
        rank_sorted = jnp.arange(t, dtype=jnp.int32)[None, :] - jnp.take_along_axis(
            starts, jnp.minimum(sorted_e, e - 1), axis=1
        )
        inv = jnp.argsort(perm, axis=1)  # invert the permutation
        rank = jnp.take_along_axis(rank_sorted, inv, axis=1)  # (B, T)
        kept = valid_b & (rank < cap)
        gate = jnp.take_along_axis(gates, expert_idx[:, :, None], axis=2)[:, :, 0]
        gate = gate * kept  # 0 for dropped/padded, matching the einsum path
        slot = expert_idx * cap + jnp.minimum(rank, cap - 1)  # (B, T)
        # dropped tokens read a garbage slot through the clamp — and multiply
        # it by gate == 0, same as the einsum combine's zero dispatch weight
        out = jnp.take_along_axis(ye, slot[:, :, None], axis=1)  # (B, T, out)
        return out * gate[..., None].astype(cd)

    def _pin(self, a: Array) -> Array:
        """Constrain (B, E, C, ...) expert activations to
        P('data', 'expert', ...): forces the dispatch einsum to lower as the
        token->expert all-to-all instead of whatever layout GSPMD guesses."""
        if self.ep_mesh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fit_tpu.parallel.mesh import DATA_AXIS, EXPERT_AXIS

        shape = dict(self.ep_mesh.shape)
        spec = P(
            DATA_AXIS if a.shape[0] % shape.get(DATA_AXIS, 1) == 0 else None,
            EXPERT_AXIS if a.shape[1] % shape.get(EXPERT_AXIS, 1) == 0 else None,
        )
        return jax.lax.with_sharding_constraint(a, NamedSharding(self.ep_mesh, spec))
