"""FiT: Flexible Vision Transformer for diffusion (arXiv:2402.12376), flax.

Capability-equivalent rebuild of the reference denoiser
(``/root/reference/FiT/models/fit.py:340-553``): a DiT-style latent-diffusion
transformer over *packed variable-length token sequences* — variable-aspect
latents are patchified to (T, p*p*C) tokens, zero-padded to a fixed budget,
and attended with a validity mask and per-token 2D RoPE tables.

TPU-first design decisions (vs. the torch reference):

* stateless flax module over a params pytree; one ``jit``-traced function for
  the whole forward — XLA fuses adaLN/modulate/residual chains into the
  matmuls; the attention inner loop can run as a Pallas flash kernel that
  skips padded key blocks (``fit_tpu.ops.attention``).
* static shapes everywhere: the token budget ``T`` is fixed per compiled
  function (bucketed shapes compile once each); geometry (h, w) enters only
  through the host-built pos tables and masks.
* label-dropout randomness is an explicit ``label_dropout`` PRNG collection
  instead of ambient RNG.
* compute dtype is a module attribute (bf16 for training parity with
  Lightning's ``bf16-mixed``; fp32 for bit-parity tests); params stay fp32.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fit_tpu.core.geometry import patchify, unpatchify
from fit_tpu.models.layers import (
    FinalLayer,
    FiTBlock,
    LabelEmbedder,
    TimestepEmbedder,
    default_kernel_init,
)

Array = jnp.ndarray

# Largest T routed to the fused natural-layout kernel family; larger T
# falls back to the blocked ops.attention kernel. Inference/sampling: 4096
# (1024x1024 — K+Q-chunked grid verified on v5e r3: 5.1 ms/row at XL with
# the parallel q-chunk grid, err 2e-4, both mask branches). Training: also
# 4096 since the r3 TWO-PASS chunked backward (no full-T VMEM block) —
# verified grads on v5e at T=4096, err 7.8e-3 vs the fp32 oracle; the
# single-pass kernel still serves 1024 < T <= 2304.
_FUSED_MAX_T_EVAL = 4096
_FUSED_MAX_T_TRAIN = 4096

__all__ = [
    "FiT",
    "FiT_models",
    "create_fit",
    "stack_block_params",
    "unstack_block_params",
]


class _ScanBlockBody(nn.Module):
    """scan-compatible wrapper: FiTBlock as (carry, ()) -> (carry, None)."""

    block_cls: Any
    block_kwargs: dict

    @nn.compact
    def __call__(self, x, c, mask, freqs_cis):
        x = self.block_cls(**self.block_kwargs, name="block")(x, c, mask, freqs_cis)
        return x, None


def stack_block_params(params, depth: int):
    """Convert an unrolled param tree (blocks_0..blocks_{d-1}) to the
    scan-over-layers layout (stacked under "blocks"/"block")."""
    import jax as _jax

    p = dict(params["params"])
    blocks = [p.pop(f"blocks_{i}") for i in range(depth)]
    p["blocks"] = {"block": _jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)}
    return {**params, "params": p}


def unstack_block_params(params, depth: int):
    """Inverse of :func:`stack_block_params`."""
    import jax as _jax

    p = dict(params["params"])
    stacked = p.pop("blocks")["block"]
    for i in range(depth):
        p[f"blocks_{i}"] = _jax.tree.map(lambda x, i=i: x[i], stacked)
    return {**params, "params": p}


class FiT(nn.Module):
    """The FiT denoiser.

    Call signature (parity with reference ``fit.py:474-518``):

    ``__call__(x, t, y, pos, mask, train)`` where
      * ``x``: tokens ``(N, T, p*p*C)`` when ``train=True`` (the data
        pipeline patchifies host-side), or a latent canvas ``(N, C, H, W)``
        when ``train=False`` (patchified/unpatchified inside — the sampling
        path).
      * ``t``: ``(N,)`` diffusion timesteps, ``y``: ``(N,)`` class labels.
      * ``pos``: ``(N, T, head_dim)`` RoPE tables (``pos_kind="rotate"``) or
        ``(N, T, hidden)`` additive sincos tables (``pos_kind="absolute"``).
      * ``mask``: ``(N, T)`` boolean token-validity mask.
    """

    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = False
    ffn: str = "swiglu"
    pos_kind: str = "rotate"  # "rotate" | "absolute"
    attn_backend: str = "auto"
    # "none" | "int8": w8a8 dynamic int8 on the per-block projections (the
    # SAMPLING-only serving path; 2x MXU rate on v5e — see ops.quant).
    # Params come from ops.quant.quantize_params, never from init/training.
    quant: str = "none"
    # Calibration mode for int8 equalization (ops.equalize): blocks sow the
    # per-channel absmax of every int8 feed into a mutable "calib" collection.
    calib: bool = False
    dtype: Any = jnp.float32
    # Rematerialization (trade FLOPs for HBM). False | True | "dots":
    #   True  — full-block remat: save only block boundaries, replay the
    #           whole forward in the backward (~+1 fwd of hardware work).
    #   "dots" — selective: save matmul outputs, replay only elementwise
    #           (jax.checkpoint_policies.dots_with_no_batch_dims_saveable).
    # Measured (FiT-B/2, T=2304, batch 32, v5e, r3): full remat WINS —
    # 862/856 ms/step at accum 2/4 vs 870/873 ms "dots" vs 899 ms no-remat
    # (accum 4; accum 2 OOMs). Saving residuals costs more HBM traffic than
    # the replay costs MXU time on this bandwidth-bound chip, so True is the
    # right training default at every measured T.
    remat: Any = False
    # scan-over-layers: one compiled block body + stacked (depth, ...) params
    # instead of `depth` unrolled copies. Same math; ~depth x smaller HLO and
    # compile time (minutes -> seconds for XL/2 on remote-compile backends).
    # Param layout differs (blocks are stacked under "blocks"); convert with
    # `stack_block_params` / `unstack_block_params`.
    scan_blocks: bool = False
    # Sequence (context) parallelism: a jax.sharding.Mesh whose `seq_axis`
    # axis shards the TOKEN dim of every activation; attention swaps tokens
    # for heads with two all-to-alls (parallel.sequence, Ulysses pattern).
    # Requires pos_kind="rotate" and T divisible by the seq-axis size.
    seq_mesh: Any = None
    seq_axis: str = "seq"
    # ffn="moe": Switch top-1 mixture of SwiGLU experts (models.moe) —
    # num_experts x FFN params at ~1x per-token FLOPs. ep_mesh (a mesh with
    # an 'expert' axis) enables expert parallelism; the load-balance aux
    # loss is sown into the "moe_aux" collection (see train.step).
    moe_experts: int = 8
    moe_capacity: float = 1.25
    # train-time multiplicative router-input jitter (models.moe); active
    # only when the caller provides a "moe_jitter" rng stream
    moe_router_jitter: float = 0.0
    moe_dispatch: str = "auto"  # models.moe.MoeSwiGLU.dispatch
    ep_mesh: Any = None

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @nn.compact
    def __call__(
        self,
        x: Array,
        t: Array,
        y: Array,
        pos: Array,
        mask: Optional[Array] = None,
        train: bool = True,
    ) -> Array:
        assert self.pos_kind in ("rotate", "absolute")
        if not train:
            _, _, h, w = x.shape
            x = patchify(x, self.patch_size)

        x = x.astype(self.dtype)
        x = nn.Dense(
            self.hidden_size,
            kernel_init=default_kernel_init,
            dtype=self.dtype,
            name="x_embedder",
        )(x)
        if self.seq_mesh is not None:
            # pin the token axis onto the seq mesh axis at the pipeline head;
            # GSPMD propagates it through every token-wise op from here.
            # Axis-divisibility is checked per-dim so non-dividing shapes
            # (model.init at batch 1, odd eval batches) skip that dim's
            # constraint instead of failing to partition.
            assert self.pos_kind == "rotate", "sequence parallelism needs RoPE"
            from jax.sharding import NamedSharding, PartitionSpec as _P

            from fit_tpu.parallel.mesh import DATA_AXIS as _DATA

            shape = dict(self.seq_mesh.shape)
            spec = _P(
                _DATA if x.shape[0] % shape.get(_DATA, 1) == 0 else None,
                self.seq_axis if x.shape[1] % shape.get(self.seq_axis, 1) == 0 else None,
                None,
            )
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(self.seq_mesh, spec)
            )
        if self.pos_kind == "absolute":
            x = x + pos.astype(x.dtype)
            freqs_cis = None
        else:
            freqs_cis = pos
            # fused RoPE+attention kernel: split the interleaved table into
            # pair-duplicated cos/sin ONCE for all blocks (ops.fused_attention)
            t_len = x.shape[1]
            # t <= 1024 holds a (T, T) score block per head in VMEM;
            # longer T takes the kernel's chunked online-softmax grid
            # (K-chunked to T=2304 / 768^2, K+Q-chunked beyond — 1024^2 ->
            # T=4096). fused_supported() rejects divisor-free T (a prime T
            # would degenerate to 1-row chunks) — those fall back to the
            # blocked ops.attention kernel.
            from fit_tpu.ops.fused_attention import fused_supported, split_rope_tables

            max_t = _FUSED_MAX_T_TRAIN if train else _FUSED_MAX_T_EVAL
            use_fused = (
                self.attn_backend in ("auto", "fused")
                and t_len <= max_t
                and fused_supported(t_len)
                and (jax.default_backend() == "tpu" or self.attn_backend == "fused")
            )
            if use_fused or self.seq_mesh is not None:
                # SP always rides the cos/sin-table path: the Ulysses wrapper
                # picks fused-vs-xla per shard (models.layers.SelfAttention)
                freqs_cis = split_rope_tables(pos)

        t_emb = TimestepEmbedder(self.hidden_size, dtype=self.dtype, name="t_embedder")(t)
        y_emb = LabelEmbedder(
            self.num_classes,
            self.hidden_size,
            self.class_dropout_prob,
            dtype=self.dtype,
            name="y_embedder",
        )(y, train=train)
        c = t_emb + y_emb

        block_kwargs = dict(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            ffn=self.ffn,
            use_rope=self.pos_kind == "rotate",
            attn_backend=self.attn_backend,
            dtype=self.dtype,
            quant=self.quant,
            calib=self.calib,
            seq_mesh=self.seq_mesh,
            seq_axis=self.seq_axis,
            moe_experts=self.moe_experts,
            moe_capacity=self.moe_capacity,
            moe_router_jitter=self.moe_router_jitter,
            moe_dispatch=self.moe_dispatch,
            ep_mesh=self.ep_mesh,
        )
        if self.remat == "dots":
            block_cls = nn.remat(
                FiTBlock,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        elif self.remat:
            block_cls = nn.remat(FiTBlock)
        else:
            block_cls = FiTBlock
        if self.scan_blocks:
            scan_cls = nn.scan(
                _ScanBlockBody,
                # "calib" stacks each layer's sown absmax to (depth, C);
                # "moe_aux" stacks each layer's load-balance loss to (depth,)
                variable_axes={"params": 0, "calib": 0, "moe_aux": 0},
                # each scanned layer draws its own router-jitter noise
                split_rngs={"params": True, "moe_jitter": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.depth,
            )
            x, _ = scan_cls(
                block_cls=block_cls, block_kwargs=block_kwargs, name="blocks"
            )(x, c, mask, freqs_cis)
        else:
            for i in range(self.depth):
                x = block_cls(**block_kwargs, name=f"blocks_{i}")(x, c, mask, freqs_cis)

        x = FinalLayer(
            self.hidden_size, self.patch_size, self.out_channels, dtype=self.dtype, name="final"
        )(x, c)
        if not train:
            x = unpatchify(x.astype(jnp.float32), h, w, self.patch_size, self.out_channels)
        return x

    def forward_with_cfg(
        self,
        x: Array,
        t: Array,
        y: Array,
        pos: Array,
        mask: Array,
        cfg_scale,
    ) -> Array:
        """Classifier-free-guidance batched forward (GLIDE-style).

        Expects the batch packed as [conditional half | unconditional half]
        along axis 0 with identical latents in both halves; returns guided
        eps duplicated into both halves. Guidance is applied to **all**
        ``in_channels`` channels (reference ``fit.py:537-553``; contrast the
        3-channel variant in ``dit.py:262``).

        Use via ``model.apply(params, ..., method=FiT.forward_with_cfg)``.
        """
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        out = self(combined, t, y, pos, mask, train=False)
        eps, rest = out[:, : self.in_channels], out[:, self.in_channels :]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        guided = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([guided, guided], axis=0)
        return jnp.concatenate([eps, rest], axis=1)


def _sizes():
    # name -> (depth, hidden, heads); patch sizes {2,4,8} appended per entry.
    return {"XL": (28, 1152, 16), "L": (24, 1024, 16), "B": (12, 768, 12), "S": (12, 384, 6)}


def create_fit(name: str, **kwargs) -> FiT:
    """Build a FiT by registry name, e.g. ``create_fit("FiT-B/2")``.

    Registry parity: reference ``fit.py:556-617`` (12 sizes; DiT-equivalent
    param counts: S 33M, B 130M, L 458M, XL 675M).
    """
    size, patch = name.removeprefix("FiT-").split("/")
    depth, hidden, heads = _sizes()[size]
    return FiT(
        depth=depth,
        hidden_size=hidden,
        num_heads=heads,
        patch_size=int(patch),
        **kwargs,
    )


FiT_models = {
    f"FiT-{size}/{patch}": (lambda s=size, p=patch: (lambda **kw: create_fit(f"FiT-{s}/{p}", **kw)))()
    for size in _sizes()
    for patch in (2, 4, 8)
}
