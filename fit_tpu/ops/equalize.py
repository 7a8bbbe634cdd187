"""Activation-outlier equalization for the int8 serving path (SmoothQuant).

The w8a8 path (``ops.quant``) quantizes activations per token: one scale per
row, so a single outlier CHANNEL inflates every row's scale and drowns the
other channels in quantization noise. Trained transformers reliably develop
such channels. The standard fix (SmoothQuant, Xiao et al. 2022,
arXiv:2211.10438) migrates the difficulty into the weights — per input
channel j, with calibrated activation absmax ``a_j`` and weight absmax
``w_j``::

    s_j = a_j^alpha / w_j^(1-alpha)          (alpha = 0.5 default)
    X' = X / s        W' = s * W             (Y = X W  ==  X' W' exactly)

Weights are per-OUTPUT-channel quantized offline, so they absorb the row
scaling losslessly at 8 bits far better than dynamic per-token activation
quant absorbs an outlier lane.

The TPU-native twist: ``X / s`` must cost ZERO runtime work, so every
division is folded into the PRODUCER's parameters. All four int8 feeds of a
FiTBlock have linear producers, so the fold is exact (real arithmetic):

=============  =================================================
int8 consumer  producer fold (per block)
=============  =================================================
attn/qkv       adaLN msa chunks: shift/s; scale' = (1+scale)/s-1
               (both are Dense outputs of c — fold into kernel
               columns + bias)
attn/proj      attention out is linear in v: qkv v-group columns
               / s (RoPE/softmax never touch v)
ffn/fc1_g+x    adaLN mlp chunks, as msa (one shared s: both
               consume the same rows)
ffn/fc2        SwiGLU hidden = silu(g) * v: fold into the LINEAR
               val side (fc1_x columns / s); the gate is untouched
=============  =================================================

No reference counterpart (the reference serves fp32 torch). Calibration
reuses the model's own forward: FiT/SelfAttention/SwiGLU carry a ``calib``
flag that ``sow``\\ s running per-channel absmax of each int8 feed into a
``calib`` variable collection (scan-stacked to (depth, C)).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "calibrate",
    "collect_stats",
    "equalize_params",
    "synthetic_calib_batch",
]

CALIB_SITES = ("attn_in", "proj_in", "ffn_in", "fc2_in")


def sow_absmax(module, name: str, x) -> None:
    """Record running per-channel absmax of a (B, T, C) activation into the
    ``calib`` collection (no-op unless that collection is mutable)."""
    v = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=tuple(range(x.ndim - 1)))
    module.sow(
        "calib", name, v, reduce_fn=jnp.maximum, init_fn=lambda: jnp.float32(0)
    )


def _leaves_with_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaves_with_paths(v, prefix + (k,))
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            yield from _leaves_with_paths(v, prefix)
    else:
        yield prefix, tree


def collect_stats(calib_vars: Any, depth: int) -> "dict[str, np.ndarray]":
    """Flatten one apply's ``calib`` collection to ``{site: (depth, C)}``.

    Handles both block layouts: scan (stacked under ``blocks/block``, leaves
    already (depth, C)) and unrolled (``blocks_i`` entries, stacked here).
    """
    tree = calib_vars["calib"] if "calib" in calib_vars else calib_vars
    per_site: "dict[str, dict[int, np.ndarray]]" = {s: {} for s in CALIB_SITES}
    stacked: "dict[str, np.ndarray]" = {}
    for path, leaf in _leaves_with_paths(tree):
        site = path[-1]
        if site not in CALIB_SITES:
            continue
        arr = np.asarray(leaf, np.float32)
        if path[0] == "blocks":  # scan layout: leaf is (depth, C)
            stacked[site] = arr
        else:  # blocks_{i}
            idx = int(path[0].split("_")[-1])
            per_site[site][idx] = arr
    for site, by_idx in per_site.items():
        if site not in stacked and by_idx:
            stacked[site] = np.stack([by_idx[i] for i in range(depth)])
    # fc2_in is absent for GeluMlp blocks (gelu is not scale-commutative, so
    # the site is neither sown nor folded); the other three are mandatory
    missing = [s for s in ("attn_in", "proj_in", "ffn_in") if s not in stacked]
    if missing:
        raise ValueError(
            f"calibration produced no stats for {missing} — was the model "
            "cloned with calib=True and apply() called with "
            "mutable=['calib']?"
        )
    return stacked


def synthetic_calib_batch(model, rng: np.random.Generator, batch: int, size: int):
    """A data-free calibration batch at the sampling shapes: unit-gaussian
    latents (the diffusion marginal at high t; activation CHANNEL structure
    comes from the trained weights, which is what equalization needs),
    timesteps spread over the schedule, random labels. Returns apply-args
    for the ``train=False`` signature."""
    from fit_tpu.core.pos_embed import rope_freqs_2d

    grid = size // 8 // model.patch_size
    t_tokens = grid * grid
    head_dim = model.hidden_size // model.num_heads
    x = jnp.asarray(rng.normal(size=(batch, model.in_channels, size // 8, size // 8)).astype(np.float32))
    pos = jnp.broadcast_to(
        rope_freqs_2d(head_dim, grid, grid), (batch, t_tokens, head_dim)
    )
    mask = jnp.ones((batch, t_tokens), bool)
    t = jnp.asarray(np.linspace(20, 980, batch).astype(np.int32))
    y = jnp.asarray(rng.integers(0, model.num_classes, size=(batch,)).astype(np.int32))
    return (x, t, y, pos, mask)


def calibrate(model, params, batches, depth: Optional[int] = None) -> "dict[str, np.ndarray]":
    """Run the bf16 model over calibration batches, returning per-channel
    activation absmax ``{site: (depth, C)}`` maxed across batches.

    ``batches`` is an iterable of ``train=False`` apply-arg tuples (e.g. from
    :func:`synthetic_calib_batch`, or real ``(canvas, t, y, pos, mask)``
    latents for data-grounded stats)."""
    depth = depth or model.depth
    cmodel = model.clone(calib=True, remat=False)

    @jax.jit
    def run(p, args):
        _, vs = cmodel.apply(p, *args, train=False, mutable=["calib"])
        return vs

    stats: "dict[str, np.ndarray]" = {}
    for args in batches:
        s = collect_stats(run(params, args), depth)
        for k, v in s.items():
            stats[k] = np.maximum(stats[k], v) if k in stats else v
    if not stats:
        raise ValueError("no calibration batches supplied")
    return stats


def _scales(act_absmax: np.ndarray, w_absmax: np.ndarray, alpha: float) -> np.ndarray:
    a = np.maximum(act_absmax.astype(np.float64), 1e-8)
    w = np.maximum(w_absmax.astype(np.float64), 1e-8)
    s = a**alpha / w ** (1.0 - alpha)
    # dead channels (a == 0 across calibration) stay untouched
    s = np.where(act_absmax <= 0, 1.0, s)
    return np.clip(s, 1e-4, 1e4)


def _apply(leaf, fn):
    """fn on a writable fp64 copy of a param leaf, cast back to its dtype."""
    out = fn(np.array(leaf, np.float64))
    return jnp.asarray(out.astype(np.float32)).astype(leaf.dtype)


def equalize_params(params: Any, stats: "dict[str, np.ndarray]", alpha: float = 0.5) -> Any:
    """Fold SmoothQuant scales into a (bf16/fp32) FiT param tree — output is
    numerically equivalent in real arithmetic (fp32-rounding-tolerance in
    practice) and substantially friendlier to :func:`~fit_tpu.ops.quant.
    quantize_params`. Call BEFORE quantize_params. Handles both the
    scan-stacked and unrolled block layouts; GeluMlp blocks skip the fc2
    fold (gelu is not scale-commutative)."""
    tree = params["params"] if isinstance(params, dict) and "params" in params else params
    tree = jax.tree.map(lambda x: x, tree)  # deep-ish copy of the dict spine

    def eq_block(block: dict, lidx: Optional[int]) -> dict:
        b = {k: (dict(v) if isinstance(v, dict) else v) for k, v in block.items()}
        attn = {k: dict(v) for k, v in b["attn"].items()}
        ffn = {k: dict(v) for k, v in b["ffn"].items()}
        adaln = dict(b["adaLN"])
        d = adaln["kernel"].shape[-1] // 6

        def stat(site):
            s = stats[site]
            return s[lidx] if lidx is not None else s

        def fold_adaln(s, shift_c: int, scale_c: int):
            """Divide the modulate output by s via the adaLN head params."""
            sl_sh = slice(shift_c * d, (shift_c + 1) * d)
            sl_sc = slice(scale_c * d, (scale_c + 1) * d)

            def k_fn(k):
                # kernel (.., D_c, 6D): broadcast s over the fan-in axis
                k[..., sl_sh] = k[..., sl_sh] / s[..., None, :]
                k[..., sl_sc] = k[..., sl_sc] / s[..., None, :]
                return k

            def b_fn(bb):
                bb[..., sl_sh] = bb[..., sl_sh] / s
                # modulate uses (1 + scale): (1+scale)/s - 1
                bb[..., sl_sc] = (bb[..., sl_sc] + 1.0) / s - 1.0
                return bb

            adaln["kernel"] = _apply(adaln["kernel"], k_fn)
            adaln["bias"] = _apply(adaln["bias"], b_fn)

        # --- attn/qkv: x' = modulate(...)/s, qkv rows * s -------------------
        qkv_k = np.asarray(attn["qkv"]["kernel"], np.float32)  # (.., D, 3, C)
        s_qkv = _scales(stat("attn_in"), np.max(np.abs(qkv_k), axis=(-2, -1)), alpha)
        fold_adaln(s_qkv, 0, 1)  # shift_msa, scale_msa
        attn["qkv"]["kernel"] = _apply(
            attn["qkv"]["kernel"], lambda k: k * s_qkv[..., :, None, None]
        )

        # --- attn/proj: attention out is linear in v ------------------------
        proj_k = np.asarray(attn["proj"]["kernel"], np.float32)  # (.., D, D)
        s_proj = _scales(stat("proj_in"), np.max(np.abs(proj_k), axis=-1), alpha)
        def qkv_v_cols_k(k):  # (.., D, 3, C): divide the v group's columns
            k[..., 2, :] = k[..., 2, :] / s_proj[..., None, :]
            return k

        def qkv_v_cols_b(bb):  # (.., 3, C)
            bb[..., 2, :] = bb[..., 2, :] / s_proj
            return bb

        attn["qkv"]["kernel"] = _apply(attn["qkv"]["kernel"], qkv_v_cols_k)
        attn["qkv"]["bias"] = _apply(attn["qkv"]["bias"], qkv_v_cols_b)
        attn["proj"]["kernel"] = _apply(
            attn["proj"]["kernel"], lambda k: k * s_proj[..., :, None]
        )

        # --- ffn/fc1 (shared s: fc1_g and fc1_x read the same rows) ---------
        gk = "fc1_g" if "fc1_g" in ffn else "fc1"
        fc1_w = np.abs(np.asarray(ffn[gk]["kernel"], np.float32))
        if "fc1_x" in ffn:
            fc1_w = np.maximum(fc1_w, np.abs(np.asarray(ffn["fc1_x"]["kernel"], np.float32)))
        s_fc1 = _scales(stat("ffn_in"), np.max(fc1_w, axis=-1), alpha)
        fold_adaln(s_fc1, 3, 4)  # shift_mlp, scale_mlp
        ffn[gk]["kernel"] = _apply(ffn[gk]["kernel"], lambda k: k * s_fc1[..., :, None])
        if "fc1_x" in ffn:
            ffn["fc1_x"]["kernel"] = _apply(
                ffn["fc1_x"]["kernel"], lambda k: k * s_fc1[..., :, None]
            )

        # --- ffn/fc2: hidden = silu(g) * v — fold into the linear val side --
        if "fc1_x" in ffn and "fc2_in" in stats:
            fc2_k = np.asarray(ffn["fc2"]["kernel"], np.float32)  # (.., H, D)
            s_fc2 = _scales(stat("fc2_in"), np.max(np.abs(fc2_k), axis=-1), alpha)
            ffn["fc1_x"]["kernel"] = _apply(
                ffn["fc1_x"]["kernel"], lambda k: k / s_fc2[..., None, :]
            )
            ffn["fc1_x"]["bias"] = _apply(
                ffn["fc1_x"]["bias"], lambda bb: bb / s_fc2
            )
            ffn["fc2"]["kernel"] = _apply(
                ffn["fc2"]["kernel"], lambda k: k * s_fc2[..., :, None]
            )

        b["attn"], b["ffn"], b["adaLN"] = attn, ffn, adaln
        return b

    out = dict(tree)
    if "blocks" in out:  # scan layout: stacked leaves, stats used as (L, C)
        out["blocks"] = {"block": eq_block(dict(out["blocks"]["block"]), None)}
    else:
        i = 0
        while f"blocks_{i}" in out:
            out[f"blocks_{i}"] = eq_block(dict(out[f"blocks_{i}"]), i)
            i += 1
        if i == 0:
            raise ValueError("no FiT blocks found in the param tree")
    if isinstance(params, dict) and "params" in params:
        return {**params, "params": out}
    return out
