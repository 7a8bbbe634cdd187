"""Convert reference (torch) FiT checkpoints to fit_tpu flax params.

Users of the reference train with PyTorch Lightning and hold ``.ckpt`` /
``.pt`` state dicts with the module tree of ``/root/reference/FiT/models/
fit.py`` (``x_embedder``, ``t_embedder.mlp.{0,2}``,
``y_embedder.embedding_table``, ``blocks.N.{attn.qkv, attn.proj,
ffn.fc1_g/fc1_x/fc2, adaLN_modulation.1}``, ``final_layer.{linear,
adaLN_modulation.1}``; LayerNorms are affine-free so carry no weights).
This module maps those onto fit_tpu's flax tree: every torch
``Linear.weight (out, in)`` becomes a flax ``Dense`` kernel ``(in, out)``
(transpose only — the fused-qkv [q|k|v] x [head-major] block layout and the
adaLN 6-chunk order are identical by construction, see
``models/layers.py``). Embedding tables copy as-is.

Lightning prefixes (``model.`` and torch.compile's ``_orig_mod.``) are
stripped automatically; EMA sidecar dicts convert the same way.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = [
    "convert_torch_fit_state_dict",
    "load_torch_fit_checkpoint",
    "resolve_reference_state_dict",
]

_STRIP_PREFIXES = ("model._orig_mod.", "model.", "_orig_mod.")


def _linear(sd: Dict, name: str) -> Dict:
    return {
        "kernel": np.ascontiguousarray(np.asarray(sd[f"{name}.weight"], np.float32).T),
        "bias": np.asarray(sd[f"{name}.bias"], np.float32),
    }


def _qkv_linear(sd: Dict, name: str) -> Dict:
    """qkv Linear (3C, D) -> the head-grouped DenseGeneral layout (D, 3, C);
    bias (3C,) -> (3, C). Pure reshape after the transpose — flat and grouped
    share memory order, so this is the same conversion as _linear."""
    lin = _linear(sd, name)
    d_in, w = lin["kernel"].shape
    return {
        "kernel": lin["kernel"].reshape(d_in, 3, w // 3),
        "bias": lin["bias"].reshape(3, w // 3),
    }


def _strip(sd: Dict) -> Dict:
    out = {}
    for k, v in sd.items():
        for p in _STRIP_PREFIXES:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def convert_torch_fit_state_dict(sd: Dict, depth: int, scan_blocks: bool = False) -> Dict:
    """Reference FiT state_dict -> ``{"params": ...}`` flax pytree.

    ``depth`` is the block count (12/24/28 per the size registry). With
    ``scan_blocks=True`` the per-block trees are stacked into the
    scan-over-layers layout.
    """
    sd = _strip(sd)
    params = {
        "x_embedder": _linear(sd, "x_embedder"),
        "t_embedder": {
            "fc1": _linear(sd, "t_embedder.mlp.0"),
            "fc2": _linear(sd, "t_embedder.mlp.2"),
        },
        "y_embedder": {
            "table": {
                "embedding": np.asarray(sd["y_embedder.embedding_table.weight"], np.float32)
            }
        },
        "final": {
            "adaLN": _linear(sd, "final_layer.adaLN_modulation.1"),
            "linear": _linear(sd, "final_layer.linear"),
        },
    }
    for i in range(depth):
        b = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "adaLN": _linear(sd, f"{b}.adaLN_modulation.1"),
            "attn": {
                "qkv": _qkv_linear(sd, f"{b}.attn.qkv"),
                "proj": _linear(sd, f"{b}.attn.proj"),
            },
            "ffn": {
                "fc1_g": _linear(sd, f"{b}.ffn.fc1_g"),
                "fc1_x": _linear(sd, f"{b}.ffn.fc1_x"),
                "fc2": _linear(sd, f"{b}.ffn.fc2"),
            },
        }
    tree = {"params": params}
    if scan_blocks:
        from fit_tpu.models.fit import stack_block_params

        tree = stack_block_params(tree, depth)
    return tree


def _to_np(v):
    return v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)


def _ema_list_from_optimizer_states(obj) -> Optional[list]:
    """The reference's ``EMAOptimizer.state_dict`` persists EMA weights as an
    ordered param list under ``optimizer_states[i]['ema']``
    (``/root/reference/FiT/ema.py:322-337``)."""
    states = obj.get("optimizer_states") if isinstance(obj, dict) else None
    if not states:
        return None
    st = states[0]
    if isinstance(st, dict) and "ema" in st:
        return list(st["ema"])
    return None


def _map_ema_onto_keys(sd: Dict, ema_list: list) -> Dict:
    """Positionally map the EMA param list onto the module's state_dict keys.

    Valid because ``EMAOptimizer.all_parameters()`` iterates param groups in
    ``module.parameters()`` order (``ema.py:211-214``), which for the
    reference FiT module (no buffers, affine-free LayerNorms) equals its
    state_dict key order.
    """
    keys = list(sd.keys())
    if len(keys) != len(ema_list):
        raise ValueError(
            f"cannot map EMA weights: {len(ema_list)} EMA params vs "
            f"{len(keys)} state_dict entries (module has buffers?)"
        )
    out = {}
    for k, e in zip(keys, ema_list):
        e = _to_np(e)
        base = _to_np(sd[k])
        if tuple(e.shape) != tuple(base.shape):
            raise ValueError(f"EMA param shape mismatch at {k}: {e.shape} vs {base.shape}")
        out[k] = e
    return out


def resolve_reference_state_dict(path: str, prefer_ema: bool = True) -> Tuple[Dict, bool]:
    """Load a reference checkpoint file and return ``(state_dict, used_ema)``.

    With ``prefer_ema`` (the default — the reference evaluates and samples
    with EMA weights, ``FiT/ema.py:67-81``), EMA weights are pulled from, in
    order: (1) a NeMo-style ``-EMA`` file itself (its ``state_dict`` IS the
    EMA, ``ema.py:137-141``), (2) a ``-EMA`` sidecar next to ``path``
    (``ema.py:142-146``), (3) ``optimizer_states[0]['ema']`` inside the
    checkpoint (``ema.py:322-337``). Falls back to the raw weights when no
    EMA source exists (plain ``.pt`` state dicts).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    sd = {k: _to_np(v) for k, v in sd.items()}
    if not prefer_ema:
        return sd, False

    root, ext = os.path.splitext(path)
    if root.endswith("-EMA"):
        # NeMo semantics: a -EMA checkpoint's main weights are the EMA copy
        return sd, True

    sidecar = f"{root}-EMA{ext}"
    if os.path.exists(sidecar):
        side = torch.load(sidecar, map_location="cpu", weights_only=False)
        ema_list = _ema_list_from_optimizer_states(side)
        if ema_list is not None:
            return _map_ema_onto_keys(sd, ema_list), True
        side_sd = side.get("state_dict") if isinstance(side, dict) else None
        if side_sd:
            return {k: _to_np(v) for k, v in side_sd.items()}, True

    ema_list = _ema_list_from_optimizer_states(obj)
    if ema_list is not None:
        return _map_ema_onto_keys(sd, ema_list), True
    return sd, False


def load_torch_fit_checkpoint(
    path: str, depth: int, scan_blocks: bool = False, prefer_ema: bool = True
) -> Dict:
    """Load a torch/.ckpt file and convert. Lightning checkpoints hold the
    weights under ``state_dict``; plain ``.pt`` dicts convert directly. EMA
    weights are selected by default when the checkpoint carries them (the
    reference's own eval/FID protocol runs on EMA weights)."""
    sd, used_ema = resolve_reference_state_dict(path, prefer_ema=prefer_ema)
    if used_ema:
        print(f"[fit_tpu] using EMA weights from {path}")
    return convert_torch_fit_state_dict(sd, depth, scan_blocks)
