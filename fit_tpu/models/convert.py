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

from typing import Dict

import numpy as np

__all__ = ["convert_torch_fit_state_dict", "load_torch_fit_checkpoint"]

_STRIP_PREFIXES = ("model._orig_mod.", "model.", "_orig_mod.")


def _linear(sd: Dict, name: str) -> Dict:
    return {
        "kernel": np.ascontiguousarray(np.asarray(sd[f"{name}.weight"], np.float32).T),
        "bias": np.asarray(sd[f"{name}.bias"], np.float32),
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
                "qkv": _linear(sd, f"{b}.attn.qkv"),
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


def load_torch_fit_checkpoint(path: str, depth: int, scan_blocks: bool = False) -> Dict:
    """Load a torch/.ckpt file and convert. Lightning checkpoints hold the
    weights under ``state_dict``; plain ``.pt`` dicts convert directly."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_torch_fit_state_dict(sd, depth, scan_blocks)
