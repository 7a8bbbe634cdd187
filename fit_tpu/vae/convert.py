"""Convert a diffusers AutoencoderKL torch checkpoint to fit_tpu flax params.

Weight-layout mapping:
* torch Conv2d ``(O, I, kH, kW)``  -> flax Conv ``(kH, kW, I, O)``
* torch Linear ``(O, I)``          -> flax Dense ``(I, O)``
* the SD VAE's mid-block attention stores q/k/v/proj as 1x1 convs in older
  checkpoints and Linears in newer diffusers — both map to our Dense.

Name mapping covers the diffusers module tree
(``encoder.down_blocks[i].resnets[j]`` etc.) onto the flat names of
``fit_tpu.vae.model``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["convert_torch_state_dict", "load_torch_checkpoint"]


def _conv(w):  # (O,I,kH,kW) -> (kH,kW,I,O)
    return np.transpose(np.asarray(w, dtype=np.float32), (2, 3, 1, 0))


def _dense(w):  # (O,I) or (O,I,1,1) -> (I,O)
    w = np.asarray(w, dtype=np.float32)
    if w.ndim == 4:  # 1x1 conv form
        w = w[:, :, 0, 0]
    return np.transpose(w, (1, 0))


def _vec(w):
    return np.asarray(w, dtype=np.float32)


def _resnet(src: Dict, prefix: str) -> Dict:
    out = {
        "norm1": {"scale": _vec(src[f"{prefix}.norm1.weight"]), "bias": _vec(src[f"{prefix}.norm1.bias"])},
        "conv1": {"kernel": _conv(src[f"{prefix}.conv1.weight"]), "bias": _vec(src[f"{prefix}.conv1.bias"])},
        "norm2": {"scale": _vec(src[f"{prefix}.norm2.weight"]), "bias": _vec(src[f"{prefix}.norm2.bias"])},
        "conv2": {"kernel": _conv(src[f"{prefix}.conv2.weight"]), "bias": _vec(src[f"{prefix}.conv2.bias"])},
    }
    if f"{prefix}.conv_shortcut.weight" in src:
        out["shortcut"] = {
            "kernel": _conv(src[f"{prefix}.conv_shortcut.weight"]),
            "bias": _vec(src[f"{prefix}.conv_shortcut.bias"]),
        }
    return out


def _attn(src: Dict, prefix: str) -> Dict:
    # diffusers names: group_norm + to_q/to_k/to_v/to_out.0 (new) or
    # norm + q/k/v/proj_out (old ldm-style)
    if f"{prefix}.to_q.weight" in src:
        names = {"q": "to_q", "k": "to_k", "v": "to_v", "proj_out": "to_out.0", "norm": "group_norm"}
    else:
        names = {"q": "q", "k": "k", "v": "v", "proj_out": "proj_out", "norm": "norm"}
    return {
        "norm": {
            "scale": _vec(src[f"{prefix}.{names['norm']}.weight"]),
            "bias": _vec(src[f"{prefix}.{names['norm']}.bias"]),
        },
        **{
            ours: {
                "kernel": _dense(src[f"{prefix}.{theirs}.weight"]),
                "bias": _vec(src[f"{prefix}.{theirs}.bias"]),
            }
            for ours, theirs in names.items()
            if ours != "norm"
        },
    }


def convert_torch_state_dict(
    sd: Dict, block_out_channels=(128, 256, 512, 512), enc_layers=2, dec_layers=3
) -> Dict:
    """diffusers AutoencoderKL state_dict -> {'params': ...} pytree."""
    enc = {
        "conv_in": {"kernel": _conv(sd["encoder.conv_in.weight"]), "bias": _vec(sd["encoder.conv_in.bias"])},
        "mid_block_1": _resnet(sd, "encoder.mid_block.resnets.0"),
        "mid_attn": _attn(sd, "encoder.mid_block.attentions.0"),
        "mid_block_2": _resnet(sd, "encoder.mid_block.resnets.1"),
        "norm_out": {
            "scale": _vec(sd["encoder.conv_norm_out.weight"]),
            "bias": _vec(sd["encoder.conv_norm_out.bias"]),
        },
        "conv_out": {"kernel": _conv(sd["encoder.conv_out.weight"]), "bias": _vec(sd["encoder.conv_out.bias"])},
        "quant_conv": {"kernel": _conv(sd["quant_conv.weight"]), "bias": _vec(sd["quant_conv.bias"])},
    }
    for i in range(len(block_out_channels)):
        for j in range(enc_layers):
            enc[f"down_{i}_block_{j}"] = _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < len(block_out_channels) - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": {
                    "kernel": _conv(sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"]),
                    "bias": _vec(sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"]),
                }
            }

    dec = {
        "post_quant_conv": {
            "kernel": _conv(sd["post_quant_conv.weight"]),
            "bias": _vec(sd["post_quant_conv.bias"]),
        },
        "conv_in": {"kernel": _conv(sd["decoder.conv_in.weight"]), "bias": _vec(sd["decoder.conv_in.bias"])},
        "mid_block_1": _resnet(sd, "decoder.mid_block.resnets.0"),
        "mid_attn": _attn(sd, "decoder.mid_block.attentions.0"),
        "mid_block_2": _resnet(sd, "decoder.mid_block.resnets.1"),
        "norm_out": {
            "scale": _vec(sd["decoder.conv_norm_out.weight"]),
            "bias": _vec(sd["decoder.conv_norm_out.bias"]),
        },
        "conv_out": {"kernel": _conv(sd["decoder.conv_out.weight"]), "bias": _vec(sd["decoder.conv_out.bias"])},
    }
    for i in range(len(block_out_channels)):
        for j in range(dec_layers):
            dec[f"up_{i}_block_{j}"] = _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < len(block_out_channels) - 1:
            dec[f"up_{i}_upsample"] = {
                "conv": {
                    "kernel": _conv(sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"]),
                    "bias": _vec(sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"]),
                }
            }
    return {"params": {"encoder": enc, "decoder": dec}}


def load_torch_checkpoint(path: str) -> Dict:
    """Load a torch .bin/.pt/.safetensors state_dict and convert."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
    return convert_torch_state_dict(sd)
