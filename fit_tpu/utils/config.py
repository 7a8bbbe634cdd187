"""One typed config system for training/sampling/preprocessing.

Replaces the reference's three ad-hoc layers (argparse CLIs, a JSON config
for preprocessing only, and hardcoded in-module dicts — SURVEY.md §5) with
dataclasses that load from JSON and expose argparse flags using the
reference's public flag names (``--model``, ``--global-batch-size``,
``--cfg_scale``, ... — ``FiT/train.py:296-314``,
``sample_lightning.py:91-100``).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Optional, Tuple

__all__ = ["TrainConfig", "SampleConfig", "PreprocessConfig", "add_dataclass_args", "from_args"]


@dataclasses.dataclass
class TrainConfig:
    feature_path: str = "features"
    feature_val_path: str = "features_val"
    results_dir: str = "results"
    model: str = "FiT-B/2"
    image_size: int = 256
    num_classes: int = 1000
    epochs: int = 1400
    # stop after this many optimizer steps regardless of epochs (0 = no cap).
    # The convergence-run driver uses this to bound long overfit runs.
    max_steps: int = 0
    global_batch_size: int = 256
    global_seed: int = 0
    num_workers: int = 4  # loader prefetch threads
    log_every: int = 100
    ckpt_every_epochs: int = 1
    resume_from_checkpoint: Optional[str] = None
    wandb_run_id: Optional[str] = None
    use_wandb: bool = False
    # optimization (reference values)
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    ema_decay: float = 0.9999
    grad_accum: int = 2
    compute_dtype: str = "bfloat16"  # 'bf16-mixed' parity
    # "float32" (reference parity) or "bfloat16": store Adam moments + the
    # EMA shadow in bf16 with stochastic rounding — halves optimizer HBM,
    # unlocks single-chip FiT-XL/2 training on a 16 GB chip (train/state.py)
    optimizer_state_dtype: str = "float32"
    # data geometry (reference hardcoded dict, train.py:220-227)
    patch_size: int = 2
    vae_scale: int = 8
    channels: int = 4
    # packing: "pad" (FiT) or "bucket" (masked_FiT)
    packing: str = "pad"
    # timestep sampling: "uniform" (reference training default) or
    # "loss-second-moment" (ADM importance resampling — the reference ships
    # the sampler but never wires it; here it is a first-class flag)
    timestep_sampler: str = "uniform"
    token_buckets: Tuple[int, ...] = (32, 64, 96, 128, 192, 256)
    # parallelism
    tp: int = 1
    fsdp: bool = False
    # sequence (context) parallelism: shard the TOKEN axis over `sp` devices
    # (parallel.sequence, Ulysses all-to-all). Requires T % sp == 0 and
    # (num_heads / tp) % sp == 0; the per-chip memory of a long-T step drops
    # by sp. 1 = off.
    sp: int = 1
    # pipeline parallelism: stream the block stack over `pp` stages
    # (parallel.pipeline, GPipe). Requires scan_blocks and depth % pp == 0;
    # composes with dp only (tp/sp inside a stage are not wired). 1 = off.
    pp: int = 1
    # GPipe microbatches per (grad-accum) micro-step; 0 = pp (the minimum
    # sensible; raise to shrink the (pp-1)/(m+pp-1) bubble)
    pp_microbatches: int = 0
    # FFN flavor: "swiglu" | "mlp" (reference menu) | "moe" — Switch top-1
    # mixture of SwiGLU experts (models.moe): moe_experts x FFN params at
    # ~1x per-token FLOPs, load-balanced by a sown aux loss
    ffn: str = "swiglu"
    moe_experts: int = 8
    moe_capacity: float = 1.25  # per-expert slots = ceil(T/E * this)
    moe_aux_weight: float = 0.01  # Switch load-balance loss weight
    # train-time multiplicative router-input jitter (Switch §2.2, try 1e-2):
    # anti-collapse noise on top of the aux loss; 0 = off (deterministic
    # router, bit-compatible with r3 checkpoints)
    moe_router_jitter: float = 0.0
    # expert parallelism: shard the expert dim of MoE weights over `ep`
    # devices (an 'expert' mesh axis; dispatch all-to-alls ride ICI).
    # Requires ffn="moe" and moe_experts % ep == 0. 1 = off.
    ep: int = 1
    # permit a (micro)batch that doesn't divide the data axis to fall back to
    # full replication instead of erroring. Off by default: on a real mesh
    # that fallback is a silent ~dp x throughput loss from a misconfigured
    # batch/mesh geometry (VERDICT r2); tests with tiny batches opt in.
    allow_batch_replication: bool = False
    attn_backend: str = "auto"
    # rematerialize blocks: None = auto (on for pad-to-max packing where
    # saving scan residuals is the bottleneck, off for token buckets where
    # recompute costs more than the smaller residuals — both measured on v5e)
    remat: Optional[bool] = None
    scan_blocks: bool = True  # scan-over-layers (stacked block params)
    profile_dir: str = ""  # capture a jax.profiler trace of steps 10-20


@dataclasses.dataclass
class SampleConfig:
    checkpoint_path: str = ""
    num_samples: int = 4
    num_sampling_steps: int = 250
    image_height: int = 256
    image_width: int = 256
    num_classes: int = 1000
    vae: str = "ema"  # "ema" | "mse" — selects sd-vae-ft-{ema,mse} when
    # --vae-checkpoint points at a directory (reference sample_lightning.py:24)
    cfg_scale: float = 1.5
    model: str = "FiT-B/2"
    sampler: str = "ddim"  # "ddim" | "ddpm" | "dpm"
    dtype: str = "bfloat16"  # "float32" for bit-parity sampling runs
    # mixed-resolution packed sampling (BASELINE config 4): comma-separated
    # HxW list, e.g. "256x256,224x288"; sizes cycle across samples
    image_sizes: str = ""
    batch_size: int = 100
    output_dir: str = "samples"
    global_seed: int = 0
    use_ema: bool = True
    attn_backend: str = "auto"
    scan_blocks: bool = True  # must match the training layout
    # must match the training FFN flavor ("swiglu" | "mlp" | "moe")
    ffn: str = "swiglu"
    moe_experts: int = 8
    moe_capacity: float = 1.25


@dataclasses.dataclass
class PreprocessConfig:
    dataset_path: str = "../dataset"
    latent_folder: str = "../latent"
    batch_size: int = 1
    sample_size: int = 256
    patch_size: int = 2
    vae: str = "ema"
    vae_checkpoint: Optional[str] = None  # torch .bin/.safetensors to convert


def add_dataclass_args(parser: argparse.ArgumentParser, cls) -> None:
    """Expose every field as ``--field-name``.

    Argparse defaults are ``None`` so :func:`from_args` can tell user-passed
    flags apart from untouched ones — JSON-config values are only overridden
    by flags the user actually typed; the dataclass's own defaults fill the
    rest.
    """
    for f in dataclasses.fields(cls):
        name = f.name.replace("_", "-")
        default = f.default
        if "bool" in str(f.type) or isinstance(default, bool):
            parser.add_argument(
                f"--{name}", type=lambda s: s.lower() in ("1", "true", "yes"), default=None
            )
        elif isinstance(default, tuple):
            parser.add_argument(f"--{name}", type=int, nargs="*", default=None)
        else:
            typ = type(default) if default is not None else str
            parser.add_argument(f"--{name}", type=typ, default=None)


def from_args(cls, args: argparse.Namespace, json_path: Optional[str] = None):
    """Build a config from (optional) JSON file + CLI overrides."""
    base = {}
    if json_path:
        with open(json_path) as f:
            base = json.load(f)
    names = {f.name for f in dataclasses.fields(cls)}
    for k, v in vars(args).items():
        key = k.replace("-", "_")
        if key in names and v is not None:
            base[key] = tuple(v) if isinstance(v, list) else v
    return cls(**{k: v for k, v in base.items() if k in names})
