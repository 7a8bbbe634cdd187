"""Model families: FiT (variable-length packed tokens) and DiT (square)."""

from fit_tpu.models.convert import (
    convert_torch_fit_state_dict,
    load_torch_fit_checkpoint,
)
from fit_tpu.models.dit import DiT, DiT_models, create_dit
from fit_tpu.models.fit import FiT, FiT_models, create_fit
from fit_tpu.models.moe import MoeSwiGLU
from fit_tpu.models.layers import (
    FinalLayer,
    FiTBlock,
    GeluMlp,
    LabelEmbedder,
    SelfAttention,
    SwiGLU,
    TimestepEmbedder,
    apply_rope,
    layer_norm_fp32,
    modulate,
)

__all__ = [
    "convert_torch_fit_state_dict",
    "load_torch_fit_checkpoint",
    "DiT",
    "DiT_models",
    "create_dit",
    "FiT",
    "FiT_models",
    "create_fit",
    "FinalLayer",
    "FiTBlock",
    "GeluMlp",
    "LabelEmbedder",
    "MoeSwiGLU",
    "SelfAttention",
    "SwiGLU",
    "TimestepEmbedder",
    "apply_rope",
    "layer_norm_fp32",
    "modulate",
]
