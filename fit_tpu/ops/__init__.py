"""TPU kernels (Pallas) and their XLA reference implementations."""

from fit_tpu.ops.attention import mask_to_lengths, masked_attention

__all__ = ["mask_to_lengths", "masked_attention"]
