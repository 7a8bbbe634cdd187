"""fit_tpu — a TPU-native (JAX / XLA / Pallas) framework for FiT:
Flexible Vision Transformers for latent diffusion (arXiv:2402.12376).

Capability-equivalent rebuild of the reference PyTorch-Lightning
implementation (jlnk03/FiT), designed TPU-first:

* ``fit_tpu.core``      — pure math: 2D RoPE + VisionNTK, sincos, patch
                          geometry, diffusion schedules (fp64 tables).
* ``fit_tpu.models``    — the FiT denoiser family (flax), adaLN-Zero blocks,
                          SwiGLU FFN, masked RoPE attention; 12-size registry.
* ``fit_tpu.diffusion`` — GaussianDiffusion, timestep respacing, jitted
                          ``lax.scan`` DDPM/DDIM/DPM-Solver sampling loops,
                          classifier-free guidance.
* ``fit_tpu.ops``       — Pallas TPU kernels (masked flash attention for
                          packed variable-length sequences, fused adaLN) with
                          XLA reference implementations and a switchable
                          backend.
* ``fit_tpu.parallel``  — device mesh / sharding layer (DP, FSDP, TP, SP)
                          built on ``jax.sharding`` + ``shard_map``.
* ``fit_tpu.data``      — host-side latent pipeline: pad-to-max and masked
                          token-bucket batching, per-host sharding.
* ``fit_tpu.train``     — train step/loop, EMA, Orbax checkpointing, metrics.
* ``fit_tpu.vae``       — flax AutoencoderKL (sd-vae architecture) with torch
                          weight conversion, for encode/decode.
"""

__version__ = "0.1.0"
