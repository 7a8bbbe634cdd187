#!/usr/bin/env bash
# FID sampling job — parity with /root/reference/FiT/launch_sampling_FID.sbatch:
# 50,000 samples, 250 DDIM steps, cfg_scale 1.5 (FID computed off-repo).
set -euo pipefail

CKPT=${CKPT:?set CKPT to the checkpoint dir}
VAE=${VAE:-}

python -m fit_tpu.cli.sample \
  --checkpoint_path "$CKPT" \
  --num_samples 50000 \
  --num_sampling_steps 250 \
  --cfg_scale 1.5 \
  --image_height 256 --image_width 256 \
  ${VAE:+--vae-checkpoint "$VAE"}
