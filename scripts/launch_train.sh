#!/usr/bin/env bash
# TPU-VM training launch — the TPU-native replacement for the reference's
# Slurm job (/root/reference/FiT/launch.sbatch: FiT-B/2, global batch 128,
# 100 epochs, resume + W&B id). On a multi-host slice run via
# `gcloud compute tpus tpu-vm ssh --worker=all --command="bash launch_train.sh"`;
# jax.distributed initializes from the TPU environment automatically.
set -euo pipefail

MODEL=${MODEL:-FiT-B/2}
BATCH=${BATCH:-128}
EPOCHS=${EPOCHS:-100}
FEATURES=${FEATURES:-features}
RESULTS=${RESULTS:-results}

python -m fit_tpu.cli.train \
  --model "$MODEL" \
  --feature-path "$FEATURES" \
  --results-dir "$RESULTS" \
  --global-batch-size "$BATCH" \
  --epochs "$EPOCHS" \
  ${RESUME:+--resume-from-checkpoint "$RESUME"} \
  ${WANDB_RUN_ID:+--wandb-run-id "$WANDB_RUN_ID"}
