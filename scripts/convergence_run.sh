#!/usr/bin/env bash
# Convergence-in-anger driver (VERDICT r3 item 1): prove the framework LEARNS.
#
# Trains FiT-B/2 on the 311 real VAE latents the reference ships
# (/root/reference/latent/n01440764/*.pt — the reference's own sample of its
# training data) on the real TPU chip, three phases:
#
#   A. control      — STEPS uninterrupted optimizer steps, per-step loss JSONL
#   B. interrupted  — same seed/config; kill -9 mid-run at ~KILL_AT steps,
#                     then relaunch: Orbax + loader-position + host-RNG resume
#                     must continue the control's loss curve EXACTLY
#   C. eval         — scripts/convergence_check.py compares the curves and
#                     scripts/convergence_eval.py samples from the EMA
#                     checkpoint and checks the latent statistics against the
#                     training set
#
# Artifacts land in artifacts/convergence/ for the repo record.
set -euo pipefail
cd "$(dirname "$0")/.."

# The three launches (control, interrupted, resume) compile the identical
# training step; a persistent compilation cache turns launches 2-4 from a
# ~7 min compile into a cache hit.
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/fit_tpu_jax_cache}

LAT=${LAT:-/root/reference/latent}
OUT=${OUT:-runs/convergence}
STEPS=${STEPS:-6000}
KILL_AT=${KILL_AT:-2700}   # mid-run, past several checkpoints
ART=${ART:-artifacts/convergence}

COMMON=(--feature-path "$LAT" --model FiT-B/2 --global-batch-size 32
        --grad-accum 1 --epochs 1000000 --log-every 1 --ema-decay 0.999
        --num-workers 2 --feature-val-path /nonexistent
        --learning-rate 1e-4 --global-seed 0)

mkdir -p "$ART"

echo "=== phase A: control run ($STEPS steps, uninterrupted) ==="
python -m fit_tpu.cli.train "${COMMON[@]}" --results-dir "$OUT/control" \
    --max-steps "$STEPS" --ckpt-every-epochs 1000000

echo "=== phase B: interrupted run (kill -9 at ~$KILL_AT steps, resume) ==="
# checkpoints every 60 epochs = 540 steps (311 latents / batch 32 = 9 / epoch)
python -m fit_tpu.cli.train "${COMMON[@]}" --results-dir "$OUT/interrupted" \
    --max-steps "$STEPS" --ckpt-every-epochs 60 &
PID=$!
METRICS="$OUT/interrupted/FiT-B-2_metrics.jsonl"
while true; do
    sleep 5
    if ! kill -0 "$PID" 2>/dev/null; then
        echo "interrupted run exited early" >&2; exit 1
    fi
    last=$(tail -1 "$METRICS" 2>/dev/null | python -c \
        'import json,sys; l=sys.stdin.readline(); print(json.loads(l)["step"] if l.strip() else 0)' \
        2>/dev/null || echo 0)
    if [ "${last:-0}" -ge "$KILL_AT" ]; then
        echo "SIGKILL at step $last (pid $PID) — no cleanup, no final save"
        kill -9 "$PID"
        wait "$PID" 2>/dev/null || true
        break
    fi
done

echo "=== phase B resume: same command, restores latest checkpoint ==="
python -m fit_tpu.cli.train "${COMMON[@]}" --results-dir "$OUT/interrupted" \
    --max-steps "$STEPS" --ckpt-every-epochs 60

echo "=== phase C: curve comparison + EMA sampling eval ==="
python scripts/convergence_check.py "$OUT" --artifacts "$ART"
python scripts/convergence_eval.py "$OUT/control" --latents "$LAT" \
    --artifacts "$ART"
echo "done — artifacts in $ART"
