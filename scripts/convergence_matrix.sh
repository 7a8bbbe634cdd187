#!/usr/bin/env bash
# Convergence-matrix driver (VERDICT r4 items 2c, 3, 4, 5): extend the r4
# lived-learning evidence (control = B/2 + pad packing + fp32 state,
# scripts/convergence_run.sh) to every recipe cell that differs NUMERICALLY,
# plus the evals the r4 round built but never executed:
#
#   control — re-run phase A (runs/ is gitignored; the checkpoint has to be
#             retrained to evaluate against), then:
#               * EMA sample stats (re-record)
#               * int8 + int8-equalized sample stats  (r3 directive, 2 rounds due)
#               * VisionNTK extrapolation + mixed-shape probe (first ever)
#   sr      — bf16-SR optimizer state (the single-chip-XL flagship recipe)
#   bucket  — masked_FiT token-subsampling via the C++ gather packer
#   moe     — Switch top-1 MoE (E=4) on real data, aux-balanced
#
# Each cell runs the SAME protocol: 6000 steps, batch 32, the reference's
# own shipped latents, then a curve check + EMA sample-stats eval. Cells are
# independent: a failure records and continues.
set -uo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/fit_tpu_jax_cache}

LAT=${LAT:-/root/reference/latent}
OUT=${OUT:-runs/convergence}
STEPS=${STEPS:-6000}
ART=${ART:-artifacts/convergence}
FAILED=()

COMMON=(--feature-path "$LAT" --model FiT-B/2 --global-batch-size 32
        --grad-accum 1 --epochs 1000000 --log-every 1 --ema-decay 0.999
        --num-workers 2 --feature-val-path /nonexistent
        --learning-rate 1e-4 --global-seed 0 --max-steps "$STEPS"
        --ckpt-every-epochs 1000000)

mkdir -p "$ART"
run() {  # run <label> <cmd...>
    echo "=== $1 ==="
    shift
    if ! "$@"; then FAILED+=("$1"); echo "!!! FAILED: $1" >&2; fi
}

# --- control cell (re-train; same seed/config as the r4 committed run) ----
run "control: train" python -m fit_tpu.cli.train "${COMMON[@]}" \
    --results-dir "$OUT/control"
# same-seed cross-round reproducibility: the fresh control curve should
# reproduce the r4 committed curve bit-for-bit (same chip, same jax)
run "control: cross-round curve check" python - <<'PY'
import gzip, json
old = {}
with gzip.open("artifacts/convergence/control_loss.jsonl.gz", "rt") as f:
    for line in f:
        r = json.loads(line)
        if "train_loss" in r:
            old[r["step"]] = r["train_loss"]
new = {}
with open("runs/convergence/control/FiT-B-2_metrics.jsonl") as f:
    for line in f:
        r = json.loads(line)
        if "train_loss" in r:
            new[r["step"]] = r["train_loss"]
common = sorted(set(old) & set(new))
diff = [s for s in common if old[s] != new[s]]
print(f"{len(common)} common steps, {len(diff)} differ")
out = {"common_steps": len(common), "mismatched": len(diff),
       "bitexact_across_rounds": not diff}
if diff:
    s = diff[0]
    out["first_diff"] = {"step": s, "r4": old[s], "r5": new[s]}
with open("artifacts/convergence/cross_round_repro.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
PY

run "control: EMA sample stats" python scripts/convergence_eval.py \
    "$OUT/control" --latents "$LAT" --artifacts "$ART"
run "control: int8 sample stats" python scripts/convergence_eval.py \
    "$OUT/control" --latents "$LAT" --artifacts "$ART" --quant int8
run "control: int8+equalize sample stats" python scripts/convergence_eval.py \
    "$OUT/control" --latents "$LAT" --artifacts "$ART" --quant int8 \
    --equalize 8 --tag int8_eq
run "control: extrapolation + mixed-shape probe" \
    python scripts/extrapolation_eval.py "$OUT/control" --latents "$LAT" \
    --artifacts "$ART"

# --- bf16-SR optimizer state cell ------------------------------------------
run "sr: train" python -m fit_tpu.cli.train "${COMMON[@]}" \
    --results-dir "$OUT/sr" --optimizer-state-dtype bfloat16
run "sr: curve check" python scripts/convergence_cell_check.py "$OUT/sr" \
    --cell sr --control "$OUT/control" --artifacts "$ART"
run "sr: EMA sample stats" python scripts/convergence_eval.py "$OUT/sr" \
    --latents "$LAT" --artifacts "$ART" --tag sr

# --- bucket-packing (masked_FiT token subsampling, C++ gather path) ---------
run "bucket: train" python -m fit_tpu.cli.train "${COMMON[@]}" \
    --results-dir "$OUT/bucket" --packing bucket
run "bucket: curve check" python scripts/convergence_cell_check.py \
    "$OUT/bucket" --cell bucket --control "$OUT/control" --artifacts "$ART"
run "bucket: EMA sample stats" python scripts/convergence_eval.py \
    "$OUT/bucket" --latents "$LAT" --artifacts "$ART" --tag bucket

# --- MoE cell (Switch top-1, E=4, aux-balanced) ------------------------------
run "moe: train" python -m fit_tpu.cli.train "${COMMON[@]}" \
    --results-dir "$OUT/moe" --ffn moe --moe-experts 4
run "moe: curve check" python scripts/convergence_cell_check.py "$OUT/moe" \
    --cell moe --control "$OUT/control" --artifacts "$ART"
run "moe: EMA sample stats" python scripts/convergence_eval.py "$OUT/moe" \
    --latents "$LAT" --artifacts "$ART" --tag moe --ffn moe --moe-experts 4

echo "=== matrix complete ==="
if [ "${#FAILED[@]}" -gt 0 ]; then
    printf 'FAILED: %s\n' "${FAILED[@]}" >&2
    exit 1
fi
echo "all cells green — artifacts in $ART"
