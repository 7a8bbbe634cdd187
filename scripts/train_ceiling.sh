#!/usr/bin/env bash
# Training-ceiling measurement session (VERDICT r4 item 1, r3 directive #2 —
# two rounds overdue): run the tools round 4 built and RECORD the results.
#
# On the real TPU: the XL/2 single-chip training config (batch 128, accum 4,
# bf16-SR state — the README flagship row) swept over the remat policy
# (full / dots / none), the same sweep at the T=1024 (512^2) budget, the
# VAE-encode L0 row, and scripts/profile_train.py XPlane attribution for the
# headline configs. Everything lands in artifacts/train_roofline/ for the
# BASELINE.md training-roofline section.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/fit_tpu_jax_cache_tpu}

ART=${ART:-artifacts/train_roofline}
mkdir -p "$ART"
FAILED=()

run_json() {  # run_json <outfile> <cmd...>
    local out="$1"; shift
    echo "=== $* -> $out ==="
    if ! timeout 2400 "$@" > "$ART/$out" 2> "$ART/${out%.json}.err"; then
        FAILED+=("$out")
        echo "!!! FAILED: $out (stderr tail:)" >&2
        tail -5 "$ART/${out%.json}.err" >&2 || true
    else
        cat "$ART/$out"
    fi
}

# L0 row: VAE encode throughput (the one layer with no recorded number)
run_json vae_encode.json python bench.py --mode vae

# XL/2 single-chip flagship: batch 128, accum 4, SR state, T=256
for remat in full dots none; do
    run_json "xl2_t256_remat_${remat}.json" \
        python bench.py --mode train --model FiT-XL/2 --batch 128 \
        --train-accum 4 --train-state-dtype bfloat16 --train-remat "$remat"
done

# the long-sequence budget: T=1024 (512^2), batch 16
for remat in full dots none; do
    run_json "xl2_t1024_remat_${remat}.json" \
        python bench.py --mode train --model FiT-XL/2 --batch 16 \
        --train-tokens 1024 --train-accum 4 --train-state-dtype bfloat16 \
        --train-remat "$remat"
done

# XPlane op-bucket attribution of the two headline configs (where does the
# residual between measured and compute_bound_ms go?)
echo "=== profile_train XL/2 T=256 ==="
timeout 2400 python scripts/profile_train.py --model FiT-XL/2 --batch 128 \
    --accum 4 --tokens 256 --state-dtype bfloat16 \
    > "$ART/profile_xl2_t256.txt" 2>&1 || FAILED+=(profile_t256)
tail -30 "$ART/profile_xl2_t256.txt"
echo "=== profile_train XL/2 T=1024 ==="
timeout 2400 python scripts/profile_train.py --model FiT-XL/2 --batch 16 \
    --accum 4 --tokens 1024 --state-dtype bfloat16 \
    > "$ART/profile_xl2_t1024.txt" 2>&1 || FAILED+=(profile_t1024)
tail -30 "$ART/profile_xl2_t1024.txt"

# extract the one-line JSON each profile printed last into its own artifact
for t in t256 t1024; do
    grep -o '^{.*}$' "$ART/profile_xl2_${t}.txt" | tail -1 \
        > "$ART/profile_xl2_${t}.json" || true
done

echo "=== ceiling session complete ==="
if [ "${#FAILED[@]}" -gt 0 ]; then
    printf 'FAILED: %s\n' "${FAILED[@]}" >&2
    exit 1
fi
