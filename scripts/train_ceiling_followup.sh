#!/usr/bin/env bash
# Follow-up to scripts/train_ceiling.sh: the first sweep measured that at
# the XL/2 flagship config (batch 128, accum 4 -> microbatch 32) the
# dots/none remat policies OOM in COMPILE (18.5G / 24.5G vs 15.75G HBM) —
# full remat is the only feasible policy there. To quantify what the remat
# replay actually costs (the "is 0.46 MFU the bound?" question), re-sweep
# at halved microbatch (accum 8 -> micro 16) where the saved-residual
# policies may fit, and retry the t256 remat=full headline run (first
# attempt died on a transport FAILED_PRECONDITION).
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/fit_tpu_jax_cache_tpu}

ART=${ART:-artifacts/train_roofline}
mkdir -p "$ART"
FAILED=()

run_json() {
    local out="$1"; shift
    echo "=== $* -> $out ==="
    if ! timeout 2400 "$@" > "$ART/$out" 2> "$ART/${out%.json}.err"; then
        FAILED+=("$out")
        echo "!!! FAILED: $out" >&2
        tail -3 "$ART/${out%.json}.err" >&2 || true
    else
        cat "$ART/$out"
    fi
}

# retry the headline config (transient FAILED_PRECONDITION on attempt 1)
run_json xl2_t256_remat_full.json \
    python bench.py --mode train --model FiT-XL/2 --batch 128 \
    --train-accum 4 --train-state-dtype bfloat16 --train-remat full

# remat-policy tax at halved microbatch (same global batch 128)
for remat in full dots none; do
    run_json "xl2_t256_accum8_remat_${remat}.json" \
        python bench.py --mode train --model FiT-XL/2 --batch 128 \
        --train-accum 8 --train-state-dtype bfloat16 --train-remat "$remat"
done

echo "=== follow-up complete ==="
if [ "${#FAILED[@]}" -gt 0 ]; then printf 'FAILED: %s\n' "${FAILED[@]}" >&2; exit 1; fi
