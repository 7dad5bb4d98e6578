#!/bin/bash
# Round-5 campaign, part 5.
#   1. warm_ttft AGAIN — the rest3 run was the FIRST process compiling
#      the backend's program shapes (prefill-chunk/decode-chunk differ
#      from bench.py's), so its 249.7 s is a cold-for-those-shapes
#      number; this run measures the true warm-process first token.
#   2. spec_probe — rest3's run crashed in the batched section (K-major
#      params fed to the BatchScheduler; fixed to keep a row-major copy)
#   3. bench_9b_b4_p64 — the r4 batched x4 number (112.3) was measured
#      at 64-token prompts; one matched-workload row so the prompt-length
#      effect is separated from the paged-default change.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-$REPO/results_r5}"
mkdir -p "$OUT"
cd "$REPO"

run() { # name timeout cmd...
  local name="$1" t="$2"; shift 2
  echo "=== $name (timeout ${t}s) $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
  timeout "$t" env "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  grep -v WARNING "$OUT/$name.log" | tail -n 4 | sed 's/^/    /'
  echo "--- $name rc=$rc" | tee -a "$OUT/summary.log"
  return $rc
}

run tunnel 120 python -c "import jax; print(jax.devices())" || {
  echo "TUNNEL DOWN — aborting runbook"; exit 1; }

run warm_ttft2 1200 env LMRS_BENCH_CONFIG=gemma2-2b \
  LMRS_BENCH_QUANT=q8_0 python scripts/warm_ttft.py

run spec_probe2 3600 env LMRS_BENCH_CONFIG=gemma2-2b \
  LMRS_BENCH_QUANT=q8_0 python scripts/spec_probe.py

run bench_9b_b4_p64 3600 env LMRS_BENCH_BATCH=4 LMRS_BENCH_PROMPT=64 \
  python bench.py

echo "=== campaign-rest4 done $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
