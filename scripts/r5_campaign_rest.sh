#!/bin/bash
# Round-5 campaign continuation: entries 3+ of scripts/r5_tpu_runbook.sh
# (entries 1-2 — bench_9b_q4 and the warm-process artifact — are already
# committed in results_r5/).  Reordered so the highest-value measurements
# land first if wall-clock runs out:
#   1. bench_9b_q8      — VERDICT r4 #3's explicit bar (>=63 tok/s or analysis)
#   2. spec_probe       — VERDICT r4 #2: the honest speculation record
#   3. crossover_9b     — VERDICT r4 #6 / r4 weak #5
#   4. prefill_sweep    — VERDICT r4 #5
#   5. single-stream README rows (2b/1b/3b/phi)
#   6. batched rows
# Same run() contract as r5_tpu_runbook.sh; logs append to results_r5/.
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

run bench_9b_q8 3600 env LMRS_BENCH_QUANT=q8_0 python bench.py

run spec_probe 3600 env LMRS_BENCH_CONFIG=gemma2-2b \
  LMRS_BENCH_QUANT=q8_0 python scripts/spec_probe.py

run crossover_9b 3600 python scripts/flash_crossover.py gemma2-9b q4_0

run prefill_sweep 3600 python scripts/prefill_sweep.py

run bench_2b_q4 2400 env LMRS_BENCH_CONFIG=gemma2-2b python bench.py
run bench_2b_q8 2400 env LMRS_BENCH_CONFIG=gemma2-2b \
  LMRS_BENCH_QUANT=q8_0 python bench.py
run bench_1b_q8 2400 env LMRS_BENCH_CONFIG=llama3.2-1b \
  LMRS_BENCH_QUANT=q8_0 python bench.py
run bench_3b_q4 2400 env LMRS_BENCH_CONFIG=llama3.2-3b python bench.py
run bench_3b_q8 2400 env LMRS_BENCH_CONFIG=llama3.2-3b \
  LMRS_BENCH_QUANT=q8_0 python bench.py
run bench_phi_q8 2400 env LMRS_BENCH_CONFIG=phi3.5-mini \
  LMRS_BENCH_QUANT=q8_0 python bench.py
run bench_phiv_q8 2400 env LMRS_BENCH_CONFIG=phi3.5-vision \
  LMRS_BENCH_QUANT=q8_0 python bench.py

run bench_1b_b8 2400 env LMRS_BENCH_CONFIG=llama3.2-1b \
  LMRS_BENCH_QUANT=q8_0 LMRS_BENCH_BATCH=8 python bench.py
run bench_1b_b16 2400 env LMRS_BENCH_CONFIG=llama3.2-1b \
  LMRS_BENCH_QUANT=q8_0 LMRS_BENCH_BATCH=16 python bench.py
run bench_2b_b8 2400 env LMRS_BENCH_CONFIG=gemma2-2b \
  LMRS_BENCH_QUANT=q8_0 LMRS_BENCH_BATCH=8 python bench.py
run bench_9b_b4 3600 env LMRS_BENCH_BATCH=4 python bench.py

echo "=== campaign-rest done $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
