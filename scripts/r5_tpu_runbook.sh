#!/bin/bash
# Round-5 TPU measurement campaign: refresh EVERY README perf row at
# current HEAD (K-major decode layout, VERDICT r4 #3), re-measure
# speculation honestly (#2), the 9B flash crossover (#6), prefill MFU
# (#5), and the warm-process cold-start artifact (#4).  Serial; logs land
# in results_r5/ so every README number traces to a committed raw log.
#
# NOTE env vars are passed via `env` INSIDE run():  `VAR=x shell_func`
# leaks the assignment past the call in bash, which would poison the
# later default-config runs.
#
# Usage:  bash scripts/r5_tpu_runbook.sh [outdir]   (default results_r5)
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

# 1. single-stream README rows at HEAD (K-major layout; bench.py default)
run bench_9b_q4 3600 python bench.py
# warm-process artifact (#4): the SECOND process on the same compile
# cache — its warmup line is the committed cold-start evidence
run bench_9b_q4_warm 2400 python bench.py
run bench_9b_q8 3600 env LMRS_BENCH_QUANT=q8_0 python bench.py
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

# 2. batched rows at HEAD (paged default now; spec applies to sampled too)
run bench_1b_b8 2400 env LMRS_BENCH_CONFIG=llama3.2-1b \
  LMRS_BENCH_QUANT=q8_0 LMRS_BENCH_BATCH=8 python bench.py
run bench_1b_b16 2400 env LMRS_BENCH_CONFIG=llama3.2-1b \
  LMRS_BENCH_QUANT=q8_0 LMRS_BENCH_BATCH=16 python bench.py
run bench_2b_b8 2400 env LMRS_BENCH_CONFIG=gemma2-2b \
  LMRS_BENCH_QUANT=q8_0 LMRS_BENCH_BATCH=8 python bench.py
run bench_9b_b4 3600 env LMRS_BENCH_BATCH=4 python bench.py

# 3. honest speculation probe (#2): full-depth warmup, t0.7 rows, k sweep
run spec_probe 3600 env LMRS_BENCH_CONFIG=gemma2-2b \
  LMRS_BENCH_QUANT=q8_0 python scripts/spec_probe.py

# 4. 9B flash crossover raw log (#6 / r4 weak #5)
run crossover_9b 3600 python scripts/flash_crossover.py gemma2-9b q4_0

# 5. prefill MFU sweep (#5)
run prefill_sweep 3600 python scripts/prefill_sweep.py

echo "=== runbook done $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
