#!/bin/bash
# Round-5 campaign, part 4: re-runs + remaining evidence after the
# K-major O-padding fix (commit bc3bedb).
#   1. bench_phi_q8 / bench_phiv_q8 — crashed pre-fix (Mosaic rejected
#      the 192-wide output tile Phi's vocab 32064 forced)
#   2. spec_probe — crashed pre-902fe35 (probe built unfused params)
#   3. warm_ttft — VERDICT #4's "<60 s warm-process TTFT" artifact on
#      the real serving surface
#   4. glue_breakdown — in-context glue pricing behind DESIGN 1b
# Logs append to results_r5/; same run() contract as the earlier parts.
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

run bench_phi_q8 2400 env LMRS_BENCH_CONFIG=phi3.5-mini \
  LMRS_BENCH_QUANT=q8_0 python bench.py
run bench_phiv_q8 2400 env LMRS_BENCH_CONFIG=phi3.5-vision \
  LMRS_BENCH_QUANT=q8_0 python bench.py

run spec_probe 3600 env LMRS_BENCH_CONFIG=gemma2-2b \
  LMRS_BENCH_QUANT=q8_0 python scripts/spec_probe.py

run warm_ttft 1200 env LMRS_BENCH_CONFIG=gemma2-2b \
  LMRS_BENCH_QUANT=q8_0 python scripts/warm_ttft.py

run glue_breakdown 3600 env LMRS_BENCH_CONFIG=gemma2-2b \
  LMRS_BENCH_QUANT=q8_0 python scripts/glue_breakdown.py

# re-run with host-synced warm runs + median-of-3 (the first sweep's
# chunk=256 row timed leftover server-side Mosaic builds: 210 s)
run prefill_sweep 3600 python scripts/prefill_sweep.py

echo "=== campaign-rest3 done $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
