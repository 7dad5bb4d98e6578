#!/bin/bash
# Round-5 campaign, part 6: the small-T branch A/B + prefill limiter.
# spec_probe2 showed k=3 speculation LOSING at 33% acceptance (160 vs
# 205 tok/s plain): the K-major 2<=T<=8 xe verify forward costs ~2x the
# T=1 VPU matvec, breaking speculation's "T=k+1 is nearly free" premise
# (and throttling batched x8).  qmatmul_kmajor now routes 2<=T<=8
# through the s@E kernels by default (LMRS_VM_SMALL_T=xe restores).
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

# spec with the s@E small-T verify path (new default)
run spec_probe_se 3600 env LMRS_BENCH_CONFIG=gemma2-2b \
  LMRS_BENCH_QUANT=q8_0 python scripts/spec_probe.py

# batched x8 with the s@E small-T path (t=B=8 decode steps)
run bench_1b_b8_se 2400 env LMRS_BENCH_CONFIG=llama3.2-1b \
  LMRS_BENCH_QUANT=q8_0 LMRS_BENCH_BATCH=8 python bench.py

# prefill kernel-only MFU on the production s@E kernels (limiter split)
run prefill_limiter 3600 python scripts/prefill_limiter.py 256 q4_0

# and the same at T=8 for the small-T story, both branches
run smallt_se 1800 python scripts/prefill_limiter.py 8 q8_0
run smallt_xe 1800 env LMRS_VM_SMALL_T=xe \
  python scripts/prefill_limiter.py 8 q8_0

echo "=== campaign-rest5 done $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
