#!/bin/bash
# Round-4 TPU measurement campaign — the committed-evidence run VERDICT r3
# called the single highest-leverage item.  Serial (one TPU job at a time);
# logs land in results_r4/ IN THE REPO so every number in README/RESULTS_r4
# traces to a committed raw log.  Continues past failures.
#
# Usage:  bash scripts/r4_tpu_runbook.sh [outdir]   (default results_r4)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-$REPO/results_r4}"
mkdir -p "$OUT"
cd "$REPO"

run() { # name timeout cmd...
  local name="$1" t="$2"; shift 2
  echo "=== $name (timeout ${t}s) $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  grep -v WARNING "$OUT/$name.log" | tail -n 4 | sed 's/^/    /'
  echo "--- $name rc=$rc" | tee -a "$OUT/summary.log"
  return $rc
}

run tunnel 120 python -c "import jax; print(jax.devices())" || {
  echo "TUNNEL DOWN — aborting runbook"; exit 1; }

# 1. driver-identical headline (gemma2-9b q4, 1k prompt, flash default)
run bench_9b_q4 2400 python bench.py

# 2. position-depth A/B: the round-3 59.1 -> 54.55 "drop" reconciliation
LMRS_BENCH_PROMPT=64 \
  run bench_9b_q4_p64 2400 python bench.py

# 3. flash-vs-einsum crossover on the 2B (9B's is committed from this
#    round's default-setting run)
run crossover_2b 2400 python scripts/flash_crossover.py gemma2-2b q4_0

# 4. long context, gemma-2b 32k: bf16 then int8 cache
#    (r3 target: pos-32k decode >= 80% of the 1k rate; was 59% pre-flash)
LMRS_MAX_SEQ_LEN=32768 \
  run longctx_2b_bf16 3600 python scripts/longctx_probe.py gemma2-2b q4_0 32768
LMRS_BENCH_KV=int8 \
  run longctx_2b_int8 3600 python scripts/longctx_probe.py gemma2-2b q4_0 32768

# 5. gemma-9b at 16k (r3 target >= 90% of its 1k rate; was 74%)
run longctx_9b_16k 4800 python scripts/longctx_probe.py gemma2-9b q4_0 16384

# 6. gemma-9b at 32k on the int8 cache — capacity headline #1: the bf16
#    cache (11.3 GB at 32k) does NOT fit beside the 4.9 GB Q4 weights on a
#    16 GB chip; int8 (5.6 GB) does
LMRS_BENCH_KV=int8 \
  run longctx_9b_int8_32k 6000 python scripts/longctx_probe.py gemma2-9b q4_0 32768

# 7. gemma-9b at 64k on the int4 cache — capacity headline #2 (8x the
#    reference's 8192 clamp, src/transformer.rs:157-160)
LMRS_BENCH_KV=int4 \
  run longctx_9b_int4_64k 7200 python scripts/longctx_probe.py gemma2-9b q4_0 65536

# 8. batched serving at B=16 (llama-1b q8)
LMRS_BENCH_CONFIG=llama3.2-1b LMRS_BENCH_QUANT=q8_0 LMRS_BENCH_BATCH=16 \
  run batched_b16 2400 python bench.py

# 9. paged pool vs contiguous at the same load (gemma-2b, B=8, 2k ctx,
#    pool = HALF the rows the contiguous cache preallocates)
LMRS_BENCH_CONFIG=gemma2-2b LMRS_BENCH_QUANT=q8_0 LMRS_BENCH_BATCH=8 \
LMRS_BENCH_MAX_CTX=2048 \
  run batched_2b_contig 2400 python bench.py
LMRS_BENCH_CONFIG=gemma2-2b LMRS_BENCH_QUANT=q8_0 LMRS_BENCH_BATCH=8 \
LMRS_BENCH_MAX_CTX=2048 LMRS_BENCH_POOL=8192 \
  run batched_2b_paged 2400 python bench.py

# 10. speculative probe (gemma-2b q8: repetitive vs random prompts)
LMRS_BENCH_CONFIG=gemma2-2b LMRS_BENCH_QUANT=q8_0 \
  run spec_probe 2400 python scripts/spec_probe.py

# 11. the MXU weight-stream wall (DESIGN §1's load-bearing number)
run mxu_wall 1200 python scripts/mxu_wall.py

echo "runbook done $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
