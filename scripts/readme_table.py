#!/usr/bin/env python
"""Regenerate the README perf-table rows from results_r5/bench_*.log
(each log's last JSON line is the bench result).  Usage:
    python scripts/readme_table.py [results_r5]
"""

import glob
import json
import os
import sys

ROWS = [  # (log name, README label)
    ("bench_1b_q8", "Llama-3.2-1B Q8_0 | fast (W8A8), single-stream"),
    ("bench_2b_q4", "Gemma-2-2B Q4_0 | fast, single-stream"),
    ("bench_2b_q8", "Gemma-2-2B Q8_0 | fast, single-stream"),
    ("bench_3b_q4", "Llama-3.2-3B Q4_0 | fast, single-stream"),
    ("bench_3b_q8", "Llama-3.2-3B Q8_0 | fast, single-stream"),
    ("bench_phi_q8", "Phi-3.5-mini Q8_0 | fast, single-stream"),
    ("bench_phiv_q8",
     "Phi-3.5-vision Q8_0 | fast, single-stream (761-token image prefix)"),
    ("bench_9b_q4", "Gemma-2-9B Q4_0 | fast, single-stream"),
    ("bench_9b_q8", "Gemma-2-9B Q8_0 | fast (W8A8), single-stream"),
    ("bench_1b_b8", "Llama-3.2-1B Q8_0 | continuous batching ×8, aggregate"),
    ("bench_1b_b16",
     "Llama-3.2-1B Q8_0 | continuous batching ×16, aggregate"),
    ("bench_2b_b8", "Gemma-2-2B Q8_0 | continuous batching ×8, aggregate"),
    ("bench_9b_b4", "Gemma-2-9B Q4_0 | continuous batching ×4, aggregate"),
]


def last_json(path):
    out = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    out = json.loads(line)
                except json.JSONDecodeError:
                    pass
    return out


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "results_r5"
    print("| Model | Path | tok/s/chip | vs reference |")
    print("|---|---|---|---|")
    for name, label in ROWS:
        path = os.path.join(d, f"{name}.log")
        if not os.path.exists(path):
            print(f"| {label} | MISSING {name}.log | |")
            continue
        j = last_json(path)
        if j is None:
            print(f"| {label} | NO RESULT in {name}.log | |")
            continue
        v, vs = j["value"], j.get("vs_baseline")
        ref = round(v / vs, 1) if vs else "?"
        ref = int(ref) if isinstance(ref, float) and ref == int(ref) else ref
        print(f"| {label} | {v} | {vs}× ({ref}) |")


if __name__ == "__main__":
    main()
