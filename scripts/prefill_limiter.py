#!/usr/bin/env python
"""Prefill MFU decomposition (VERDICT r4 #5's "name the limiter").

The corrected sweep (results_r5/prefill_sweep.log) measured gemma-9b Q4
prefill at 39.8% MFU with chunk=256 (the best configuration, flash
prefill path).  This probe times the PRODUCTION prefill matmul kernel
(qmatmul_kmajor at t_q=256, the s@E K-major kernels) in isolation on the
four gemma-9b layer shapes, with the round's timing rules (per-call
varying inputs via 1e-6-scaled feedback, chain-length delta, one host
fetch per bracket).  kernel-only MFU vs the sweep's end-to-end MFU
splits the loss between "inside the matmul kernels" (dequant + issue
structure) and "everything else" (attention, norms/rope, cache writes,
inter-chunk glue).

Usage (TPU): python scripts/prefill_limiter.py [t_q=256] [q4_0|q8_0]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R = 4
PEAK = 197e12
# chain length is sized PER SHAPE so one program call does ~30 ms of
# work: at small T a single matmul is tens of µs, far below the tunnel's
# per-dispatch noise, and the first committed run of this probe measured
# NEGATIVE deltas (results_r5/smallt_*.log first runs)
TARGET_S = 0.03


if __name__ == "__main__":
    from lmrs_tpu.config import PRESETS
    from lmrs_tpu.kernels.vpu_matvec import qmatmul_kmajor, to_kmajor
    from lmrs_tpu.quant import (QTensor, QuantType, q4_file_to_runtime_np,
                                quantize_q40_np, quantize_q80_np)

    t_q = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    quant_name = sys.argv[2] if len(sys.argv) > 2 else "q4_0"
    qtype = {"q4_0": QuantType.Q4_0, "q8_0": QuantType.Q8_0}[quant_name]
    cfg = PRESETS["gemma2-9b"]()
    gs = cfg.group_size
    d, hid = cfg.dim, cfg.hidden_dim
    qkv_o = (cfg.n_heads + 2 * cfg.n_kv_heads) * cfg.head_dim
    shapes = [("wqkv", qkv_o, d),
              ("wo", d, cfg.n_heads * cfg.head_dim),
              ("w13", 2 * hid, d),
              ("w2", d, hid)]
    rng = np.random.default_rng(0)
    print(f"== prefill kernel wall t_q={t_q} {quant_name} "
          f"dev={jax.devices()}", flush=True)

    total_dt = 0.0
    total_flop = 0.0
    for name, o, n in shapes:
        w = rng.normal(0, 0.02, (o, n)).astype(np.float32)
        if qtype == QuantType.Q4_0:
            q4, s4, _ = quantize_q40_np(w, gs)
            qt = QTensor(jnp.asarray(q4_file_to_runtime_np(
                             q4.reshape(o, n // 2), gs)),
                         jnp.asarray(s4.reshape(o, n // gs), jnp.float32),
                         QuantType.Q4_0, gs, o, n)
        else:
            q8, s8, _ = quantize_q80_np(w, gs)
            qt = QTensor(jnp.asarray(q8.reshape(o, n)),
                         jnp.asarray(s8.reshape(o, n // gs), jnp.float32),
                         QuantType.Q8_0, gs, o, n)
        km = to_kmajor(qt)
        x = jnp.asarray(rng.normal(0, 1, (t_q, n)).astype(jnp.float32))
        # size the in-program chain so one call ~ TARGET_S of real work
        # (assume ~400 G values/s to estimate)
        n_chain = int(max(8, min(4096, TARGET_S / (o * n / 400e9))))

        @jax.jit
        def prog(km, x):
            def body(x, _):
                y = qmatmul_kmajor(x, km, 0)
                # per-call-varying feedback ABOVE f32 ulp so chained
                # iterations never repeat input values bit-exactly
                # (results_r5/timing_cache_note.md)
                return x * (1.0 + 1e-6 * jnp.tanh(jnp.mean(y))), None

            x, _ = jax.lax.scan(body, x, length=n_chain)
            return x

        y = prog(km, x)
        np.asarray(y)                   # compile + settle (host fetch)
        np.asarray(prog(km, y))         # second warm from fresh values

        def run(reps, z):
            t0 = time.perf_counter()
            for _ in range(reps):
                z = prog(km, z)
            np.asarray(z)
            return time.perf_counter() - t0, z

        deltas = []
        z = x * 1.0000013
        for _ in range(3):
            t1, z = run(1, z)
            tm, z = run(1 + R, z)
            deltas.append((tm - t1) / (R * n_chain))
        dt = sorted(deltas)[1]
        flop = 2.0 * o * n * t_q
        total_dt += dt
        total_flop += flop
        print(json.dumps({
            "shape": name, "o": o, "n": n, "t_q": t_q, "n_chain": n_chain,
            "deltas_us": [round(d * 1e6, 1) for d in deltas],
            "us_per_call": round(dt * 1e6, 1),
            "tflop_s": round(flop / dt / 1e12, 1),
            "mfu_pct": round(100 * flop / dt / PEAK, 1)}), flush=True)

    # matmul-kernel-only prefill ceiling for one chunk of t_q tokens:
    # every layer runs the 4 matmuls; classifier once per chunk
    chunk_ms = total_dt * cfg.n_layers * 1e3
    print(json.dumps({
        "summary": "kernel-only", "t_q": t_q,
        "layer_matmul_ms_per_chunk": round(chunk_ms, 1),
        "kernel_mfu_pct": round(100 * total_flop / total_dt / PEAK, 1),
        "implied_prefill_tok_s": round(
            t_q / (chunk_ms / 1e3), 1)}), flush=True)
