#!/usr/bin/env python
"""Prefill MFU sweep (round-5 VERDICT #5): prefill_chunk 256/512/1024 on
the flagship shapes, steady-state tok/s + model-FLOPs utilization.

MFU accounting (bf16 peak 197 TFLOP/s on TPU v5e): per prefill token the
matmul path moves 2 FLOPs/value over every layer weight (the classifier
runs once per CHUNK — its cost is amortized and reported separately);
attention adds 4*pos*H*hd FLOPs/token averaged over the prompt.  The
reference prefillss one token per forward pass (chat.rs:187-198), so any
chunked number beats it structurally; this sweep finds OUR ceiling.

Timing: host-fetch of the returned logits; the engine's own prefill
metrics cross-check.  First prefill per chunk size compiles + warms; the
timed run starts from reset() steady state.

Usage (TPU): [LMRS_BENCH_CONFIG=gemma2-9b] [LMRS_SWEEP_PROMPT=4096]
             python scripts/prefill_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lmrs_tpu.config import PRESETS
    from lmrs_tpu.io.lmrs import read_lmrs
    from lmrs_tpu.io.params import params_from_lmrs
    from lmrs_tpu.io.synthetic import write_synthetic_lmrs
    from lmrs_tpu.kernels.vpu_matvec import kmajor_params
    from lmrs_tpu.quant import QuantType
    from lmrs_tpu.runtime.engine import Engine

    config_name = os.environ.get("LMRS_BENCH_CONFIG", "gemma2-9b")
    quant_name = os.environ.get("LMRS_BENCH_QUANT", "q4_0").lower()
    n_prompt = int(os.environ.get("LMRS_SWEEP_PROMPT", "4096"))
    cache_dir = os.environ.get("LMRS_BENCH_CACHE_DIR", "/tmp/lmrs_tpu_bench")
    quant = {"q4_0": QuantType.Q4_0, "q8_0": QuantType.Q8_0}[quant_name]
    cfg = PRESETS[config_name](quant=quant, matmul_impl="fast")
    path = os.path.join(cache_dir, f"{config_name}-{quant_name}.lmrs")
    if not os.path.exists(path):
        os.makedirs(cache_dir, exist_ok=True)
        write_synthetic_lmrs(path + ".tmp", cfg, seed=0)
        os.replace(path + ".tmp", path)
    f = read_lmrs(path)
    cfg = f.cfg.replace(matmul_impl="fast")
    params = kmajor_params(params_from_lmrs(f, fuse_qkv=True))

    # per-token matmul FLOPs (layers only; classifier amortized per chunk)
    d, hid = cfg.dim, cfg.hidden_dim
    qkv_o = (cfg.n_heads + 2 * cfg.n_kv_heads) * cfg.head_dim
    vals_layer = (d * qkv_o + cfg.n_heads * cfg.head_dim * d
                  + 2 * d * hid + hid * d)
    flops_tok = 2 * vals_layer * cfg.n_layers
    cls_flops_chunk = 2 * d * cfg.vocab_size
    attn_flops_tok = (4 * n_prompt / 2) * cfg.n_heads * cfg.head_dim
    print(f"{config_name} {quant_name} prompt={n_prompt} "
          f"matmul={flops_tok/1e9:.1f} GF/tok "
          f"attn~{attn_flops_tok/1e9:.1f} GF/tok dev={jax.devices()}",
          flush=True)

    rng = np.random.default_rng(0)
    prompt = list(rng.integers(3, cfg.vocab_size - 1, size=n_prompt))
    PEAK = 197e12

    for chunk in (256, 512, 1024):
        eng = Engine(cfg, params, cache_dtype=jnp.bfloat16,
                     prefill_chunk=chunk, decode_chunk=32)
        # compile + warm — HOST-FETCH the warm logits: through the axon
        # tunnel, dispatch returning does NOT mean the server-side
        # (Mosaic) build finished, and an unsynced warm run leaks compile
        # seconds into the first timed run (the 210 s chunk=256 artifact
        # in the first committed sweep)
        np.asarray(eng.prefill(prompt))
        eng.reset()
        np.asarray(eng.prefill(prompt))  # second warm: steady state
        times = []
        for _ in range(3):
            eng.reset()
            t0 = time.perf_counter()
            logits = eng.prefill(prompt)
            np.asarray(logits)           # host fetch = completion barrier
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]            # median of 3
        toks = n_prompt / dt
        n_chunks = (n_prompt + chunk - 1) // chunk
        mfu = (flops_tok + attn_flops_tok
               + cls_flops_chunk * n_chunks / n_prompt) * toks / PEAK
        print(json.dumps({
            "prefill_chunk": chunk, "tok_s": round(toks, 1),
            "ms_total": round(dt * 1e3, 1), "mfu_pct": round(100 * mfu, 1),
            "runs_ms": [round(t * 1e3, 1) for t in times],
            "ttft_engine_s": round(eng.metrics.prefill_seconds, 3)}),
            flush=True)
        del eng


if __name__ == "__main__":
    main()
