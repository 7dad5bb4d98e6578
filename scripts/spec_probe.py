#!/usr/bin/env python
"""Speculative-decoding probe: acceptance rate + tok/s vs plain greedy.

Prompt-lookup speculation pays off when generations echo the context
(chat, code, RAG, summarization).  Random-token benches accept ~nothing,
so this probe uses a REPETITIVE synthetic prompt (a cycled token pattern)
— greedy tiny/real models continue patterns, and any looping generation
is the best case — alongside a random prompt as the worst case.

Usage (TPU):
  LMRS_BENCH_CONFIG=gemma2-2b LMRS_BENCH_QUANT=q8_0 python scripts/spec_probe.py
Env: LMRS_SPEC_K (default 7), LMRS_BENCH_TOKENS (default 192).
"""

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
    from lmrs_tpu.quant import QuantType
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig

    config_name = os.environ.get("LMRS_BENCH_CONFIG", "gemma2-2b")
    quant_name = os.environ.get("LMRS_BENCH_QUANT", "q8_0").lower()
    n_tokens = int(os.environ.get("LMRS_BENCH_TOKENS", "192"))
    k = int(os.environ.get("LMRS_SPEC_K", "7"))
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
    params_row = params_from_lmrs(f, fuse_qkv=True)  # batched scheduler
    from lmrs_tpu.kernels.vpu_matvec import kmajor_params
    # single-stream production decode layout (donate=False keeps the
    # row-major copy alive for the batched section below)
    params = kmajor_params(params_row, donate=False)
    eng = Engine(cfg, params, cache_dtype=jnp.bfloat16, decode_chunk=32)
    print(f"{config_name} {quant_name} k={k} device={jax.devices()[0]}",
          flush=True)

    rng = np.random.default_rng(0)
    pattern = list(rng.integers(3, cfg.vocab_size - 1, size=24))
    prompts = {
        "repetitive": (pattern * 12)[:256],
        "random": list(rng.integers(3, cfg.vocab_size - 1, size=256)),
    }

    # MEASUREMENT RULE (round-4 VERDICT weak #1): warm every configuration
    # across the FULL generation depth before timing — a 16-token warmup
    # leaves the deeper attention buckets uncompiled and the first timed
    # run eats their compiles (the round-4 "+47%" artifact).  Timed runs
    # start from clean steady state; plain baselines must then agree
    # across workloads within noise.
    def timed(prompt, gen):
        eng.reset()
        eng.generate(prompt, gen)          # full-depth warm (compiles)
        eng.reset()
        t0 = time.perf_counter()
        out = eng.generate(prompt, gen)
        dt = time.perf_counter() - t0
        return out, dt

    for name, prompt in prompts.items():
        for label, gen in [
            ("plain", GenerationConfig(temperature=0.0,
                                       max_new_tokens=n_tokens)),
            ("spec", GenerationConfig(temperature=0.0,
                                      max_new_tokens=n_tokens,
                                      speculative_k=k)),
            # the reference ships --temperature 0.7 as its default
            # (src/bin/chat.rs:25): rejection sampling makes --spec-k
            # apply there too
            ("plain-t0.7", GenerationConfig(temperature=0.7, top_p=0.9,
                                            seed=5,
                                            max_new_tokens=n_tokens)),
            ("spec-t0.7", GenerationConfig(temperature=0.7, top_p=0.9,
                                           seed=5, max_new_tokens=n_tokens,
                                           speculative_k=k)),
        ]:
            out, dt = timed(prompt, gen)
            m = eng.metrics
            acc = (f" accept={m.spec_accepted}/{m.spec_proposed}"
                   f" ({m.spec_accepted / max(1, m.spec_proposed):.0%})"
                   if m.spec_proposed else "")
            print(f"{name:11s} {label:10s}: {len(out) / dt:7.1f} tok/s "
                  f"({len(out)} tokens in {dt:.2f}s){acc}", flush=True)

    # acceptance-vs-k sweep (greedy, repetitive prompt = best case)
    for kk in (3, 5, 7):
        gen = GenerationConfig(temperature=0.0, max_new_tokens=n_tokens,
                               speculative_k=kk)
        out, dt = timed(prompts["repetitive"], gen)
        m = eng.metrics
        print(f"k={kk}: {len(out) / dt:7.1f} tok/s accept="
              f"{m.spec_accepted}/{m.spec_proposed} "
              f"({m.spec_accepted / max(1, m.spec_proposed):.0%})",
              flush=True)

    # batched speculation: B greedy streams sharing one scheduler.
    # Free the single-stream engine FIRST — on 9B its full-context cache
    # plus the scheduler's batched cache OOMs the chip
    del eng
    import gc
    gc.collect()
    from lmrs_tpu.serve.scheduler import BatchScheduler

    B = int(os.environ.get("LMRS_SPEC_BATCH", "4"))
    for label, sk in [("plain", 0), ("spec", k)]:
        sched = BatchScheduler(cfg, params_row, max_batch=B, max_ctx=1024,
                               cache_dtype=jnp.bfloat16, decode_chunk=16,
                               temperature=0.0, speculative_k=sk)
        done = {}
        for i in range(B):
            sched.submit(prompts["repetitive"][:256],
                         max_new_tokens=n_tokens,
                         on_done=lambda o, i=i: done.setdefault(i, o))
        sched.run()   # includes compile; timed run below
        done.clear()
        t0 = time.perf_counter()
        for i in range(B):
            sched.submit(prompts["repetitive"][:256],
                         max_new_tokens=n_tokens,
                         on_done=lambda o, i=i: done.setdefault(i, o))
        sched.run()
        dt = time.perf_counter() - t0
        total = sum(len(v) for v in done.values())
        acc = (f" accept={sched.spec_accepted}/{sched.spec_proposed}"
               if sched.spec_proposed else "")
        print(f"batched x{B} {label:5s}: {total / dt:7.1f} aggregate tok/s"
              f" ({total} tokens in {dt:.2f}s){acc}", flush=True)


def dataclass_replace(gen, **kw):
    import dataclasses
    return dataclasses.replace(gen, **kw)


if __name__ == "__main__":
    main()
