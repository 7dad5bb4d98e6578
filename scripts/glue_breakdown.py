#!/usr/bin/env python
"""In-context glue breakdown: time the REAL engine decode loop with
individual glue components replaced by identities, fresh process per
variant (jit wrappers must retrace).  The difference full-vs-variant
prices that component IN CONTEXT — the isolated-component chains of
decode_breakdown.py can't see serialization against the kernels.

Variants: full | nonorm (rmsnorm→identity) | norope (rope→identity) |
noprep (qmatmul uses a constant pre-prepped activation — prices the
per-matmul x-prep transpose+corr AND detaches the kernels from the
activation chain, so it is an UPPER bound on prep cost).

Usage (TPU): python scripts/glue_breakdown.py            # runs all
             python scripts/glue_breakdown.py <variant>  # one, in-proc
Env: LMRS_BENCH_CONFIG (default gemma2-2b), LMRS_BENCH_QUANT.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ("full", "nonorm", "norope", "noprep")


def run_variant(variant: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    # ---- monkeypatch BEFORE any tracing -----------------------------
    if variant == "nonorm":
        import lmrs_tpu.models.transformer as tr

        tr.rmsnorm = lambda x, w, eps, unit_offset=True: x
    elif variant == "norope":
        import lmrs_tpu.models.transformer as tr

        tr.apply_rope = lambda x, cos, sin: x
    elif variant == "noprep":
        import lmrs_tpu.kernels.vpu_matvec as vm

        orig = vm.qmatmul_kmajor

        def patched(x, w, layer_idx, **kw):
            # broadcast-of-scalar activation: keeps the value chain alive
            # (so the platform's value-keyed execution cache can't serve
            # repeat chunks) while XLA folds the prep's
            # transpose-of-broadcast into a broadcast — the kernels still
            # stream every weight byte
            flat = x.mean() + jnp.zeros_like(x)
            return orig(flat, w, layer_idx, **kw)

        vm.qmatmul_kmajor = patched
        import lmrs_tpu.models.transformer as tr
        if hasattr(tr, "qmatmul_kmajor"):
            tr.qmatmul_kmajor = patched

    from lmrs_tpu.config import PRESETS
    from lmrs_tpu.io.lmrs import read_lmrs
    from lmrs_tpu.io.params import params_from_lmrs
    from lmrs_tpu.io.synthetic import write_synthetic_lmrs
    from lmrs_tpu.kernels.vpu_matvec import kmajor_params
    from lmrs_tpu.quant import QuantType
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig

    config_name = os.environ.get("LMRS_BENCH_CONFIG", "gemma2-2b")
    quant_name = os.environ.get("LMRS_BENCH_QUANT", "q4_0").lower()
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
    eng = Engine(cfg, params, cache_dtype=jnp.bfloat16, decode_chunk=32)
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(3, cfg.vocab_size - 1, size=1024))
    gen = GenerationConfig(temperature=0.0, max_new_tokens=192)
    eng.generate(prompt, gen)        # compile + warm, full depth
    eng.reset()
    t0 = time.perf_counter()
    out = eng.generate(prompt, gen)
    m = eng.metrics
    rate = m.decode_tokens / m.decode_seconds
    print(json.dumps({"variant": variant, "decode_tok_s": round(rate, 1),
                      "ms_per_tok": round(1e3 / rate, 2),
                      "n": len(out)}), flush=True)


def main():
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
        return
    for v in VARIANTS:
        r = subprocess.run([sys.executable, os.path.abspath(__file__), v],
                           capture_output=True, text=True, timeout=3000)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode != 0:
            print(json.dumps({"variant": v, "error":
                              r.stderr.strip().splitlines()[-1:]}),
                  flush=True)


if __name__ == "__main__":
    main()
