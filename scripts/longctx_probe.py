"""Long-context decode probe: tok/s vs position, past the reference's 8192.

The reference hard-clamps seq_len to 8192 (host-RAM f32 cache,
src/transformer.rs:157-160); lmrs_tpu lifts that (io/lmrs.py max_seq_len).
This measures what long context costs: decode throughput at pos ~1k vs ~8k
vs deep into the extended window (fast-precision bf16 attention reads the
cache without an f32 upcast pass).

Usage:
  python scripts/longctx_probe.py [config=gemma2-2b] [quant=q4_0] [S=32768]

Uses the bench's cached synthetic .lmrs (generates if missing).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    config_name = sys.argv[1] if len(sys.argv) > 1 else "gemma2-2b"
    quant_name = sys.argv[2] if len(sys.argv) > 2 else "q4_0"
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 32768

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lmrs_tpu.config import PRESETS
    from lmrs_tpu.io.lmrs import read_lmrs
    from lmrs_tpu.io.params import params_from_lmrs
    from lmrs_tpu.io.synthetic import write_synthetic_lmrs
    from lmrs_tpu.quant import QuantType
    from lmrs_tpu.runtime.compile_cache import enable_compilation_cache
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig

    enable_compilation_cache()
    quant = {"q4_0": QuantType.Q4_0, "q8_0": QuantType.Q8_0}[quant_name]
    cache_dir = os.environ.get("LMRS_BENCH_CACHE_DIR", "/tmp/lmrs_tpu_bench")
    path = os.path.join(cache_dir, f"{config_name}-{quant_name}.lmrs")
    if not os.path.exists(path):
        cfg0 = PRESETS[config_name](quant=quant)
        os.makedirs(cache_dir, exist_ok=True)
        write_synthetic_lmrs(path + ".tmp", cfg0, seed=0)
        os.replace(path + ".tmp", path)

    f = read_lmrs(path)
    # extend the context window beyond the header's 8192; scan-fast layout
    # (the serving default)
    f.cfg = f.cfg.replace(seq_len=S, matmul_impl="fast", fuse_ffn=False)
    params = params_from_lmrs(f, stack_layers=True, fuse_qkv=True)
    jax.block_until_ready(jax.tree_util.tree_leaves(params))
    print(f"{config_name} {quant_name} seq_len={S} "
          f"device={jax.devices()[0]}", flush=True)

    from lmrs_tpu.runtime.engine import CACHE_DTYPES
    cache_dtype = CACHE_DTYPES[os.environ.get("LMRS_BENCH_KV", "bfloat16")]
    eng = Engine(f.cfg, params, cache_dtype=cache_dtype, decode_chunk=32,
                 prefill_chunk=256)
    kv_gb = (eng.cache.k.nbytes + eng.cache.v.nbytes) / 1e9
    print(f"KV cache: {kv_gb:.1f} GB", flush=True)

    rng = np.random.default_rng(0)
    n_new = 192
    gen = GenerationConfig(temperature=0.0, max_new_tokens=n_new)
    positions = [1024, 8192, S - n_new - 8]  # steady-state: 6 decode chunks
    results = {}
    for target in positions:
        n_prompt = target - 1
        prompt = list(rng.integers(3, f.cfg.vocab_size - 1, size=n_prompt))
        eng.reset()
        t0 = time.time()
        warm = eng.generate(prompt, gen)   # compiles this bucket set
        t_warm = time.time() - t0
        eng.reset()
        out = eng.generate(prompt, gen)
        m = eng.metrics
        toks = m.tokens_per_second
        results[target] = toks
        print(f"pos≈{target:6d}: decode {toks:6.1f} tok/s  "
              f"prefill {m.prefill_tokens / m.prefill_seconds:7.0f} tok/s  "
              f"(warmup {t_warm:.0f}s)", flush=True)
    base = results[positions[0]]
    deep = results[positions[-1]]
    print(f"decode at pos {positions[-1]} is {deep / base * 100:.0f}% of "
          f"pos {positions[0]}", flush=True)


if __name__ == "__main__":
    main()
