"""Delta-method bisect of the decode step on the real TPU.

The axon tunnel makes single-call timing useless (async enqueue, ~30ms
fetch round trips, block_until_ready can return early).  So: chain N
forwards through the donated KV cache, sync with ONE pre-compiled tiny
fetch, and compare N=5 vs N=35 — the delta is pure device time.

Usage: python scripts/bisect_decode2.py [config] [quant] [impl] [layout]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from functools import partial

    from lmrs_tpu.config import PRESETS
    from lmrs_tpu.io.synthetic import random_weights
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.models.transformer import forward, init_kv_cache
    from lmrs_tpu.quant import QuantType

    config = sys.argv[1] if len(sys.argv) > 1 else "llama3.2-1b"
    quant = {"q8_0": QuantType.Q8_0, "q4_0": QuantType.Q4_0,
             "none": QuantType.NONE}[
        sys.argv[2] if len(sys.argv) > 2 else "q8_0"]
    impl = sys.argv[3] if len(sys.argv) > 3 else "fast"
    layout = sys.argv[4] if len(sys.argv) > 4 else "scan"

    print(f"== {config} {quant.name} impl={impl} layout={layout}", flush=True)
    print("devices:", jax.devices(), flush=True)

    cfg = PRESETS[config](quant=quant, matmul_impl=impl)
    t0 = time.perf_counter()
    weights = random_weights(cfg, seed=0)
    # "scan" = stacked + fused (scalar-prefetch kernels, the serving
    # default); "unrolled" = per-layer call sites; "stacked" = exact-style
    params = params_from_weights(cfg, weights,
                                 stack_layers=(layout != "unrolled"),
                                 fuse_qkv=(layout in ("unrolled", "scan")))
    jax.block_until_ready(jax.tree_util.tree_leaves(params))
    nbytes = sum(l.nbytes for l in jax.tree_util.tree_leaves(params))
    print(f"weights ready in {time.perf_counter()-t0:.0f}s "
          f"({nbytes/1e9:.2f} GB)", flush=True)

    cache = init_kv_cache(cfg, jnp.bfloat16)
    x = jnp.zeros((1, cfg.dim), jnp.float32)
    ATTN = 256

    @partial(jax.jit, donate_argnames=("cache",))
    def fwd(params, cache, x, pos):
        return forward(params, cfg, cache, x, pos, ATTN, jnp.int32(0))

    @jax.jit
    def reduce_tiny(v):
        return jnp.sum(v[:64])

    def run(n_steps, cache):
        t0 = time.perf_counter()
        for i in range(n_steps):
            logits, cache = fwd(params, cache, x, jnp.int32(100 + i))
        v = float(reduce_tiny(logits))
        return time.perf_counter() - t0, cache

    t0 = time.perf_counter()
    _, cache = run(1, cache)
    print(f"compile+first: {time.perf_counter()-t0:.0f}s", flush=True)
    _, cache = run(2, cache)

    t5, cache = run(5, cache)
    t35, cache = run(35, cache)
    per = (t35 - t5) / 30
    print(f"chain 5: {t5*1e3:.1f} ms; chain 35: {t35*1e3:.1f} ms", flush=True)
    print(f"per-token true: {per*1e3:.2f} ms -> {1/per:.1f} tok/s  "
          f"({nbytes/per/1e9:.0f} GB/s effective)", flush=True)


if __name__ == "__main__":
    main()
