"""Bisect the decode-step time on the real TPU.

Times (each as ONE jitted program, repeated with async dispatch):
  0. trivial op               -> per-dispatch overhead
  1. full fwd (fast pallas)   -> the production decode step
  2. full fwd (exact XLA)     -> comparison
  3. fwd without cache update -> isolates KV-cache DUS cost
  4. 1-layer fwd              -> per-layer cost

Usage: python scripts/bisect_decode.py [config] [quant]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from lmrs_tpu.config import PRESETS
    from lmrs_tpu.io.synthetic import random_weights
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.models.transformer import forward, init_kv_cache, embed_tokens
    from lmrs_tpu.quant import QuantType

    config = sys.argv[1] if len(sys.argv) > 1 else "llama3.2-1b"
    quant = {"q8_0": QuantType.Q8_0, "q4_0": QuantType.Q4_0}[
        sys.argv[2] if len(sys.argv) > 2 else "q8_0"]

    print("devices:", jax.devices(), flush=True)

    # 0. dispatch overhead
    f0 = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8, 128), jnp.float32)
    print(f"dispatch overhead: {timeit(f0, x0, iters=50)*1e6:.0f} us",
          flush=True)

    cfg = PRESETS[config](quant=quant, matmul_impl="fast")
    t0 = time.perf_counter()
    weights = random_weights(cfg, seed=0)
    params = params_from_weights(cfg, weights, fuse_qkv=True)
    jax.block_until_ready(jax.tree_util.tree_leaves(params))
    print(f"weights ready in {time.perf_counter()-t0:.0f}s", flush=True)

    cache = init_kv_cache(cfg, jnp.bfloat16)
    x = jnp.zeros((1, cfg.dim), jnp.float32)
    pos = jnp.int32(100)
    ATTN = 256

    from functools import partial

    @partial(jax.jit, donate_argnames=("cache",))
    def fwd(params, cache, x, pos):
        return forward(params, cfg, cache, x, pos, ATTN, jnp.int32(0))

    t0 = time.perf_counter()
    logits, cache = fwd(params, cache, x, pos)
    jax.block_until_ready((logits, cache.k))
    print(f"fwd compile: {time.perf_counter()-t0:.0f}s", flush=True)

    # timed loop with donation: rebind cache each call
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        logits, cache = fwd(params, cache, x, pos)
    jax.block_until_ready((logits, cache.k))
    dt = (time.perf_counter() - t0) / iters
    nbytes = sum(l.nbytes for l in jax.tree_util.tree_leaves(params))
    print(f"FULL fwd (fast): {dt*1e3:8.2f} ms  "
          f"weights {nbytes/1e9:.2f} GB -> {nbytes/dt/1e9:.0f} GB/s",
          flush=True)

    # logits only, no cache return (lets XLA drop cache writes? no - DUS still
    # feeds attention; but no donation round trip)
    @jax.jit
    def fwd_nocache(params, cache, x, pos):
        logits, _ = forward(params, cfg, cache, x, pos, ATTN, jnp.int32(0))
        return logits

    cache2 = init_kv_cache(cfg, jnp.bfloat16)
    dt = timeit(fwd_nocache, params, cache2, x, pos)
    print(f"fwd (no cache out): {dt*1e3:8.2f} ms", flush=True)

    # single matmul of each shape, standalone (includes dispatch overhead)
    from lmrs_tpu.ops.matmul import qmatmul
    lw = jax.tree_util.tree_map(lambda a: a, params.layers)
    first = params.layers if not isinstance(params.layers, (list, tuple)) \
        else params.layers[0]
    for name in ("wqkv", "wo", "w13", "w2"):
        qt = getattr(first, name)
        if qt is None:
            continue
        f = jax.jit(lambda xx, qt=qt: qmatmul(xx, qt, "fast"))
        xx = jnp.zeros((1, qt.in_features), jnp.float32)
        dt = timeit(f, xx)
        nb = qt.q.nbytes + (qt.s.nbytes if qt.s is not None else 0)
        print(f"  {name} {qt.logical_shape}: {dt*1e6:8.0f} us "
              f"({nb/1e6:.1f} MB)", flush=True)
    emb = params.embed
    f = jax.jit(lambda xx: qmatmul(xx, emb, "fast"))
    xx = jnp.zeros((1, emb.in_features), jnp.float32)
    dt = timeit(f, xx)
    print(f"  classifier {emb.logical_shape}: {dt*1e6:8.0f} us "
          f"({emb.q.nbytes/1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
