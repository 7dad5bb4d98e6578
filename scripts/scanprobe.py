"""Why are decode steps inside lax.scan ~20x slower than dispatched singly?

Delta-times scan programs of length 8 vs 32 (same compiled body) to get
true per-step time, for:
  A. full chunk body (embed -> forward -> argmax), like Engine._decode_chunk
  B. forward only (fixed x, no embed/sampling)
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lmrs_tpu.config import PRESETS
from lmrs_tpu.io.synthetic import random_weights
from lmrs_tpu.io.params import params_from_weights
from lmrs_tpu.models.transformer import forward, init_kv_cache, embed_tokens
from lmrs_tpu.ops.sampling import sample_argmax
from lmrs_tpu.quant import QuantType

print("devices:", jax.devices(), flush=True)

cfg = PRESETS["llama3.2-1b"](quant=QuantType.Q8_0, matmul_impl="fast")
t0 = time.perf_counter()
params = params_from_weights(cfg, random_weights(cfg, seed=0),
                             stack_layers=False, fuse_qkv=True)
jax.block_until_ready(jax.tree_util.tree_leaves(params))
print(f"weights ready in {time.perf_counter()-t0:.0f}s", flush=True)

ATTN = 256


@partial(jax.jit, static_argnames=("n_steps",), donate_argnames=("cache",))
def chunk_full(params, cache, token, pos, n_steps):
    def step(carry, _):
        tok, p, cache = carry
        x = embed_tokens(params, cfg, tok[None])
        logits, cache = forward(params, cfg, cache, x, p, ATTN, jnp.int32(0))
        nxt = sample_argmax(logits)
        return (nxt, p + 1, cache), nxt
    (tok, p, cache), toks = jax.lax.scan(
        step, (token, pos, cache), length=n_steps)
    return toks, cache


@partial(jax.jit, static_argnames=("n_steps",), donate_argnames=("cache",))
def chunk_fwd(params, cache, x, pos, n_steps):
    def step(carry, _):
        x, p, cache = carry
        logits, cache = forward(params, cfg, cache, x, p, ATTN, jnp.int32(0))
        x = x * 0.0 + logits[None, :cfg.dim] * 1e-30
        return (x, p + 1, cache), logits[0]
    (x, p, cache), ls = jax.lax.scan(step, (x, pos, cache), length=n_steps)
    return ls, cache


@jax.jit
def fetch(toks):
    return jnp.sum(toks)


def timed(fn, *args, n_steps):
    t0 = time.perf_counter()
    toks, cache = fn(*args, n_steps=n_steps)
    _ = float(fetch(toks))
    return time.perf_counter() - t0, cache


for name, fn, seed_arg in (
        ("full", chunk_full, jnp.int32(7)),
        ("fwd ", chunk_fwd, jnp.zeros((1, cfg.dim), jnp.float32))):
    cache = init_kv_cache(cfg, jnp.bfloat16)
    t0 = time.perf_counter()
    dt8, cache = timed(fn, params, cache, seed_arg, jnp.int32(10), n_steps=8)
    print(f"{name} compile8+run: {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    dt32, cache = timed(fn, params, cache, seed_arg, jnp.int32(40),
                        n_steps=32)
    print(f"{name} compile32+run: {time.perf_counter()-t0:.0f}s", flush=True)
    dt8, cache = timed(fn, params, cache, seed_arg, jnp.int32(100), n_steps=8)
    dt32, cache = timed(fn, params, cache, seed_arg, jnp.int32(120),
                        n_steps=32)
    per = (dt32 - dt8) / 24
    print(f"{name}: len8 {dt8*1e3:.1f} ms, len32 {dt32*1e3:.1f} ms "
          f"-> per-step {per*1e3:.2f} ms", flush=True)
