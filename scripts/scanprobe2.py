"""Isolate the engine-vs-probe decode gap: add engine body pieces one at a
time to the known-4ms/step scan."""
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
from lmrs_tpu.ops.sampling import (sample_argmax, sample_multinomial,
                                   sample_topp)
from lmrs_tpu.quant import QuantType

print("devices:", jax.devices(), flush=True)

cfg = PRESETS["llama3.2-1b"](quant=QuantType.Q8_0, matmul_impl="fast")
t0 = time.perf_counter()
params = params_from_weights(cfg, random_weights(cfg, seed=0),
                             stack_layers=False, fuse_qkv=True)
jax.block_until_ready(jax.tree_util.tree_leaves(params))
print(f"weights ready in {time.perf_counter()-t0:.0f}s", flush=True)

ATTN = 256


def make(variant):
    @partial(jax.jit, static_argnames=("n_steps",),
             donate_argnames=("cache",))
    def chunk(params, cache, token, pos, key, n_steps):
        def step(carry, _):
            tok, p, cache, k = carry
            x = embed_tokens(params, cfg, tok[None])
            logits, cache = forward(params, cfg, cache, x, p, ATTN,
                                    jnp.int32(0))
            if variant == "plain":
                nxt = sample_argmax(logits)
            elif variant == "split":
                k, sub = jax.random.split(k)
                nxt = sample_argmax(logits)
            elif variant == "engine":
                k, sub = jax.random.split(k)
                temperature, top_p = 0.0, 0.9
                if temperature == 0.0:
                    nxt = sample_argmax(logits)
                elif top_p <= 0.0 or top_p >= 1.0:
                    nxt = sample_multinomial(logits, temperature, sub)
                else:
                    nxt = sample_topp(logits, temperature, top_p, sub)
            return (nxt, p + 1, cache, k), nxt
        (tok, p, cache, key2), toks = jax.lax.scan(
            step, (token, pos, cache, key), length=n_steps)
        return toks, cache
    return chunk


@jax.jit
def fetch(t):
    return jnp.sum(t)


for variant in ("plain", "split", "engine"):
    fn = make(variant)
    cache = init_kv_cache(cfg, jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    def run(n):
        global cache
        t0 = time.perf_counter()
        toks, cache = fn(params, cache, jnp.int32(7), jnp.int32(100), key,
                         n_steps=n)
        _ = float(fetch(toks))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    run(8); run(32)
    print(f"{variant}: compiles {time.perf_counter()-t0:.0f}s", flush=True)
    d8, d32 = run(8), run(32)
    print(f"{variant}: len8 {d8*1e3:.0f} ms len32 {d32*1e3:.0f} ms "
          f"-> per-step {(d32-d8)/24*1e3:.2f} ms", flush=True)
