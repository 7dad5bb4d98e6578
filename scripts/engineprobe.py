"""Reproduce the Engine's slow chunks and bisect the cause.

Variants, all with the REAL Engine programs and synthetic llama-1b Q8:
  A. engine.generate end-to-end (reproduce bench's ~1.1s/chunk)
  B. raw _decode_chunk loop, fixed bucket 256, fresh token each time
  C. raw _decode_chunk loop, chained toks[-1], fixed bucket
  D. raw _decode_chunk loop alternating buckets 256/512
  E. like B but AFTER running a prefill step
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lmrs_tpu.config import PRESETS
from lmrs_tpu.io.synthetic import random_weights
from lmrs_tpu.io.params import params_from_weights
from lmrs_tpu.quant import QuantType
from lmrs_tpu.runtime.engine import Engine, GenerationConfig

print("devices:", jax.devices(), flush=True)

cfg = PRESETS["llama3.2-1b"](quant=QuantType.Q8_0, matmul_impl="fast")
t0 = time.perf_counter()
params = params_from_weights(cfg, random_weights(cfg, seed=0),
                             stack_layers=False, fuse_qkv=True)
jax.block_until_ready(jax.tree_util.tree_leaves(params))
print(f"weights ready in {time.perf_counter()-t0:.0f}s", flush=True)

eng = Engine(cfg, params, cache_dtype=jnp.bfloat16, decode_chunk=32)


@jax.jit
def fetch(t):
    return jnp.sum(t)


def raw_chunks(label, n_chunks, chain, buckets, prefill_first):
    eng.reset()
    if prefill_first:
        eng.prefill(list(range(3, 67)))
    key = jax.random.PRNGKey(0)
    tok = jnp.int32(7)
    pos = eng.pos
    # warm each bucket program
    for b in set(buckets):
        toks, eng.cache = eng._decode_chunk(
            eng.params, eng.cache, tok, jnp.int32(pos), key, n_steps=32,
            attn_len=b, temperature=0.0, top_p=0.9)
        _ = float(fetch(toks))
    t0 = time.perf_counter()
    for i in range(n_chunks):
        toks, eng.cache = eng._decode_chunk(
            eng.params, eng.cache, tok, jnp.int32(pos + i), key,
            n_steps=32, attn_len=buckets[i % len(buckets)],
            temperature=0.0, top_p=0.9)
        if chain:
            tok = toks[-1]
    _ = float(fetch(toks))
    dt = (time.perf_counter() - t0) / n_chunks
    print(f"{label}: {dt*1e3:.0f} ms/chunk ({dt/32*1e3:.2f} ms/step)",
          flush=True)


# A: end-to-end generate
gen = GenerationConfig(temperature=0.0, max_new_tokens=256)
prompt = list(np.random.default_rng(0).integers(3, 1000, size=64))
eng.generate(prompt, gen)           # warm all programs
eng.reset()
t0 = time.perf_counter()
out = eng.generate(prompt, gen)
dt = time.perf_counter() - t0
print(f"A generate: {len(out)} toks in {dt:.2f}s "
      f"({dt/len(out)*1e3:.1f} ms/tok)", flush=True)

raw_chunks("B fixed-bucket fresh-tok", 8, chain=False, buckets=[256],
           prefill_first=False)
raw_chunks("C chained tok", 8, chain=True, buckets=[256],
           prefill_first=False)
raw_chunks("D alternating buckets", 8, chain=False, buckets=[256, 512],
           prefill_first=False)
raw_chunks("E after prefill", 8, chain=False, buckets=[256],
           prefill_first=True)
