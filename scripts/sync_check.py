"""Does block_until_ready actually synchronize through the axon tunnel?

Times the same chained computation three ways:
  a) block_until_ready after N chained calls
  b) np.asarray fetch of the final result
  c) each call fetched synchronously
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)

n = 4096
a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)),
                jnp.bfloat16)


@jax.jit
def step(x):
    return jnp.tanh(x @ a)


x = jnp.ones((n, n), jnp.bfloat16)
x = step(x)
jax.block_until_ready(x)

# a) chained, block_until_ready
t0 = time.perf_counter()
y = x
for _ in range(20):
    y = step(y)
jax.block_until_ready(y)
ta = time.perf_counter() - t0

# b) fetch final
t0 = time.perf_counter()
_ = np.asarray(y[:1, :8])
tb = time.perf_counter() - t0

# flops: 2*n^3 per step * 20
fl = 2 * n**3 * 20
print(f"a) 20 chained steps, block_until_ready: {ta*1e3:.1f} ms "
      f"({fl/ta/1e12:.1f} TFLOP/s)", flush=True)
print(f"b) subsequent tiny fetch: {tb*1e3:.1f} ms", flush=True)

# c) one step + full sync via fetch
t0 = time.perf_counter()
for _ in range(20):
    y = step(y)
    _ = np.asarray(y[:1, :8])
tc = (time.perf_counter() - t0)
print(f"c) 20 steps each fetched: {tc*1e3:.1f} ms "
      f"({fl/tc/1e12:.1f} TFLOP/s)", flush=True)
