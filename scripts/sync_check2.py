"""True device time via delta method: fetch-synced chains of different length."""
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


@jax.jit
def reduce_tiny(x):
    return jnp.sum(x[:8, :128])


def run(n_steps):
    y = jnp.ones((n, n), jnp.bfloat16)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        y = step(y)
    v = float(reduce_tiny(y))  # forces full device round trip
    return time.perf_counter() - t0, v


run(1)  # compile everything
run(1)
for n_steps in (5, 10, 20, 40):
    dt, v = run(n_steps)
    print(f"{n_steps:3d} steps: {dt*1e3:8.1f} ms total", flush=True)

# delta: (t40 - t5)/35 = per-step true time
t5, _ = run(5)
t40, _ = run(40)
per = (t40 - t5) / 35
print(f"per-step true: {per*1e3:.2f} ms ({2*n**3/per/1e12:.1f} TFLOP/s)",
      flush=True)
