"""Per-op overhead INSIDE a program: K chained kernel calls in one jit."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lmrs_tpu.quant import QuantType, qtensor_from_float_np
from lmrs_tpu.kernels.dequant_matmul import qmatmul_pallas

print("devices:", jax.devices(), flush=True)

OUT, IN = 2048, 2048
rng = np.random.default_rng(0)
gs = 128
# 8 distinct weights so the DMA can't cache-trick; cycled K times
WS = [qtensor_from_float_np(
    rng.standard_normal((OUT, IN), np.float32).astype(np.float32),
    QuantType.Q8_0, gs) for _ in range(8)]
NB = sum(w.q.nbytes + w.s.nbytes for w in WS) / len(WS)


@jax.jit
def reduce_tiny(v):
    return jnp.sum(v[:, :128])


def chain_k(k):
    @jax.jit
    def f(x):
        for i in range(k):
            x = x + 1e-30 * qmatmul_pallas(x, WS[i % 8])
        return x
    return f


def run(f, reps):
    x0 = jnp.ones((1, IN), jnp.float32)
    t0 = time.perf_counter()
    y = x0
    for _ in range(reps):
        y = f(y)
    _ = float(reduce_tiny(y))
    return time.perf_counter() - t0


f1, f16 = chain_k(1), chain_k(16)
run(f16, 1); run(f1, 1)  # compile
run(f16, 1); run(f1, 1)

# in-program per-op: (T(16-op program) - T(1-op program)) / 15, using
# multiple dispatches of each to beat noise
t1 = run(f1, 10)
t16 = run(f16, 10)
per_op = (t16 - t1) / 10 / 15
print(f"1-op x10: {t1*1e3:.1f} ms; 16-op x10: {t16*1e3:.1f} ms", flush=True)
print(f"in-program per-op: {per_op*1e6:.1f} us "
      f"({NB/per_op/1e9:.0f} GB/s)", flush=True)
