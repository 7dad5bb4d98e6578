"""Microbenchmark the dequant-matmul kernels vs HBM roofline.

Run on the real TPU:  python scripts/microbench_kernel.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lmrs_tpu.quant import QuantType, qtensor_from_float_np
from lmrs_tpu.kernels.dequant_matmul import qmatmul_pallas


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    gs = 128

    for (o, n) in [(8192, 2048), (2048, 8192), (14336, 3584), (3584, 14336),
                   (256000, 2048)]:
        w = rng.standard_normal((o, n), np.float32).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((1, n), np.float32))

        for qt in [QuantType.Q8_0, QuantType.Q4_0]:
            qw = qtensor_from_float_np(w, qt, gs)
            f = jax.jit(lambda x, qw=qw: qmatmul_pallas(x, qw))
            dt = bench(f, x)
            nbytes = qw.q.nbytes + qw.s.nbytes
            print(f"{qt.name} ({o}x{n}): {dt*1e6:8.1f} us  "
                  f"{nbytes/dt/1e9:7.1f} GB/s")

        # bf16 dense baseline
        wb = jnp.asarray(w, jnp.bfloat16)
        fb = jax.jit(lambda x, wb=wb: (x.astype(jnp.bfloat16) @ wb.T))
        dt = bench(fb, x)
        print(f"BF16 ({o}x{n}): {dt*1e6:8.1f} us  {wb.nbytes/dt/1e9:7.1f} GB/s")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
