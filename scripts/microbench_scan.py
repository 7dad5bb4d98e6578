"""True kernel time: run N chained iterations inside ONE compiled program.

Separates per-dispatch (tunnel) overhead from on-device kernel time.
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

N_ITER = 100


def bench_in_scan(make_step, x0, label, nbytes):
    """make_step: fn(x) -> y with y feeding the next x (data dependence)."""
    @jax.jit
    def run(x):
        def body(c, _):
            return make_step(c), None
        out, _ = jax.lax.scan(body, x, length=N_ITER)
        return out

    out = run(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITER
    print(f"{label}: {dt*1e6:8.1f} us/iter  {nbytes/dt/1e9:7.1f} GB/s")
    sys.stdout.flush()


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    gs = 128

    for (o, n) in [(8192, 2048), (2048, 2048), (128256, 2048)]:
        w = rng.standard_normal((o, n), np.float32).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((1, n), np.float32))

        for qt in [QuantType.Q8_0, QuantType.Q4_0]:
            try:
                qw = qtensor_from_float_np(w, qt, gs)
                nbytes = qw.q.nbytes + qw.s.nbytes

                def step(xx, qw=qw, n=n):
                    y = qmatmul_pallas(xx, qw)
                    # fold output back to input size (cheap)
                    return xx + y[:, :1] * 0.0 + jnp.sum(y) * 1e-30

                bench_in_scan(step, x, f"{qt.name} ({o}x{n})", nbytes)
            except Exception as e:
                print(f"{qt.name} ({o}x{n}): FAILED {str(e)[:120]}")

        wb = jnp.asarray(w, jnp.bfloat16)

        def stepb(xx, wb=wb):
            y = xx.astype(jnp.bfloat16) @ wb.T
            return xx + jnp.sum(y).astype(jnp.float32) * 1e-30

        bench_in_scan(stepb, x, f"BF16 ({o}x{n})", wb.nbytes)

        # int8 weights dequantized inline by XLA (no pallas)
        qw8 = qtensor_from_float_np(w, QuantType.Q8_0, gs)
        q8 = qw8.q
        s8 = qw8.s

        def stepx(xx, q8=q8, s8=s8, o=o, n=n, gs=gs):
            wf = q8.astype(jnp.bfloat16).reshape(o, n // gs, gs) * \
                s8[..., None].astype(jnp.bfloat16)
            y = xx.astype(jnp.bfloat16) @ wf.reshape(o, n).T
            return xx + jnp.sum(y).astype(jnp.float32) * 1e-30

        bench_in_scan(stepx, x, f"XLA-deq-int8 ({o}x{n})", q8.nbytes + s8.nbytes)


if __name__ == "__main__":
    main()
