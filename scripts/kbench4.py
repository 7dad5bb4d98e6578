"""Streaming efficiency at BIG weight shapes (per-call overhead amortized).

Chains inside one jit, delta over chain length — pure on-device time.
Shape: gemma-9b w13 (28672, 3584) int8 = 103MB/call.
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

print("devices:", jax.devices(), flush=True)

OUT, IN = 28672, 3584
gs = 128
rng = np.random.default_rng(0)
N_W = 5
WS = [qtensor_from_float_np(
    rng.standard_normal((OUT, IN), np.float32).astype(np.float32),
    QuantType.Q8_0, gs) for _ in range(N_W)]
NB = WS[0].q.nbytes + WS[0].s.nbytes
WB = [jnp.asarray(rng.standard_normal((OUT // 2, IN)), jnp.bfloat16)
      for _ in range(N_W)]


@jax.jit
def reduce_tiny(v):
    return jnp.sum(v[:, :128])


def delta(make_chain, label, nbytes, ws):
    # weights passed as jit ARGUMENTS — closure constants would be baked
    # into the uploaded HLO (hundreds of MB -> HTTP 413 on remote compile)
    f_short = jax.jit(make_chain(10))
    f_long = jax.jit(make_chain(40))

    def run(f):
        x0 = jnp.ones((1, IN), jnp.float32)
        t0 = time.perf_counter()
        y = f(x0, ws)
        _ = float(reduce_tiny(y))
        return time.perf_counter() - t0

    run(f_long); run(f_short)
    run(f_long); run(f_short)
    import statistics
    ts = statistics.median(run(f_short) for _ in range(5))
    tl = statistics.median(run(f_long) for _ in range(5))
    per = (tl - ts) / 30
    print(f"{label}: {per*1e3:7.2f} ms/call  {nbytes/per/1e9:6.0f} GB/s"
          f"  (short {ts*1e3:.1f} long {tl*1e3:.1f})", flush=True)


def pallas_chain(k, **kw):
    def f(x, ws):
        for i in range(k):
            y = qmatmul_pallas(x, ws[i % N_W], **kw)
            x = x + 1e-30 * y[:, :IN]
        return x
    return f


def dense_chain(k):
    def f(x, ws):
        for i in range(k):
            y = jax.lax.dot_general(x.astype(jnp.bfloat16), ws[i % N_W],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            x = x + 1e-30 * y[:, :IN]
        return x
    return f


delta(lambda k: pallas_chain(k), "pallas Q8 o512", NB, WS)
delta(lambda k: pallas_chain(k, o_tile=2048), "pallas Q8 o2048", NB, WS)
delta(dense_chain, "dense bf16 same-bytes", WB[0].nbytes, WB)


# extra variants: group-loop pallas kernel, XLA-fused int8 dequant
from lmrs_tpu.kernels.dequant_matmul import qmatmul_pallas_gl


def gl_chain(k, **kw):
    def f(x, ws):
        for i in range(k):
            y = qmatmul_pallas_gl(x, ws[i % N_W], **kw)
            x = x + 1e-30 * y[:, :IN]
        return x
    return f


delta(lambda k: gl_chain(k), "pallas-GL Q8 o512", NB, WS)
delta(lambda k: gl_chain(k, o_tile=2048), "pallas-GL Q8 o2048", NB, WS)
