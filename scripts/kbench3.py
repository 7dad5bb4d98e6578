"""Where do the in-program microseconds go?  16-op vs 1-op chains inside one
jit, for: pallas Q8, empty-body pallas (fixed overhead), XLA dense bf16,
XLA int8-dequant-fused.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lmrs_tpu.quant import QuantType, qtensor_from_float_np
from lmrs_tpu.kernels.dequant_matmul import qmatmul_pallas

print("devices:", jax.devices(), flush=True)

OUT, IN = 2048, 2048
rng = np.random.default_rng(0)
gs = 128
WS = [qtensor_from_float_np(
    rng.standard_normal((OUT, IN), np.float32).astype(np.float32),
    QuantType.Q8_0, gs) for _ in range(8)]
W8 = [(w.q, w.s) for w in WS]
WB = [jnp.asarray(rng.standard_normal((OUT, IN)), jnp.bfloat16)
      for _ in range(8)]
NB = WS[0].q.nbytes + WS[0].s.nbytes


@jax.jit
def reduce_tiny(v):
    return jnp.sum(v[:, :128])


def _empty_kernel(x_ref, w_ref, o_ref):
    # touches one row per block so the DMA isn't elided, minimal math
    o_ref[:, :] = (x_ref[:16, :16].astype(jnp.float32)
                   + w_ref[:16, :16].astype(jnp.float32))


def empty_pallas(x, q):
    o_tile, k_tile = 512, 2048
    return pl.pallas_call(
        _empty_kernel,
        grid=(OUT // o_tile, 1),
        in_specs=[
            pl.BlockSpec((16, k_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o_tile, k_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, 16), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 16), jnp.float32),
    )(x, q)


def make_chain(kind, k):
    @jax.jit
    def f(x):
        for i in range(k):
            if kind == "pallas":
                y = qmatmul_pallas(x, WS[i % 8])
            elif kind == "empty":
                xb = jnp.pad(x.astype(jnp.bfloat16), ((0, 15), (0, 0)))
                x = x + 1e-30 * jnp.sum(empty_pallas(xb, W8[i % 8][0]))
                continue
            elif kind == "dense":
                y = jax.lax.dot_general(
                    x.astype(jnp.bfloat16), WB[i % 8],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif kind == "xla-deq":
                q, s = W8[i % 8]
                wf = (q.astype(jnp.bfloat16).reshape(OUT, IN // gs, gs)
                      * s[..., None].astype(jnp.bfloat16)).reshape(OUT, IN)
                y = jax.lax.dot_general(
                    x.astype(jnp.bfloat16), wf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            x = x + 1e-30 * y[:, :IN]
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


for kind in ("pallas", "empty", "dense", "xla-deq"):
    f1, f16 = make_chain(kind, 1), make_chain(kind, 16)
    run(f16, 1); run(f1, 1)
    run(f16, 1); run(f1, 1)
    t1 = run(f1, 10)
    t16 = run(f16, 10)
    per_op = (t16 - t1) / 10 / 15
    print(f"{kind:8s}: per-op {per_op*1e6:7.1f} us "
          f"({NB/per_op/1e9:6.0f} GB/s)", flush=True)
