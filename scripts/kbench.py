"""Delta-method microbench of individual quantized matmul formulations."""
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


@jax.jit
def reduce_tiny(v):
    return jnp.sum(v[:, :128])


def delta_bench(make_chain, label, nbytes):
    f = jax.jit(make_chain)

    def run(k):
        x0 = jnp.ones((1, IN), jnp.float32)
        t0 = time.perf_counter()
        y = x0
        for _ in range(k):
            y = f(y)
        _ = float(reduce_tiny(y))
        return time.perf_counter() - t0

    run(1); run(1)
    t5, t35 = run(5), run(35)
    per = (t35 - t5) / 30
    print(f"{label}: {per*1e6:8.1f} us/iter  {nbytes/per/1e9:7.1f} GB/s",
          flush=True)


OUT, IN = 2048, 2048  # square so outputs chain into inputs
rng = np.random.default_rng(0)
w = rng.standard_normal((OUT, IN), np.float32).astype(np.float32)
gs = 128

for qt in (QuantType.Q8_0, QuantType.Q4_0):
    qw = qtensor_from_float_np(w, qt, gs)
    nbytes = qw.q.nbytes + qw.s.nbytes

    def chain_pallas(x, qw=qw):
        return x + 1e-30 * qmatmul_pallas(x, qw)

    delta_bench(chain_pallas, f"pallas {qt.name} ({OUT}x{IN})", nbytes)

# XLA inline dequant (bf16)
qw8 = qtensor_from_float_np(w, QuantType.Q8_0, gs)


def chain_xla(x, q=qw8.q, s=qw8.s):
    wf = (q.astype(jnp.bfloat16).reshape(OUT, IN // gs, gs)
          * s[..., None].astype(jnp.bfloat16)).reshape(OUT, IN)
    y = jax.lax.dot_general(x.astype(jnp.bfloat16), wf,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return x + 1e-30 * y


delta_bench(chain_xla, f"xla-deq Q8 ({OUT}x{IN})", qw8.q.nbytes + qw8.s.nbytes)

# dense bf16
wb = jnp.asarray(w, jnp.bfloat16)


def chain_bf16(x, wb=wb):
    y = jax.lax.dot_general(x.astype(jnp.bfloat16), wb,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return x + 1e-30 * y


delta_bench(chain_bf16, f"dense bf16 ({OUT}x{IN})", wb.nbytes)

# dense f32 HIGHEST
wf32 = jnp.asarray(w)


def chain_f32(x, wf=wf32):
    y = jax.lax.dot_general(x, wf, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return x + 1e-30 * y


delta_bench(chain_f32, f"dense f32 ({OUT}x{IN})", wf32.nbytes)
