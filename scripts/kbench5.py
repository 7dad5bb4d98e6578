"""Is the s@E expansion matmul the Q8 kernel bottleneck?

Variants (same DMA, same main dot):
  A. current kernel (s @ E on MXU -> full-tile multiply)
  B. scalar scale (numerically wrong; measures the no-expansion ceiling)
  C. pltpu.repeat of the scale block (tile-wise; pairs with interleaved
     column layout) -> full-tile multiply
  D. no scale at all (raw int8->bf16 dot; absolute kernel ceiling)
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
from lmrs_tpu.kernels.dequant_matmul import qmatmul_pallas, _pick_tile

print("devices:", jax.devices(), flush=True)

OUT, IN = 28672, 3584
gs = 128
G = IN // gs
rng = np.random.default_rng(0)
N_W = 5
WS = [qtensor_from_float_np(
    rng.standard_normal((OUT, IN), np.float32).astype(np.float32),
    QuantType.Q8_0, gs) for _ in range(N_W)]
NB = WS[0].q.nbytes + WS[0].s.nbytes

O_T = 2048
K_T = IN
N_O = OUT // O_T
T_PAD = 16


def _kern(x_ref, w_ref, s_ref, st_ref, o_ref, *, mode: str):
    if mode == "scalar":
        w_bf = w_ref[:].astype(jnp.bfloat16) * jnp.bfloat16(0.0078)
    elif mode == "repeat":
        s_bf = s_ref[0].astype(jnp.bfloat16)          # (O_T, G)
        s_rep = pltpu.repeat(s_bf, K_T // G, axis=1)  # (O_T, K_T) tiled
        w_bf = w_ref[:].astype(jnp.bfloat16) * s_rep
    elif mode == "reshape3d":
        # (O_T, K_T) -> (O_T, G, gs): splits the lane dim at vreg
        # granularity (gs=128 == lanes), so the broadcast multiply never
        # materializes a full-tile scale tensor
        # minor-dim insertion is only lowered for 32-bit types: insert in
        # f32, then cast the (O_T, G, 1) scales to bf16
        s3 = s_ref[0][:, :, None].astype(jnp.bfloat16)
        w3 = w_ref[:].astype(jnp.bfloat16).reshape(O_T, G, gs)
        w_bf = (w3 * s3).reshape(O_T, K_T)
    elif mode == "chunkmul":
        # build the dequant tile chunkwise: per group, convert the 128-lane
        # chunk and multiply by that group's (O_T, 1) scale column — no
        # materialized full-tile s_rep (scales pre-transposed (G, O_T) so
        # a group's scales are a sublane row; f32 minor-insert is legal)
        chunks = []
        for g in range(G):
            s_col = st_ref[0, g, :][:, None].astype(jnp.bfloat16)
            chunks.append(
                w_ref[:, g * gs:(g + 1) * gs].astype(jnp.bfloat16) * s_col)
        w_bf = jnp.concatenate(chunks, axis=1)
    elif mode == "none":
        w_bf = w_ref[:].astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(
        w_bf, x_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def variant(x, q, s, st, mode):
    return pl.pallas_call(
        functools.partial(_kern, mode=mode),
        grid=(N_O,),
        in_specs=[
            pl.BlockSpec((T_PAD, K_T), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O_T, K_T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O_T, G), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, O_T), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((O_T, T_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT, T_PAD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, q, s, st)


@jax.jit
def reduce_tiny(v):
    return jnp.sum(v[:, :128])


def delta(make_chain, label, ws):
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
    print(f"{label}: {per*1e3:7.2f} ms/call  {NB/per/1e9:6.0f} GB/s"
          f"  (short {ts*1e3:.1f} long {tl*1e3:.1f})", flush=True)


S_T = [jnp.asarray(np.ascontiguousarray(
    w.s.reshape(OUT, 1, G).transpose(1, 0, 2))) for w in WS]
# scales transposed (1, G, OUT): a group's scales on one sublane row
S_TT = [jnp.asarray(np.ascontiguousarray(
    np.asarray(w.s).reshape(OUT, G).T[None])) for w in WS]


def chain(mode, k):
    def f(x, ws):
        for i in range(k):
            w = ws[i % N_W]
            xb = jnp.pad(x.astype(jnp.bfloat16), ((0, T_PAD - 1), (0, 0)))
            y = variant(xb, w.q, S_T[i % N_W], S_TT[i % N_W], mode)
            x = x + 1e-30 * y.T[:1, :IN]
        return x
    return f


def base_chain(k):
    def f(x, ws):
        for i in range(k):
            y = qmatmul_pallas(x, ws[i % N_W], o_tile=2048)
            x = x + 1e-30 * y[:, :IN]
        return x
    return f


delta(lambda k: chain("chunkmul", k), "F chunkwise scale    ", WS)
delta(lambda k: chain("none", k), "D no scale           ", WS)
delta(lambda k: chain("scalar", k), "B scalar scale       ", WS)
