"""Parameterized dequant-matmul kernel microbenchmark (TPU).

One tool replacing the round-1 kbench/scanprobe/bisect one-offs.  Uses the
delta method (chained programs of two lengths, one host sync) because the
axon tunnel makes single-call wall timing meaningless — see
scripts/README.md.

Usage:
  python scripts/kbench.py --shape w13 --variants q8-xe,q8-cur,none --t 1
  python scripts/kbench.py --shape 28672x3584 --qtype q4 --variants q4-xe,q4-cur
  python scripts/kbench.py --all            # the standard race table

Variants:
  q8-cur  current s@E expansion kernel         q8-xe  x-expansion kernel
  q8-gl   in-kernel group loop                 q4-cur current float-split Q4
  q4-xe   x-expansion Q4 (f32 unpack)          q4-xeb x-expansion Q4 (bf16)
  none    convert-only ceiling (Q8, no scales) dense  plain bf16 matvec
"""

from __future__ import annotations

import argparse
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lmrs_tpu.kernels.dequant_matmul import (qmatmul_pallas,
                                             qmatmul_pallas_gl,
                                             qmatmul_pallas_xe)
from lmrs_tpu.quant import QuantType, qtensor_from_float_np

SHAPES = {
    # gemma-2-9b decode shapes (o, k)
    "w13": (28672, 3584),
    "w2": (3584, 14336),
    "wq": (4096, 3584),
    "wo": (3584, 4096),
    "cls": (256128, 3584),
    # llama-3.2-1b
    "l1-w13": (16384, 2048),
}

N_W = int(os.environ.get('KBENCH_NW', '3'))  # weight sets rotated per chain step


def _none_kernel(x_ref, w_ref, o_ref):
    w_bf = w_ref[:].astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(
        w_bf, x_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def convert_only(x, w, o_tile):
    o, k = w.q.shape
    t_pad = max(8, x.shape[0])
    xb = x.astype(jnp.bfloat16)
    if xb.shape[0] < t_pad:
        xb = jnp.pad(xb, ((0, t_pad - xb.shape[0]), (0, 0)))
    n_o = o // o_tile
    out = pl.pallas_call(
        _none_kernel,
        grid=(n_o,),
        in_specs=[
            pl.BlockSpec((t_pad, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((o_tile, t_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((o, t_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(xb, w.q)
    return out.T[: x.shape[0]]


@jax.jit
def _sync(v):
    return jnp.sum(v[:, :8])


def delta_time(fn, x0, ws, n_short=40, n_long=240, reps=7):
    """Median per-call seconds via chained-program delta timing.

    ONE compiled program serves every chain length: the trip count is a
    traced fori_loop bound (dynamic while-loop on device), and the body
    lax.switch-es over the N_W weight sets so the module has only N_W
    pallas call sites.  Both matter on the axon remote compiler: call-site
    count and module count each cost minutes (a 3-site w13-shape module
    measured 209 s; per-site inline modules were minutes PER SITE).
    Chains are long (40/240) because per-call device time is ~0.1 ms and
    the tunnel adds tens of ms of per-run noise to cancel out.
    """
    @jax.jit
    def chain(x, ws, n):
        def body(i, x):
            y = jax.lax.switch(
                i % N_W,
                [lambda x, j=j: fn(x, ws[j]) for j in range(N_W)], x)
            # scalar dependency keeps the (opaque) kernel call live
            # without assuming o >= k (w2 is wide-in, narrow-out)
            return x + 1e-30 * y[0, 0]
        return jax.lax.fori_loop(0, n, body, x)

    def run(n):
        t0 = time.perf_counter()
        y = chain(x0, ws, jnp.int32(n))
        _ = float(_sync(y))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    run(n_long)
    print(f"    [compile+first: {time.perf_counter()-t0:.1f}s]", flush=True)
    run(n_short)
    run(n_long)
    ts = statistics.median([run(n_short) for _ in range(reps)])
    tl = statistics.median([run(n_long) for _ in range(reps)])
    return (tl - ts) / (n_long - n_short)


def make_variant(name, o_tile, k_tile):
    def call(x, w):
        if name == "q8-cur" or name == "q4-cur":
            return qmatmul_pallas(x, w, o_tile=o_tile, k_tile=k_tile)
        if name == "q8-gl":
            return qmatmul_pallas_gl(x, w, o_tile=o_tile, k_tile=k_tile)
        if name in ("q8-xe", "q4-xe"):
            return qmatmul_pallas_xe(x, w, o_tile=o_tile, k_tile=k_tile,
                                     f32_unpack=True)
        if name == "q4-xeb":
            return qmatmul_pallas_xe(x, w, o_tile=o_tile, k_tile=k_tile,
                                     f32_unpack=False)
        if name == "q4-xef":
            return qmatmul_pallas_xe(x, w, o_tile=o_tile, k_tile=k_tile,
                                     f32_dot=True)
        if name == "none":
            return convert_only(x, w, o_tile or 512)
        if name == "dense":
            # dense variant receives a plain bf16 array instead of a QTensor
            return (x.astype(jnp.bfloat16) @ w.T).astype(jnp.float32)
        raise ValueError(name)

    return call


def bench_shape(shape_name, o, k, qtype, variants, t, gs, o_tile, k_tile):
    rng = np.random.default_rng(0)
    need_dense = "dense" in variants
    ws, dense_ws = [], []
    for i in range(N_W):
        wf = rng.standard_normal((o, k)).astype(np.float32) * 0.05
        ws.append(qtensor_from_float_np(wf, qtype, gs))
        if need_dense:
            dense_ws.append(jnp.asarray(wf, jnp.bfloat16))
    nbytes = ws[0].q.nbytes + ws[0].s.nbytes
    x0 = jnp.asarray(rng.standard_normal((t, k)).astype(np.float32))
    import jax as _jax
    _jax.block_until_ready([w.q for w in ws])
    print(f"-- {shape_name} ({o}x{k}) {qtype.name} gs={gs} T={t} "
          f"[{nbytes/1e6:.1f} MB/matrix] (weights resident)", flush=True)
    for v in variants:
        if v.startswith("q8") and qtype != QuantType.Q8_0:
            continue
        if v.startswith("q4") and qtype != QuantType.Q4_0:
            continue
        if v == "none" and qtype != QuantType.Q8_0:
            continue
        try:
            fn = make_variant(v, o_tile, k_tile)
            per = delta_time(fn, x0, dense_ws if v == "dense" else ws)
            print(f"  {v:8s} {per*1e3:7.3f} ms/call  "
                  f"{nbytes/per/1e9:6.0f} GB/s", flush=True)
        except Exception as e:
            print(f"  {v:8s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="w13",
                    help="name from SHAPES or OxK literal")
    ap.add_argument("--qtype", default="q8", choices=["q8", "q4"])
    ap.add_argument("--variants", default="q8-cur,q8-xe,none")
    ap.add_argument("--t", type=int, default=1)
    ap.add_argument("--gs", type=int, default=128)
    ap.add_argument("--o-tile", type=int, default=None)
    ap.add_argument("--k-tile", type=int, default=None)
    ap.add_argument("--all", action="store_true",
                    help="standard race: w13/w2/wq shapes, q8+q4 variants")
    args = ap.parse_args()

    from lmrs_tpu.runtime.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    if args.all:
        for s in ("w13", "w2", "wq"):
            o, k = SHAPES[s]
            bench_shape(s, o, k, QuantType.Q8_0,
                        ["q8-cur", "q8-xe", "none"], args.t, args.gs,
                        args.o_tile, args.k_tile)
            bench_shape(s, o, k, QuantType.Q4_0,
                        ["q4-cur", "q4-xe", "q4-xeb"], args.t, args.gs,
                        args.o_tile, args.k_tile)
        return
    if args.shape in SHAPES:
        o, k = SHAPES[args.shape]
    else:
        o, k = (int(v) for v in args.shape.split("x"))
    qtype = QuantType.Q8_0 if args.qtype == "q8" else QuantType.Q4_0
    bench_shape(args.shape, o, k, qtype, args.variants.split(","),
                args.t, args.gs, args.o_tile, args.k_tile)


if __name__ == "__main__":
    main()
