"""Round-5 kernel experiment: can a VPU matvec beat the MXU weight wall?

Round 4 measured the Q4 xe kernel at 554 G values/s — but that is only
~277 GB/s of packed bytes while the chip demonstrably streams ~730 GB/s
(the bf16 XLA matvec).  DESIGN.md §1 admits the limiter is the per-matmul
MXU issue/latency path: at T=1 the systolic array is weight-load-bound
(it loads a 128x128 tile in ~128 cycles and then uses it for ~1), so
routing weights through the MXU caps the value rate regardless of how
few bytes they occupy in HBM.

This probe implements the VERDICT r4 candidate (c): dequantize and
accumulate on the VPU — `y[o] = sum_g s[o,g] * sum_{k in g} w[k,o]*x[k]`
as elementwise fma + sublane reductions, never touching the MXU.  Ops
per value: ~3 (convert, mul, fma) for Q8, ~3.5 for packed Q4 — at the
VPU's ~3.85 T ops/s that prices a 0.9-1.2 T values/s ceiling, vs HBM
ceilings of 819 G (int8) / 1638 G (packed Q4) values/s.  Either way the
wall moves well past the MXU's ~554.

Weights are pre-tiled (n_o, K, O_T) at load time so each grid block is a
CONTIGUOUS HBM read (a transposed slice of the (O, K) matrix would be a
strided DMA).  Activations ride along as a tiny (gs, G) column-per-group
matrix; scales as (n_o, G, O_T).

Variants measured (gemma-9b layer shapes, T=1, delta-timed chains):
  stream_i8   convert+reduce only — the attainable ceiling of this
              block structure (diagnoses DMA vs compute bound)
  vm_q8       int8 VPU matvec (per-group scale fma)
  vm_q4       packed-nibble VPU matvec (biased-byte unpack in VMEM)
  xe_q4/xe_i8 the round-4 MXU kernels (baseline, same timing harness)

Usage: python scripts/vpu_probe.py [o_tile=512] [--skip-xe]
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPES = [(14336 * 2, 3584), (3584, 14336)]   # gemma-9b w13 / w2
N_CHAIN = 24
R = 4
GS = 256


# ---------------------------------------------------------------- kernels

def _stream_i8_kernel(w_ref, o_ref):
    """Convert + reduce only: the VPU/DMA ceiling for this block shape."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    w = w_ref[0].astype(jnp.float32)
    o_ref[:] += jnp.sum(w, axis=0, keepdims=True)


def _vm_q8_kernel(x_ref, w_ref, s_ref, o_ref, *, gs: int):
    """VPU matvec: y[1, O_T] = sum_g s[g, :] * sum_k w[k, :] * x[k].

    x_ref is (gs, G) — column g holds group g's activations, so the
    per-group slice is a narrow lane window broadcast along lanes."""
    k = w_ref.shape[1]
    n_g = k // gs
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for g in range(n_g):
        wg = w_ref[0, g * gs:(g + 1) * gs, :].astype(jnp.float32)
        xg = x_ref[:, g:g + 1]                      # (gs, 1)
        part = jnp.sum(wg * xg, axis=0, keepdims=True)   # (1, O_T)
        acc = acc + s_ref[0, g:g + 1, :] * part
    o_ref[:] = acc


def _vm_q4_kernel(xl_ref, xh_ref, corr_ref, w_ref, s_ref, o_ref, *,
                  gs: int):
    """Packed-Q4 VPU matvec on biased bytes (see dequant_matmul._q4_xe_kernel
    for the algebra): byte row j of group g holds elements g*gs+j (lo) and
    g*gs+gs/2+j (hi); vf = int8 view = u-128, h0 = floor(vf/16) = hi-8,
    lo = vf-16*h0 in [0,15]; contribution (lo-8)*xl + h0*xh, with the
    -8*sum(xl) term precomputed per group (corr)."""
    half = gs // 2
    kb = w_ref.shape[1]                             # K/2 byte rows
    n_g = (2 * kb) // gs
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for g in range(n_g):
        vf = w_ref[0, g * half:(g + 1) * half, :].astype(jnp.float32)
        h0 = jnp.floor(vf * 0.0625)
        lo = vf - 16.0 * h0
        xl = xl_ref[:, g:g + 1]                     # (half, 1)
        xh = xh_ref[:, g:g + 1]
        part = jnp.sum(lo * xl + h0 * xh, axis=0, keepdims=True)
        acc = acc + s_ref[0, g:g + 1, :] * (part + corr_ref[0, g])
    o_ref[:] = acc


# ---------------------------------------------------------------- wrappers

def vm_q8_matvec(x, wq_t, s_t, *, gs=GS, interpret=False):
    """x (K,) f32; wq_t (n_o, K, O_T) int8; s_t (n_o, G, O_T) f32."""
    n_o, k, o_t = wq_t.shape
    n_g = k // gs
    xg = x.reshape(n_g, gs).T.astype(jnp.float32)   # (gs, G)
    out = pl.pallas_call(
        partial(_vm_q8_kernel, gs=gs),
        grid=(n_o,),
        in_specs=[
            pl.BlockSpec((gs, n_g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, o_t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_g, o_t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, o_t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_o * o_t), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xg, wq_t, s_t)
    return out[0]


def vm_q4_matvec(x, wq_t, s_t, *, gs=GS, interpret=False):
    """x (K,) f32; wq_t (n_o, K/2, O_T) biased bytes; s_t (n_o, G, O_T)."""
    n_o, kb, o_t = wq_t.shape
    k = kb * 2
    n_g = k // gs
    half = gs // 2
    xg = x.reshape(n_g, gs)
    xl = xg[:, :half].T.astype(jnp.float32)         # (half, G)
    xh = xg[:, half:].T.astype(jnp.float32)
    corr = (-8.0 * jnp.sum(xg[:, :half].astype(jnp.float32), axis=1)
            ).reshape(1, n_g)
    out = pl.pallas_call(
        partial(_vm_q4_kernel, gs=gs),
        grid=(n_o,),
        in_specs=[
            pl.BlockSpec((half, n_g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((half, n_g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, o_t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_g, o_t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, o_t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_o * o_t), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xl, xh, corr, wq_t, s_t)
    return out[0]


def stream_i8(wq_t, *, interpret=False):
    n_o, k, o_t = wq_t.shape
    out = pl.pallas_call(
        _stream_i8_kernel,
        grid=(n_o,),
        in_specs=[pl.BlockSpec((1, k, o_t), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, o_t), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, o_t), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wq_t)
    return out


# ---------------------------------------------------------------- harness

def _measure(prog, *args):
    """Median of 3 delta-timed measurements (single runs vary +-20%
    through the remote tunnel; see results_r4/mxu_wall*.log)."""
    y = prog(*args)
    jax.block_until_ready(y)
    float(np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0])

    def run(r):
        t0 = time.time()
        out = None
        for _ in range(r):
            out = prog(*args)
        jax.block_until_ready(out)
        return time.time() - t0

    samples = []
    for _ in range(3):
        t1 = run(1)
        tm = run(1 + R)
        samples.append((tm - t1) / (R * N_CHAIN))
    return float(np.median(samples))


def _chain_matvec(matvec, k):
    @jax.jit
    def prog(x, *ws):
        def body(x, _):
            y = matvec(x, *ws)
            return x + 1e-20 * jnp.sum(y), None
        x, _ = jax.lax.scan(body, x, length=N_CHAIN)
        return x
    return prog


def _chain_stream(fn):
    @jax.jit
    def prog(w):
        def body(c, _):
            y = fn(w)
            return c + 1e-20 * jnp.sum(y), None
        c, _ = jax.lax.scan(body, jnp.float32(0), length=N_CHAIN)
        return c
    return prog


def main():
    from lmrs_tpu.quant import (QTensor, QuantType, q4_file_to_runtime_np,
                                quantize_q40_np, quantize_q80_np)
    from lmrs_tpu.ops.matmul import qmatmul

    o_tile = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 512
    skip_xe = "--skip-xe" in sys.argv
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    print(f"== vpu_probe o_tile={o_tile} dev={jax.devices()} "
          f"interpret={interpret}", flush=True)

    totals = {}
    for o, n in SHAPES:
        w = rng.normal(0, 0.02, (o, n)).astype(np.float32)
        x = jnp.asarray(rng.normal(0, 1, (n,)).astype(np.float32))
        n_g = n // GS
        n_o = o // o_tile

        q8, s8, _ = quantize_q80_np(w, GS)
        q8 = q8.reshape(o, n)
        s8 = s8.reshape(o, n_g).astype(np.float32)
        # dequantized ground truth
        w_dq8 = (q8.astype(np.float32)
                 * np.repeat(s8, GS, axis=1))
        y_ref8 = w_dq8 @ np.asarray(x)

        # (n_o, K, O_T) transposed-tiled weights; (n_o, G, O_T) scales
        wq_t8 = jnp.asarray(
            q8.reshape(n_o, o_tile, n).transpose(0, 2, 1).copy())
        s_t8 = jnp.asarray(
            s8.reshape(n_o, o_tile, n_g).transpose(0, 2, 1).copy())

        q4, s4, _ = quantize_q40_np(w, GS)
        q4r = q4_file_to_runtime_np(q4.reshape(o, n // 2), GS)  # (O, K/2)
        q4i = q4r.view(np.int8)      # int8 view == unbiased byte - 128
        s4 = s4.reshape(o, n_g).astype(np.float32)
        wq_t4 = jnp.asarray(
            q4i.reshape(n_o, o_tile, n // 2).transpose(0, 2, 1).copy())
        s_t4 = jnp.asarray(
            s4.reshape(n_o, o_tile, n_g).transpose(0, 2, 1).copy())
        # q4 ground truth from the runtime bytes
        vf = q4i.astype(np.float32)
        h0 = np.floor(vf / 16.0)
        lo = vf - 16.0 * h0
        half = GS // 2
        wl = (lo - 8.0) * np.repeat(s4, half, axis=1)
        wh = h0 * np.repeat(s4, half, axis=1)
        xg = np.asarray(x).reshape(n_g, GS)
        xl_full = xg[:, :half].reshape(-1)
        xh_full = xg[:, half:].reshape(-1)
        y_ref4 = wl @ xl_full + wh @ xh_full

        # correctness first
        y8 = np.asarray(vm_q8_matvec(x, wq_t8, s_t8, interpret=interpret))
        e8 = np.max(np.abs(y8 - y_ref8)) / (np.max(np.abs(y_ref8)) + 1e-9)
        y4 = np.asarray(vm_q4_matvec(x, wq_t4, s_t4, interpret=interpret))
        e4 = np.max(np.abs(y4 - y_ref4)) / (np.max(np.abs(y_ref4)) + 1e-9)
        print(json.dumps({"shape": [o, n], "check_q8_relerr": float(e8),
                          "check_q4_relerr": float(e4)}), flush=True)
        assert e8 < 2e-2 and e4 < 2e-2, "numerics broken, not timing"
        if interpret:
            continue                 # CPU run = correctness check only

        runs = [
            ("stream_i8", _chain_stream(
                partial(stream_i8, interpret=interpret)), (wq_t8,)),
            ("vm_q8", _chain_matvec(partial(
                vm_q8_matvec, interpret=interpret), n),
             (x, wq_t8, s_t8)),
            ("vm_q4", _chain_matvec(partial(
                vm_q4_matvec, interpret=interpret), n),
             (x, wq_t4, s_t4)),
        ]
        if not skip_xe:
            qt8 = QTensor(jnp.asarray(q8), jnp.asarray(s8),
                          QuantType.Q8_0, GS, o, n)
            qt4 = QTensor(jnp.asarray(q4r), jnp.asarray(s4),
                          QuantType.Q4_0, GS, o, n)
            fast = partial(qmatmul, impl="fast")
            x2 = x.reshape(1, n)
            runs += [
                ("xe_i8", _chain_matvec(lambda xx, q: fast(xx, q), n),
                 (x2, qt8)),
                ("xe_q4", _chain_matvec(lambda xx, q: fast(xx, q), n),
                 (x2, qt4)),
            ]

        for name, prog, args in runs:
            dt = _measure(prog, *args)
            gv = o * n / dt / 1e9
            totals.setdefault(name, 0.0)
            totals[name] += dt
            print(json.dumps({"path": name, "o": o, "n": n,
                              "us_per_matmul": round(dt * 1e6, 1),
                              "gvals_per_s": round(gv, 1)}), flush=True)

    g9b_vals = 9.0e9
    vals_sum = sum(o * n for o, n in SHAPES)
    for name, dt_sum in totals.items():
        gv = vals_sum / dt_sum / 1e9
        print(json.dumps({"path": name, "wall_gvals_per_s": round(gv, 1),
                          "gemma9b_ceiling_tok_s":
                              round(gv * 1e9 / g9b_vals, 1)}), flush=True)


if __name__ == "__main__":
    main()
