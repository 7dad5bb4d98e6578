"""K-major quantized matmul kernels — the round-5 decode roofline attack.

The round-4 x-expansion kernels route weights through the MXU, which at
T=1 is weight-LOAD-bound (the systolic array loads a 128x128 tile in ~128
cycles and uses it for ~1): measured ceiling ~554 G values/s on gemma-9b
shapes, only ~277 GB/s of packed-Q4 HBM traffic on a chip that streams
~730 GB/s.  These kernels dequantize and accumulate on the VPU instead —

    y[o] = sum_g s[o,g] * sum_{k in g} w[k,o] * x[k]

as elementwise fma + sublane reductions, never touching the MXU.  On-chip
(results_r5/vpu_probe.log, medians of 3): packed-Q4 1083 G values/s
(120 tok/s gemma-9b ceiling, VPU-compute-bound at ~3.5 ops/value), int8
797 G values/s (HBM-bound).  Replaces the reference's SIMD matmul hot
loops (reference: src/functional.rs:173-250) on the single-stream path.

The price is a K-MAJOR weight layout: per output tile, K runs along
sublanes so the per-group reduction is a sublane reduce and each grid
block is one CONTIGUOUS HBM read:

    q: (L, n_o, Kb, O_T)   Kb = K (int8) or K/2 (packed nibble bytes)
    s: (L, n_o, G,  O_T)   f32 group scales

(L=1 for non-layer-stacked tensors — the classifier/embedding.)  Since
holding both layouts would double weight HBM, the module also provides
K-major variants of the T>1 paths so an engine can hold ONLY this layout:

* T==1          VPU matvec (the new hot path)
* 2 <= T <= 8   x-expansion on the MXU (transposed dimension numbers;
                weight-load-bound either way at these T)
* 9 <= T <= 512 s@E scale-expansion prefill kernels
* T > 512       dense XLA dot on dequantized weights (vision-sized only)

The embedding table doubles as the tied classifier; a K-major row gather
lives in models.transformer.embed_tokens (row v = q[0, v // O_T, :,
v % O_T] — bytes along Kb are exactly the runtime packed row).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lmrs_tpu.kernels.dequant_matmul import (_build_xe, _cached_partial,
                                             _expansion_matrix, _fold_matrix,
                                             _pick_o_tile)
from lmrs_tpu.quant import QTensor, QuantType, quantize_q8_act

_VM_OTILE = int(os.environ.get("LMRS_VM_OTILE", "512"))


def kmajor_o_shape(out_features: int,
                   o_tile: Optional[int] = None) -> tuple:
    """(o_t, o_pad): tile width + padded O for the K-major layout — shared
    with runtime.precompile so AOT shape trees match the runtime layout.

    Mosaic requires a (.., o_t) output block's lane dim to be a multiple
    of 128 or the whole array; when O has no 128-aligned divisor <= target
    (Phi's vocab 32064) the layout pads O with zero-scale rows to the next
    tile multiple (32064 -> 63x512 + 192 dead rows, 0.6% extra work) and
    qmatmul_kmajor slices them back off."""
    target = o_tile or _VM_OTILE
    t = _pick_o_tile(out_features, target)
    if t == out_features or t % 128 == 0:
        return t, out_features
    t = max(128, target - target % 128)
    return t, -(-out_features // t) * t


def kmajor_o_tile(out_features: int, o_tile: Optional[int] = None) -> int:
    """The output-tile width to_kmajor uses for a given O."""
    return kmajor_o_shape(out_features, o_tile)[0]


# ---------------------------------------------------------------- repack

@functools.partial(jax.jit, static_argnames=("o_t",), donate_argnums=(0,))
def _repack_donate(a: jax.Array, o_t: int) -> jax.Array:
    L, O, last = a.shape
    return a.reshape(L, O // o_t, o_t, last).transpose(0, 1, 3, 2)


@functools.partial(jax.jit, static_argnames=("o_t",))
def _repack(a: jax.Array, o_t: int) -> jax.Array:
    L, O, last = a.shape
    return a.reshape(L, O // o_t, o_t, last).transpose(0, 1, 3, 2)


def to_kmajor(qt: QTensor, o_tile: Optional[int] = None,
              donate: bool = False) -> QTensor:
    """Repack a row-major QTensor (stacked (L, O, Kb) or flat (O, Kb)) into
    the K-major tiled layout.  `donate` frees the row-major buffers (use
    when the caller replaces its params wholesale); the repack itself is a
    device-side transpose (one transient copy of the tensor)."""
    if qt.qtype == QuantType.NONE:
        raise ValueError("K-major layout is for quantized tensors")
    if getattr(qt, "kmajor", False):
        return qt
    q, s = qt.q, qt.s
    if q.ndim == 2:
        q, s = q[None], s[None]
    assert q.ndim == 3, q.shape
    o_t, o_pad = kmajor_o_shape(qt.out_features, o_tile)
    if o_pad != qt.out_features:
        pad = ((0, 0), (0, o_pad - qt.out_features), (0, 0))
        q = jnp.pad(q, pad)
        s = jnp.pad(s, pad)     # zero scales: dead rows contribute 0
    rp = _repack_donate if donate else _repack
    return QTensor(rp(q, o_t), rp(s, o_t), qt.qtype, qt.group_size,
                   qt.out_features, qt.in_features, kmajor=True)


def kmajor_to_dense(qt: QTensor) -> jax.Array:
    """Dequantize a K-major QTensor back to float (L, O, K) — tests and
    the T>512 fallback."""
    from lmrs_tpu.quant import unpack_q4

    L, n_o, kb, o_t = qt.q.shape
    o_pad = n_o * o_t
    q2 = qt.q.transpose(0, 1, 3, 2).reshape(L, o_pad, kb)
    s2 = qt.s.transpose(0, 1, 3, 2).reshape(L, o_pad, -1)
    if o_pad != qt.out_features:
        q2 = q2[:, :qt.out_features]
        s2 = s2[:, :qt.out_features]
    if qt.qtype == QuantType.Q4_0:
        vals = unpack_q4(q2, qt.group_size).astype(jnp.float32)
    else:
        vals = q2.astype(jnp.float32)
    gs = qt.group_size
    g = vals.reshape(L, qt.out_features, qt.in_features // gs, gs)
    return (g * s2[..., None]).reshape(L, qt.out_features, qt.in_features)


def kmajor_params(params, o_tile: Optional[int] = None, donate: bool = True):
    """Convert a scan-fast TransformerParams (stacked + fused, quantized)
    to the K-major decode layout.  Leaves non-quantized tensors (norms,
    rope tables) untouched; row-major buffers are donated by default."""
    layers = params.layers
    if isinstance(layers, (list, tuple)) or layers.wqkv is None:
        raise ValueError("K-major layout needs the stacked fused "
                         "(scan-fast) param layout")
    if layers.wqkv.qtype == QuantType.NONE:
        return params

    def cv(qt):
        return None if qt is None else to_kmajor(qt, o_tile, donate=donate)

    new_layers = dataclasses.replace(
        layers, wqkv=cv(layers.wqkv), wo=cv(layers.wo),
        w13=cv(layers.w13), w2=cv(layers.w2))
    return dataclasses.replace(
        params, layers=new_layers, embed=cv(params.embed),
        lm_head=cv(params.lm_head))


# ---------------------------------------------------------------- kernels

# Per-group reduction strategy inside the T=1 kernels:
#   reshape (default) — (c·rows, O_T) → (c, rows, O_T), sublane-reduce
#   dot               — fold-matrix (c, c·rows) @ product on the MXU
# (the product tensor is activation-sized, so the dot is not weight-bound)
_VM_REDUCE = os.environ.get("LMRS_VM_REDUCE", "reshape")
# Groups per unrolled chunk, sized in f32 temporary ELEMENTS.  The
# original kernels unrolled a Python loop PER GROUP (112 iterations on
# gemma-9b's w2) which made Mosaic build each decode program's kernels in
# minutes server-side — the chunked form is the same math on c groups at
# a time.  Measured on gemma-9b Q4 (results_r5/bench_9b_q4_chunked*.log):
# warmup 1747 s (per-group) → 140 s (1M) → 133 s (4M default), decode
# 64.19 → 63.68 → 63.89 tok/s — 13× faster cold start for ~0.5% decode.
# 4M f32 ≈ 16 MB per temporary; gemma-9b's largest matvec runs as one
# chunk well inside the 100 MB VMEM budget.
_VM_CHUNK_ELEMS = int(os.environ.get("LMRS_VM_CHUNK_ELEMS", str(1 << 22)))
# Branch for 2 <= T <= 8 (speculative verify windows, small batched
# steps).  The xe kernels' integer dot computes the FULL (T*G, O_T)
# product of which only the block-diagonal G-th is useful — G-fold
# redundant MXU work — while the s@E kernels dequantize (VPU) and run a
# non-redundant bf16 dot at the MXU weight-load wall.  Measured at T=8
# on the gemma-9b Q8 shapes (results_r5/probe_smallt8_{xe,se}.log,
# us/call xe vs se): wqkv[G=28] 58.6/55.2, wo[G=32] 34.6/28.9,
# w13[G=28] 175.6/183.6, w2[G=112] 345.7/100.3 — xe wins below G~32,
# se wins big beyond it, exactly as the redundancy model predicts.
#   "auto" (default): se when G = K/gs > 48, else xe (per tensor)
#   "xe" / "se": force one branch (A/B knob)
_VM_SMALL_T = os.environ.get("LMRS_VM_SMALL_T", "auto")
_VM_SE_MIN_G = int(os.environ.get("LMRS_VM_SE_MIN_G", "48"))


def _group_chunks(n_g: int, rows: int, o_t: int):
    c = max(1, _VM_CHUNK_ELEMS // (rows * o_t))
    if c > 8:
        c -= c % 8                       # keep sublane slice offsets aligned
    out, g0 = [], 0
    while g0 < n_g:
        out.append((g0, min(c, n_g - g0)))
        g0 += c
    return out


def _reduce_groups(t, c: int, rows: int, o_t: int):
    """(c·rows, O_T) elementwise product → per-group sums (c, O_T)."""
    if _VM_REDUCE == "dot" and c > 1:
        fold = jnp.asarray(np.kron(np.eye(c, dtype=np.float32),
                                   np.ones((1, rows), np.float32)))
        return jax.lax.dot_general(
            fold, t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return jnp.sum(t.reshape(c, rows, o_t), axis=1)


def _vm_q8_kernel(l_ref, xcol_ref, w_ref, s_ref, o_ref, *, gs: int):
    """T=1 int8 VPU matvec: y[1, O_T] = sum_g s[g, :] * sum_k w[k, :]*x[k].

    xcol_ref is (K, 1) — the activation broadcast runs along lanes and the
    per-group reduction down sublanes, c groups per unrolled chunk.
    ~3 VPU ops/value (convert, mul, fma): HBM-bound at int8's
    1 byte/value (797 G values/s measured)."""
    kb = w_ref.shape[2]
    n_g = kb // gs
    o_t = o_ref.shape[1]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for g0, c in _group_chunks(n_g, gs, o_t):
        r0, r1 = g0 * gs, (g0 + c) * gs
        wg = w_ref[0, 0, r0:r1, :].astype(jnp.float32)
        part = _reduce_groups(wg * xcol_ref[r0:r1, :], c, gs, o_t)
        acc = acc + jnp.sum(s_ref[0, 0, g0:g0 + c, :] * part,
                            axis=0, keepdims=True)
    o_ref[:] = acc


def _vm_q4_kernel(l_ref, xlf_ref, xhf_ref, corr_ref, w_ref, s_ref,
                  o_ref, *, gs: int):
    """T=1 packed-Q4 VPU matvec on XOR-0x80 biased bytes (quant.unpack_q4):
    the int8 view of a stored byte reads exactly u-128, so with
    u = 16*hi + lo:  h0 = floor(vf/16) = hi-8,  lo = vf-16*h0 in [0,15],
    and (lo-8)*xl + (hi-8)*xh = lo*xl + h0*xh - 8*sum(xl)  — the last term
    is weight-independent per group (corr).  xlf/xhf are (K/2, 1) columns
    in packed-row order (row g·half+j ↦ x[g·gs+j] / x[g·gs+half+j]), corr
    is (G, 1).  ~3.5 VPU ops/value: VPU-compute-bound (0.5 byte/value
    leaves HBM half idle — the ceiling is the VPU's ~3.85 T ops/s)."""
    half = gs // 2
    kb = w_ref.shape[2]
    n_g = (2 * kb) // gs
    o_t = o_ref.shape[1]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    vfull = pltpu.bitcast(w_ref[0, 0], jnp.int8)
    for g0, c in _group_chunks(n_g, half, o_t):
        r0, r1 = g0 * half, (g0 + c) * half
        vf = vfull[r0:r1, :].astype(jnp.float32)
        h0 = jnp.floor(vf * 0.0625)
        lo = vf - 16.0 * h0
        t = lo * xlf_ref[r0:r1, :] + h0 * xhf_ref[r0:r1, :]
        part = _reduce_groups(t, c, half, o_t) + corr_ref[g0:g0 + c, :]
        acc = acc + jnp.sum(s_ref[0, 0, g0:g0 + c, :] * part,
                            axis=0, keepdims=True)
    o_ref[:] = acc


def _xe_i8_km_kernel(l_ref, xe_ref, xs_ref, w_ref, s_ref, mt_ref, o_ref, *,
                     t: int):
    """W8A8 x-expansion on K-major weights (2<=T<=8 — speculative verify
    windows).  Same integer-dot-then-scale formula as the row-major
    _q8_xei8_stacked_kernel (kernels/dequant_matmul.py), with transposed
    dimension numbers: p[(t,g), o] = one int8 MXU pass."""
    p = jax.lax.dot_general(
        xe_ref[:], w_ref[0, 0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                 # (T·G, O_T)
    s = s_ref[0, 0]                                       # (G, O_T)
    s_rep = s if t == 1 else jnp.concatenate([s] * t, axis=0)
    pf = p.astype(jnp.float32) * s_rep * xs_ref[:]        # xs (T·G, 1)
    o_ref[:] = jax.lax.dot_general(
        mt_ref[:], pf, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (T_pad, O_T)


def _xe_q4_km_kernel(l_ref, xel_ref, xeh_ref, corr_ref, w_ref, s_ref,
                     mt_ref, o_ref, *, t: int):
    """Packed-Q4 x-expansion on K-major weights (2<=T<=8): the biased-byte
    nibble split of _vm_q4_kernel_impl, two f32 MXU dots against the
    half-group expanded activations (the dots' N = T·G is tiny)."""
    vf = pltpu.bitcast(w_ref[0, 0], jnp.int8).astype(jnp.float32)
    h0 = jnp.floor(vf * 0.0625)
    lo = vf - 16.0 * h0
    p = (jax.lax.dot_general(
            xel_ref[:], lo, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
         + jax.lax.dot_general(
            xeh_ref[:], h0, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))          # (T·G, O_T)
    p = p + corr_ref[:]                                   # corr (T·G, 1)
    s = s_ref[0, 0]
    s_rep = s if t == 1 else jnp.concatenate([s] * t, axis=0)
    o_ref[:] = jax.lax.dot_general(
        mt_ref[:], p * s_rep, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _se_q8_km_kernel(l_ref, x_ref, w_ref, s_ref, et_ref, o_ref):
    """s@E prefill kernel on K-major weights (8<T<=512): per-group scales
    broadcast to per-element via a constant 0/1 matmul, one dequant
    multiply, one (T_pad, K)x(K, O_T) MXU dot."""
    s_rep = jnp.dot(et_ref[:], s_ref[0, 0].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    w_bf = w_ref[0, 0].astype(jnp.bfloat16) * s_rep       # (K, O_T)
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_bf, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (T_pad, O_T)


def _se_q4_km_kernel(l_ref, xlo_ref, xhi_ref, w_ref, s_ref, eth_ref, o_ref):
    s_rep = jnp.dot(eth_ref[:], s_ref[0, 0].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    vf = pltpu.bitcast(w_ref[0, 0], jnp.int8).astype(jnp.float32)
    h0 = jnp.floor(vf * 0.0625)
    lo = ((vf - 16.0 * h0) - 8.0).astype(jnp.bfloat16) * s_rep
    hi = h0.astype(jnp.bfloat16) * s_rep                  # (Kb, O_T)
    o_ref[:] = (
        jax.lax.dot_general(xlo_ref[:], lo,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(xhi_ref[:], hi,
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32))


# ---------------------------------------------------------------- dispatch

def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, l: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _w_spec(shape):
    return pl.BlockSpec((1, 1) + shape[2:],
                        lambda i, l: (l[0], i, 0, 0),
                        memory_space=pltpu.VMEM)


def qmatmul_kmajor(x: jax.Array, w: QTensor, layer_idx, *,
                   interpret: Optional[bool] = None) -> jax.Array:
    """y = x @ W[layer]^T for K-major tiled quantized weights."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    n = x.shape[-1]
    assert n == w.in_features, (x.shape, w.logical_shape)
    L, n_o, kb, o_t = w.q.shape
    o = w.out_features
    o_pad = n_o * o_t       # > o when the layout padded O (kmajor_o_shape)
    gs = w.group_size
    g_tot = n // gs
    x2 = x.reshape(-1, n)
    t = x2.shape[0]
    l_arr = jnp.asarray([layer_idx], jnp.int32)
    q4 = w.qtype == QuantType.Q4_0
    vmem = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    if t == 1:
        if q4:
            half = gs // 2
            xg2 = x2.reshape(g_tot, gs).astype(jnp.float32)
            xlf = xg2[:, :half].reshape(n // 2, 1)         # packed-row order
            xhf = xg2[:, half:].reshape(n // 2, 1)
            corr = (-8.0 * jnp.sum(xg2[:, :half], axis=1)).reshape(g_tot, 1)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_o,),
                in_specs=[_const_spec((n // 2, 1)),
                          _const_spec((n // 2, 1)),
                          _const_spec((g_tot, 1)),
                          _w_spec(w.q.shape),
                          _w_spec(w.s.shape)],
                out_specs=pl.BlockSpec((1, o_t), lambda i, l: (0, i),
                                       memory_space=pltpu.VMEM))
            out = pl.pallas_call(
                _cached_partial(_vm_q4_kernel, gs=gs),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((1, o_pad), jnp.float32),
                compiler_params=vmem, interpret=interpret,
            )(l_arr, xlf, xhf, corr, w.q, w.s)
        else:
            xcol = x2.reshape(n, 1).astype(jnp.float32)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_o,),
                in_specs=[_const_spec((n, 1)),
                          _w_spec(w.q.shape),
                          _w_spec(w.s.shape)],
                out_specs=pl.BlockSpec((1, o_t), lambda i, l: (0, i),
                                       memory_space=pltpu.VMEM))
            out = pl.pallas_call(
                _cached_partial(_vm_q8_kernel, gs=gs),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((1, o_pad), jnp.float32),
                compiler_params=vmem, interpret=interpret,
            )(l_arr, xcol, w.q, w.s)
        return out[:, :o].reshape(*lead, o)

    use_xe = (_VM_SMALL_T == "xe"
              or (_VM_SMALL_T == "auto" and g_tot <= _VM_SE_MIN_G))
    if t <= 8 and use_xe:
        t_pad = 8
        mt = jnp.asarray(_fold_matrix(t, g_tot, t_pad).T.copy())
        if q4:
            half = gs // 2
            xg = x2.astype(jnp.bfloat16).reshape(t, g_tot, gs)
            x_l = xg[:, :, :half]
            x_h = xg[:, :, half:]
            corr = (-8.0 * jnp.sum(x_l.astype(jnp.float32), axis=2)
                    ).reshape(t * g_tot, 1)
            xel = _build_xe(x_l.reshape(t, n // 2), 1, n // 2, half)[0]
            xeh = _build_xe(x_h.reshape(t, n // 2), 1, n // 2, half)[0]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_o,),
                in_specs=[_const_spec((n // 2, t * g_tot)),
                          _const_spec((n // 2, t * g_tot)),
                          _const_spec((t * g_tot, 1)),
                          _w_spec(w.q.shape),
                          _w_spec(w.s.shape),
                          _const_spec((t_pad, t * g_tot))],
                out_specs=pl.BlockSpec((t_pad, o_t), lambda i, l: (0, i),
                                       memory_space=pltpu.VMEM))
            out = pl.pallas_call(
                _cached_partial(_xe_q4_km_kernel, t=t),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((t_pad, o_pad), jnp.float32),
                compiler_params=vmem, interpret=interpret,
            )(l_arr, xel.astype(jnp.float32), xeh.astype(jnp.float32),
              corr, w.q, w.s, mt)
        else:
            xq, xs = quantize_q8_act(x2, gs)
            xe = _build_xe(xq.astype(jnp.float32), 1, n, gs)[0] \
                .astype(jnp.int8)                          # (K, T·G)
            xs_col = xs.reshape(t * g_tot, 1)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_o,),
                in_specs=[_const_spec((n, t * g_tot)),
                          _const_spec((t * g_tot, 1)),
                          _w_spec(w.q.shape),
                          _w_spec(w.s.shape),
                          _const_spec((t_pad, t * g_tot))],
                out_specs=pl.BlockSpec((t_pad, o_t), lambda i, l: (0, i),
                                       memory_space=pltpu.VMEM))
            out = pl.pallas_call(
                _cached_partial(_xe_i8_km_kernel, t=t),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((t_pad, o_pad), jnp.float32),
                compiler_params=vmem, interpret=interpret,
            )(l_arr, xe, xs_col, w.q, w.s, mt)
        return out[:t, :o].reshape(*lead, o)

    if t <= 512:
        t_pad = max(8, 1 << (t - 1).bit_length())
        x2b = x2.astype(jnp.bfloat16)
        if t_pad != t:
            x2b = jnp.pad(x2b, ((0, t_pad - t), (0, 0)))
        if q4:
            half = gs // 2
            xg = x2b.reshape(t_pad, g_tot, gs)
            x_lo = xg[:, :, :half].reshape(t_pad, n // 2)
            x_hi = xg[:, :, half:].reshape(t_pad, n // 2)
            eth = jnp.asarray(_expansion_matrix(g_tot, n // 2).T.copy(),
                              jnp.bfloat16)               # (Kb, G)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_o,),
                in_specs=[_const_spec((t_pad, n // 2)),
                          _const_spec((t_pad, n // 2)),
                          _w_spec(w.q.shape),
                          _w_spec(w.s.shape),
                          _const_spec((n // 2, g_tot))],
                out_specs=pl.BlockSpec((t_pad, o_t), lambda i, l: (0, i),
                                       memory_space=pltpu.VMEM))
            out = pl.pallas_call(
                _se_q4_km_kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((t_pad, o_pad), jnp.float32),
                compiler_params=vmem, interpret=interpret,
            )(l_arr, x_lo, x_hi, w.q, w.s, eth)
        else:
            et = jnp.asarray(_expansion_matrix(g_tot, n).T.copy(),
                             jnp.bfloat16)                # (K, G)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_o,),
                in_specs=[_const_spec((t_pad, n)),
                          _w_spec(w.q.shape),
                          _w_spec(w.s.shape),
                          _const_spec((n, g_tot))],
                out_specs=pl.BlockSpec((t_pad, o_t), lambda i, l: (0, i),
                                       memory_space=pltpu.VMEM))
            out = pl.pallas_call(
                _se_q8_km_kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((t_pad, o_pad), jnp.float32),
                compiler_params=vmem, interpret=interpret,
            )(l_arr, x2b, w.q, w.s, et)
        return out[:t, :o].reshape(*lead, o)

    # T > 512 (vision-sized activations never reach the K-major layout;
    # this covers oversized user prefill chunks): dense XLA dot on the
    # dequantized layer — weights materialize once through HBM, amortized
    # over thousands of rows.
    return qmatmul_kmajor_dense(x, w, layer_idx)


def qmatmul_kmajor_dense(x: jax.Array, w: QTensor, layer_idx) -> jax.Array:
    """Pure-XLA y = x @ W[layer]^T on K-major weights: dequantize the
    layer slice, one bf16 dot.  Serves two roles: qmatmul_kmajor's T>512
    tail, and the ops.matmul impl="xla" serving fallback — a no-Pallas
    program hits the persistent compile cache across processes (Mosaic
    kernel builds are per-process on the axon server), so a fresh server
    can emit tokens from THIS path while the fast kernels build in the
    background (runtime.engine fallback_until)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    sl = lambda a: jax.lax.dynamic_slice(
        a, (layer_idx,) + (0,) * (a.ndim - 1), (1,) + a.shape[1:])
    wl = QTensor(sl(w.q), sl(w.s), w.qtype, w.group_size, w.out_features,
                 w.in_features, kmajor=True)
    wd = kmajor_to_dense(wl)[0].astype(jnp.bfloat16)       # (O, K)
    y = jnp.dot(x2.astype(jnp.bfloat16), wd.T,
                preferred_element_type=jnp.float32)
    return y.reshape(*lead, w.out_features)
