"""Quantized matmul: the framework's hot op.

The reference's CPU kernels (reference: src/functional.rs:142-280) stream
int8/int4 weights row-by-row with SIMD dots per quantization group.  The
TPU-native formulation keeps the exact same arithmetic — integer dot per
group, then float32 (int_dot * w_scale * x_scale) accumulated over groups —
but expresses it as one batched `dot_general` over the group axis so XLA maps
it onto the MXU's int8 path:

    y[b,o] = sum_g  float( sum_k  w_q[o,g,k] * x_q[b,g,k] ) * w_s[o,g] * x_s[b,g]

Activations are re-quantized per call with the reference's runtime scheme
(see lmrs_tpu.quant), which keeps greedy-decode parity with lm.rs at the same
bit width and group size.

A fused Pallas kernel (lmrs_tpu.kernels.dequant_matmul) implements the same
contraction with packed-int4 unpacking in VMEM; this module is the XLA
reference path and the fallback on non-TPU backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lmrs_tpu.quant import (
    QTensor,
    QuantType,
    quantize_q4_act,
    quantize_q8_act,
    unpack_q4,
)


def _group_dot(xq: jax.Array, xs: jax.Array, wq: jax.Array, ws: jax.Array,
               group_size: int) -> jax.Array:
    """Shared Q8/Q4 contraction.

    xq int8 (B, n), xs f32 (B, G); wq int8 (O, n), ws f32 (O, G) → f32 (B, O).
    """
    b, n = xq.shape
    o = wq.shape[0]
    g = n // group_size
    xg = xq.reshape(b, g, group_size)
    wg = wq.reshape(o, g, group_size)
    # Batched over the group axis: (G, B, gs) x (G, O, gs) -> (G, B, O) int32.
    ival = jax.lax.dot_general(
        xg.transpose(1, 0, 2),
        wg.transpose(1, 0, 2),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    scaled = ival.astype(jnp.float32) * xs.T[:, :, None] * ws.T[:, None, :]
    return jnp.sum(scaled, axis=0)


def qmatmul(x: jax.Array, w: QTensor, impl: str = "exact",
            layer_idx=None) -> jax.Array:
    """y = x @ W^T for a quantized weight matrix W of logical shape (out, in).

    `x` is float (..., in); returns float32 (..., out).

    impl="exact": activations are first re-quantized group-wise exactly as
    the reference does before every quantized matmul (reference:
    src/transformer.rs:424-437) and the contraction is integer-exact —
    bit-parity with lm.rs.

    impl="fast": fused Pallas dequant-matmul — weights stream HBM→VMEM
    once, packed int4 unpacks in VMEM.  Q8 decode-shaped stacked calls run
    W8A8 (the reference's own integer scheme, matching the exact path to
    ~1e-7); Q4 and prefill run W4A16/W8A16 (no activation quantization).
    The throughput path.
    """
    if impl == "xla":
        # No-Pallas serving fallback: pure-XLA programs hit the
        # persistent compile cache ACROSS processes, while Mosaic kernel
        # builds are per-process on the axon server — a fresh server
        # process serves its first tokens from this path while the fast
        # kernels build in background (Engine.fallback_until /
        # serve.backend --background-warmup).  Dequantize-then-dot: same
        # W[4|8]A16 numerics class as the fast prefill kernels, ~2-3x the
        # decode HBM traffic (packed read + dequant write/read).
        if w.qtype == QuantType.NONE:
            lead = x.shape[:-1]
            y = jnp.dot(x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16),
                        w.q.astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32)
            return y.reshape(*lead, w.out_features)
        if w.kmajor:
            from lmrs_tpu.kernels.vpu_matvec import qmatmul_kmajor_dense

            return qmatmul_kmajor_dense(
                x, w, 0 if layer_idx is None else layer_idx)
        from lmrs_tpu.quant import dequantize

        wq, ws = w.q, w.s
        if layer_idx is not None and wq.ndim == 3:
            sl = lambda a: jax.lax.dynamic_slice(
                a, (layer_idx,) + (0,) * (a.ndim - 1), (1,) + a.shape[1:])
            wq, ws = sl(wq)[0], sl(ws)[0]
        wl = QTensor(wq, ws, w.qtype, w.group_size, w.out_features,
                     w.in_features)
        lead = x.shape[:-1]
        wd = dequantize(wl).astype(jnp.bfloat16)
        y = jnp.dot(x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16), wd.T,
                    preferred_element_type=jnp.float32)
        return y.reshape(*lead, w.out_features)
    if w.kmajor and impl != "fast":
        raise ValueError(
            "K-major tiled weights only run under matmul_impl='fast' or "
            "'xla' (the exact path's bit-parity integer contraction has "
            "no K-major variant) — keep row-major params for impl="
            f"{impl!r}")
    if impl == "fast" and w.qtype != QuantType.NONE:
        if w.kmajor:
            # K-major tiled decode layout: T=1 runs the VPU matvec (2x the
            # MXU xe kernels' weight streaming rate at matvec shapes — see
            # kernels/vpu_matvec.py), larger T the K-major xe/s@E variants
            from lmrs_tpu.kernels.vpu_matvec import qmatmul_kmajor

            return qmatmul_kmajor(
                x, w, 0 if layer_idx is None else layer_idx)
        from lmrs_tpu.kernels.dequant_matmul import (qmatmul_pallas,
                                                     qmatmul_pallas_stacked,
                                                     qmatmul_pallas_xe)

        if layer_idx is not None and w.q.ndim == 3:
            # layer-stacked weights + scalar-prefetched layer index: one
            # pallas call site serves every layer of a lax.scan (minutes
            # of per-call-site compile saved on the axon remote compiler)
            return qmatmul_pallas_stacked(x, w, layer_idx)
        # Decode-shaped calls (T <= 8) use the x-expansion kernels: no
        # full-tile VPU scale work, so they stream at the convert-only
        # ceiling.  The expanded MXU N dim is T*(k_tile/gs); beyond T~8 it
        # outgrows the s@E kernel, which then wins (prefill chunks).
        t = int(np.prod(x.shape[:-1]))
        if t <= 8:
            return qmatmul_pallas_xe(x, w)
        if t <= 512:
            return qmatmul_pallas(x, w)
        # Very large T (vision encoder: num_crops*576 rows): weights are
        # amortized over thousands of activations, so a plain XLA dot on
        # the dequantized matrix wins — and the Pallas kernels' padded
        # activation blocks would blow VMEM at these shapes.
        from lmrs_tpu.quant import dequantize

        lead = x.shape[:-1]
        wd = dequantize(w).astype(jnp.bfloat16)
        y = jnp.dot(x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16), wd.T,
                    preferred_element_type=jnp.float32)
        return y.reshape(*lead, w.out_features)
    lead = x.shape[:-1]
    n = x.shape[-1]
    assert n == w.in_features, (x.shape, w.logical_shape)
    x2 = x.reshape(-1, n)

    if w.qtype == QuantType.NONE:
        # HIGHEST: true-f32 passes on the MXU (TPU default rounds to bf16)
        y = jnp.dot(x2.astype(jnp.float32), w.q.astype(jnp.float32).T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    elif w.qtype == QuantType.Q8_0:
        xq, xs = quantize_q8_act(x2, w.group_size)
        y = _group_dot(xq, xs, w.q, w.s, w.group_size)
    elif w.qtype == QuantType.Q4_0:
        xq, xs = quantize_q4_act(x2, w.group_size)
        wq = unpack_q4(w.q, w.group_size)
        y = _group_dot(xq, xs, wq, w.s, w.group_size)
    else:
        raise ValueError(w.qtype)
    return y.reshape(*lead, w.out_features)
