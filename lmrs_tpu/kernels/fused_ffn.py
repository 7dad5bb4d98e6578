"""Fused FFN kernel: [gate;up] matmul → GLU → down matmul in ONE Pallas call.

The decode step is dominated by fixed per-kernel-call overhead (~25-40us
each through the runtime) on top of HBM streaming; fusing the FFN's two
quantized matmuls and the GLU nonlinearity into one call removes a call
plus the XLA glue between them.  The reference computes the same math as
three separate passes (reference: src/transformer.rs:588-640).

Structure (single 1-D grid):
  steps 0..n_h-1       stage A: y13[h_tile rows] = W13_tile @ xn
  step  n_h            (first B step) g = act(y13[:H]) * y13[H:]  (VMEM)
  steps n_h..n_h+n_d*n_k2-1   stage B: out[d_tile] += W2_tile @ g_tile

Weight tiles stream HBM→VMEM exactly once; y13/g live in VMEM scratch
(f32 (2H, T) + bf16 (H, T) — fits for every supported config at T<=16).

Q4 trick: W2's runtime nibble layout wants its activation split into
per-group halves along H (see quant.unpack_q4).  Instead of lane-shuffling
g in-kernel, the LOADER pre-permutes W13's output rows (ffn_split_perm)
so stage A writes y13 — and therefore g — directly in W2's split order;
stage B then just slices contiguous sublane halves.

Activations arrive pre-normed from XLA (the rmsnorm is one cheap fusion);
for Q4 they additionally arrive pre-split along D (x_lo/x_hi).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lmrs_tpu.quant import QTensor, QuantType
from lmrs_tpu.kernels.dequant_matmul import _expansion_matrix, _pick_tile


def ffn_split_perm(h: int, group_size: int) -> np.ndarray:
    """Permutation P over [0, h): P[i] = logical H position whose GLU value
    must sit at scratch row i so that rows [0, h/2) are the per-group first
    halves and rows [h/2, h) the second halves (W2's Q4 nibble layout)."""
    hs = group_size // 2
    q = np.arange(h // 2)
    lo = (q // hs) * group_size + (q % hs)
    hi = lo + hs
    return np.concatenate([lo, hi])


def _dequant_bf16(w_bits, s_rep, qtype: QuantType):
    """Unpack a weight tile to bf16 rows scaled by s_rep.

    Q8: one (o, k) tile.  Q4: returns (lo, hi) halves of shape (o, k/2)."""
    if qtype == QuantType.Q8_0:
        return w_bits.astype(jnp.bfloat16) * s_rep
    # comparison-free f32 unpack of the XOR-0x80 BIASED runtime bytes
    # (see dequant_matmul._q4_kernel): int8 view = u - 128, so
    # floor(vf/16) = hi - 8 directly
    vf = pltpu.bitcast(w_bits, jnp.int8).astype(jnp.float32)
    h0 = jnp.floor(vf * 0.0625)
    lo = ((vf - h0 * 16.0) - 8.0).astype(jnp.bfloat16) * s_rep
    hi = h0.astype(jnp.bfloat16) * s_rep
    return lo, hi


def _ffn_kernel(x_refs, w13_ref, s13_ref, e13_ref, w2_ref, s2_ref, e2_ref,
                o_ref, y13_ref, g_ref, acc_ref, *,
                qtype: QuantType, n_h: int, n_k2: int, h_tile: int,
                hidden: int, act: str, t_pad: int):
    i = pl.program_id(0)

    # ---- stage A: one (h_tile, D) tile of the fused [gate;up] matmul ----
    @pl.when(i < n_h)
    def _():
        # s13 block is 2-D (h_tile, G) — unlike stage B's pre-tiled 3-D block
        s_rep = jnp.dot(s13_ref[:].astype(jnp.bfloat16), e13_ref[:],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        if qtype == QuantType.Q8_0:
            w_bf = _dequant_bf16(w13_ref[:], s_rep, qtype)
            y = jax.lax.dot_general(
                w_bf, x_refs[0][:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            lo, hi = _dequant_bf16(w13_ref[:], s_rep, qtype)
            y = (jax.lax.dot_general(
                    lo, x_refs[0][:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(
                    hi, x_refs[1][:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
        y13_ref[pl.ds(i * h_tile, h_tile), :] = y

    # ---- GLU once, when all of y13 is ready ----
    @pl.when(i == n_h)
    def _():
        gate = y13_ref[pl.ds(0, hidden), :]
        up = y13_ref[pl.ds(hidden, hidden), :]
        if act == "silu":
            a = gate * (1.0 / (1.0 + jnp.exp(-gate)))
        else:  # gelu_tanh (reference: src/transformer.rs:592-604)
            a = 0.5 * gate * (1.0 + jnp.tanh(
                0.7978845608028654 * (gate + 0.044715 * gate * gate * gate)))
        g_ref[:, :] = (a * up).astype(jnp.bfloat16)

    # ---- stage B: (d_tile, k2_tile) tiles of the down matmul ----
    @pl.when(i >= n_h)
    def _():
        j = i - n_h
        k_idx = jax.lax.rem(j, n_k2)

        @pl.when(k_idx == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        s_rep = jnp.dot(s2_ref[0].astype(jnp.bfloat16), e2_ref[:],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        if qtype == QuantType.Q8_0:
            k2_tile = w2_ref.shape[1]
            g_t = g_ref[pl.ds(k_idx * k2_tile, k2_tile), :]
            w_bf = _dequant_bf16(w2_ref[:], s_rep, qtype)
            acc_ref[:] += jax.lax.dot_general(
                w_bf, g_t, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            # g rows are pre-split: [0, H/2) = per-group first halves.
            k2h = w2_ref.shape[1]          # bytes = k2_tile/2 values/half
            lo_w, hi_w = _dequant_bf16(w2_ref[:], s_rep, qtype)
            g_lo = g_ref[pl.ds(k_idx * k2h, k2h), :]
            g_hi = g_ref[pl.ds(hidden // 2 + k_idx * k2h, k2h), :]
            acc_ref[:] += (
                jax.lax.dot_general(
                    lo_w, g_lo, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    hi_w, g_hi, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))

        @pl.when(k_idx == n_k2 - 1)
        def _():
            o_ref[:] = acc_ref[:]


def ffn_fused_pallas(xn: jax.Array, w13: QTensor, w2: QTensor, *,
                     act: str, interpret: Optional[bool] = None) -> jax.Array:
    """ffn(xn) = W2 @ glu(W13 @ xn): xn pre-normed (T, D) float.

    Returns (T, D_out) f32.  Q4 requires w13 rows pre-permuted with
    ffn_split_perm (the loader does this; see io/params.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qtype = w13.qtype
    assert w2.qtype == qtype
    d = xn.shape[-1]
    h2 = w13.out_features
    hidden = h2 // 2
    d_out = w2.out_features
    gs = w13.group_size
    lead = xn.shape[:-1]

    x2 = xn.reshape(-1, d).astype(jnp.bfloat16)
    t = x2.shape[0]
    t_pad = max(16, 1 << (t - 1).bit_length())
    if t_pad != t:
        x2 = jnp.pad(x2, ((0, t_pad - t), (0, 0)))

    # VMEM: the dequant materializes bf16 intermediates of the whole
    # (h_tile, D[/2]) tile (1 for Q8, ~4 for Q4) next to the y13/g scratch
    h_tile = _pick_tile(h2, 512 if qtype == QuantType.Q8_0 else 256, 128)
    n_h = h2 // h_tile
    d_tile = _pick_tile(d_out, 512, 128)
    n_d = d_out // d_tile
    k2_tile = _pick_tile(hidden, 2048, max(gs * 2, 256))
    n_k2 = hidden // k2_tile
    g2_tile = k2_tile // gs

    grid = (n_h + n_d * n_k2,)

    def a_idx(i):
        return jnp.minimum(i, n_h - 1)

    def b_d(i):
        return jnp.maximum(i - n_h, 0) // n_k2

    def b_k(i):
        return jax.lax.rem(jnp.maximum(i - n_h, 0), n_k2)

    # stage-B scales pre-tiled like qmatmul_pallas: (n_k2, D_out, g2_tile)
    s2_tiled = w2.s.reshape(d_out, n_k2, g2_tile).transpose(1, 0, 2)

    g13 = d // gs
    e13 = jnp.asarray(_expansion_matrix(
        g13, d if qtype == QuantType.Q8_0 else d // 2), jnp.bfloat16)
    e2 = jnp.asarray(_expansion_matrix(
        g2_tile, k2_tile if qtype == QuantType.Q8_0 else k2_tile // 2),
        jnp.bfloat16)

    if qtype == QuantType.Q8_0:
        x_specs = [pl.BlockSpec((t_pad, d), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)]
        x_args = [x2]
        w13_spec = pl.BlockSpec((h_tile, d), lambda i: (a_idx(i), 0),
                                memory_space=pltpu.VMEM)
        w2_spec = pl.BlockSpec((d_tile, k2_tile),
                               lambda i: (b_d(i), b_k(i)),
                               memory_space=pltpu.VMEM)
    elif qtype == QuantType.Q4_0:
        half = gs // 2
        xg = x2.reshape(t_pad, d // gs, gs)
        x_lo = xg[:, :, :half].reshape(t_pad, d // 2)
        x_hi = xg[:, :, half:].reshape(t_pad, d // 2)
        x_specs = [pl.BlockSpec((t_pad, d // 2), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((t_pad, d // 2), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)]
        x_args = [x_lo, x_hi]
        w13_spec = pl.BlockSpec((h_tile, d // 2), lambda i: (a_idx(i), 0),
                                memory_space=pltpu.VMEM)
        w2_spec = pl.BlockSpec((d_tile, k2_tile // 2),
                               lambda i: (b_d(i), b_k(i)),
                               memory_space=pltpu.VMEM)
    else:
        raise ValueError(qtype)

    kernel = functools.partial(
        _ffn_kernel, qtype=qtype, n_h=n_h, n_k2=n_k2, h_tile=h_tile,
        hidden=hidden, act=act, t_pad=t_pad)

    def wrapped(*args):
        x_args_in = args[:len(x_specs)]
        rest = args[len(x_specs):]
        return kernel(x_args_in, *rest)

    out = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=x_specs + [
            w13_spec,
            pl.BlockSpec((h_tile, g13), lambda i: (a_idx(i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(e13.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            w2_spec,
            pl.BlockSpec((1, d_tile, g2_tile),
                         lambda i: (b_k(i), b_d(i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(e2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_tile, t_pad), lambda i: (b_d(i), 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_out, t_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h2, t_pad), jnp.float32),      # y13
            pltpu.VMEM((hidden, t_pad), jnp.bfloat16),  # g
            pltpu.VMEM((d_tile, t_pad), jnp.float32),   # acc
        ],
        # the default 16M scoped-VMEM budget is too small for the y13/g
        # scratch next to both stages' dequant intermediates; v5e has 128M
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*x_args, w13.q, w13.s, e13, w2.q, s2_tiled, e2)

    y = out.T[:t]
    return y.reshape(*lead, d_out)
