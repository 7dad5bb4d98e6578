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


# ---------------------------------------------------------------------------
# Stacked + x-expansion fused FFN (decode path): one call per layer, weights
# selected by a scalar-prefetched layer index, per-group scales applied to
# tiny partial matrices (see dequant_matmul._q8_xe_kernel) — no full-tile
# scale materialization in either stage.
# ---------------------------------------------------------------------------

def _group_mask(k: int, gs: int) -> np.ndarray:
    """(K, G) 0/1 with M[j, g] = 1 iff j // gs == g."""
    g = k // gs
    m = np.zeros((k, g), np.float32)
    for i in range(g):
        m[i * gs:(i + 1) * gs, i] = 1.0
    return m


def _ffn_xe_kernel(l_ref, xe_refs, w13_ref, s13_ref, m1_ref, w2_ref, s2_ref,
                   e2_ref, m2_ref, o_ref, y13_ref, aexp_refs, suml_ref, *,
                   qtype: QuantType, n_h: int, h_tile: int, hidden: int,
                   act: str, t: int, g2: int, t_pad: int):
    i = pl.program_id(0)

    def xe_dot(w_bits, xrefs, corr):
        """Partial-sum matrix of a quantized tile against expanded x."""
        if qtype == QuantType.Q8_0:
            w_bf = w_bits.astype(jnp.bfloat16)
            p = jax.lax.dot_general(
                w_bf, xrefs[0][:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            vf = pltpu.bitcast(w_bits, jnp.int8).astype(jnp.float32)
            h0 = jnp.floor(vf * 0.0625)
            lo_bf = (vf - 16.0 * h0).astype(jnp.bfloat16)
            h_bf = h0.astype(jnp.bfloat16)
            p = (jax.lax.dot_general(
                    lo_bf, xrefs[0][:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(
                    h_bf, xrefs[1][:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            if corr is not None:
                p = p + corr
        return p

    # ---- stage A: one (h_tile, D) xe tile of the [gate;up] matmul --------
    @pl.when(i < n_h)
    def _():
        corr = xe_refs[-1][:] if qtype == QuantType.Q4_0 else None
        p = xe_dot(w13_ref[0], xe_refs, corr)          # (h_tile, T·G1)
        s = s13_ref[0]
        s_rep = s if t == 1 else jnp.concatenate([s] * t, axis=1)
        y = jax.lax.dot_general(
            p * s_rep, m1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (h_tile, t_pad)
        y13_ref[pl.ds(i * h_tile, h_tile), :] = y

    # ---- GLU + in-VMEM activation expansion, once --------------------------
    @pl.when(i == n_h)
    def _():
        gate = y13_ref[pl.ds(0, hidden), :]
        up = y13_ref[pl.ds(hidden, hidden), :]
        if act == "silu":
            a = gate * (1.0 / (1.0 + jnp.exp(-gate)))
        else:
            a = 0.5 * gate * (1.0 + jnp.tanh(
                0.7978845608028654 * (gate + 0.044715 * gate * gate * gate)))
        g_full = (a * up).astype(jnp.bfloat16)          # (H, t_pad)
        if qtype == QuantType.Q8_0:
            # ACT_exp[k, tt*G2+g] = g[k, tt] * e2[k, g]
            cols = [g_full[:, tt:tt + 1] * e2_ref[:] for tt in range(t)]
            aexp_refs[0][:, :] = (cols[0] if t == 1
                                  else jnp.concatenate(cols, axis=1))
        else:
            half = hidden // 2
            g_lo = g_full[:half, :]
            g_hi = g_full[half:, :]
            cols_l = [g_lo[:, tt:tt + 1] * e2_ref[:] for tt in range(t)]
            cols_h = [g_hi[:, tt:tt + 1] * e2_ref[:] for tt in range(t)]
            aexp_refs[0][:, :] = (cols_l[0] if t == 1
                                  else jnp.concatenate(cols_l, axis=1))
            aexp_refs[1][:, :] = (cols_h[0] if t == 1
                                  else jnp.concatenate(cols_h, axis=1))
            # per-(group, t) sums of the lo-half activations: the -8 nibble
            # offset correction enters as -8 * s2 @ suml after the fold
            suml_ref[:, :] = jax.lax.dot_general(
                e2_ref[:], g_lo.astype(jnp.float32),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (G2, t_pad)

    # ---- stage B: one (d_tile, H) xe tile of the down matmul --------------
    @pl.when(i >= n_h)
    def _():
        p2 = xe_dot(w2_ref[0], [r for r in aexp_refs], None)
        s = s2_ref[0]                                   # (d_tile, G2)
        s_rep = s if t == 1 else jnp.concatenate([s] * t, axis=1)
        y = jax.lax.dot_general(
            p2 * s_rep, m2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if qtype == QuantType.Q4_0:
            y = y - 8.0 * jax.lax.dot_general(
                s, suml_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = y


def ffn_fused_xe_stacked(xn: jax.Array, w13: QTensor, w2: QTensor,
                         layer_idx, *, act: str,
                         interpret: Optional[bool] = None) -> jax.Array:
    """Layer-stacked fused FFN with xe scales, decode-shaped (T ≤ 8).

    w13 (L, 2H, D…) rows pre-permuted with ffn_split_perm for Q4 (loader);
    w2 (L, D, H…).  Returns (T, D) f32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from lmrs_tpu.kernels.dequant_matmul import (_build_xe, _fold_matrix,
                                                 _pick_o_tile)

    qtype = w13.qtype
    assert w2.qtype == qtype
    lead = xn.shape[:-1]
    d = xn.shape[-1]
    h2 = w13.out_features
    hidden = h2 // 2
    d_out = w2.out_features
    gs = w13.group_size
    g1 = d // gs
    g2 = hidden // gs

    x2 = xn.reshape(-1, d).astype(jnp.bfloat16)
    t = x2.shape[0]
    assert t <= 8, "decode-shaped kernel"
    t_pad = 8

    h_tile = _pick_o_tile(h2, 512)
    n_h = h2 // h_tile
    d_tile = _pick_o_tile(d_out, 512)
    n_d = d_out // d_tile
    l_arr = jnp.asarray([layer_idx], jnp.int32)
    m1 = jnp.asarray(_fold_matrix(t, g1, t_pad))
    m2 = jnp.asarray(_fold_matrix(t, g2, t_pad))

    def a_idx(i, l):
        return jnp.minimum(i, n_h - 1)

    def b_idx(i, l):
        return jnp.maximum(i - n_h, 0)

    grid = (n_h + n_d,)
    common_tail = [
        pl.BlockSpec((1, h_tile, g1), lambda i, l: (l[0], a_idx(i, l), 0),
                     memory_space=pltpu.VMEM),                    # s13
        pl.BlockSpec((t * g1, t_pad), lambda i, l: (0, 0),
                     memory_space=pltpu.VMEM),                    # m1
    ]
    out_spec = pl.BlockSpec((d_tile, t_pad), lambda i, l: (b_idx(i, l), 0),
                            memory_space=pltpu.VMEM)

    if qtype == QuantType.Q8_0:
        xe1 = _build_xe(x2, 1, d, gs)[0]
        e2 = jnp.asarray(_group_mask(hidden, gs), jnp.bfloat16)
        in_specs = [
            pl.BlockSpec((d, t * g1), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),                # xe1
            pl.BlockSpec((1, h_tile, d), lambda i, l: (l[0], a_idx(i, l), 0),
                         memory_space=pltpu.VMEM),                # w13
        ] + common_tail + [
            pl.BlockSpec((1, d_tile, hidden),
                         lambda i, l: (l[0], b_idx(i, l), 0),
                         memory_space=pltpu.VMEM),                # w2
            pl.BlockSpec((1, d_tile, g2), lambda i, l: (l[0], b_idx(i, l), 0),
                         memory_space=pltpu.VMEM),                # s2
            pl.BlockSpec((hidden, g2), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),                # e2 mask
            pl.BlockSpec((t * g2, t_pad), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),                # m2
        ]
        args = [xe1, w13.q, w13.s, m1, w2.q, w2.s, e2, m2]
        n_xe = 1
        aexp = [pltpu.VMEM((hidden, t * g2), jnp.bfloat16)]
    else:
        half1 = gs // 2
        xg = x2.reshape(t, g1, gs)
        x_l = xg[:, :, :half1]
        x_h = xg[:, :, half1:]
        corr1 = (-8.0 * jnp.sum(x_l.astype(jnp.float32), axis=2)
                 ).reshape(1, t * g1)
        xel = _build_xe(x_l.reshape(t, d // 2), 1, d // 2, half1)[0]
        xeh = _build_xe(x_h.reshape(t, d // 2), 1, d // 2, half1)[0]
        # e2: (H/2, G2) mask over the byte-half rows of the g scratch
        e2 = jnp.asarray(_group_mask(hidden // 2, gs // 2), jnp.bfloat16)
        in_specs = [
            pl.BlockSpec((d // 2, t * g1), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),                # xel
            pl.BlockSpec((d // 2, t * g1), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),                # xeh
            pl.BlockSpec((1, t * g1), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),                # corr1
            pl.BlockSpec((1, h_tile, d // 2),
                         lambda i, l: (l[0], a_idx(i, l), 0),
                         memory_space=pltpu.VMEM),                # w13
        ] + common_tail + [
            pl.BlockSpec((1, d_tile, hidden // 2),
                         lambda i, l: (l[0], b_idx(i, l), 0),
                         memory_space=pltpu.VMEM),                # w2
            pl.BlockSpec((1, d_tile, g2), lambda i, l: (l[0], b_idx(i, l), 0),
                         memory_space=pltpu.VMEM),                # s2
            pl.BlockSpec((hidden // 2, g2), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),                # e2 mask
            pl.BlockSpec((t * g2, t_pad), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),                # m2
        ]
        args = [xel, xeh, corr1, w13.q, w13.s, m1, w2.q, w2.s, e2, m2]
        n_xe = 3
        aexp = [pltpu.VMEM((hidden // 2, t * g2), jnp.bfloat16),
                pltpu.VMEM((hidden // 2, t * g2), jnp.bfloat16)]

    def wrapped(l_ref, *rest):
        xe_refs = rest[:n_xe]
        w13_ref = rest[n_xe]
        s13_ref = rest[n_xe + 1]
        m1_ref = rest[n_xe + 2]
        w2_ref = rest[n_xe + 3]
        s2_ref = rest[n_xe + 4]
        e2_ref = rest[n_xe + 5]
        m2_ref = rest[n_xe + 6]
        o_ref = rest[n_xe + 7]
        y13_ref = rest[n_xe + 8]
        if qtype == QuantType.Q8_0:
            aexp_refs = [rest[n_xe + 9]]
            suml_ref = rest[n_xe + 10]
        else:
            aexp_refs = [rest[n_xe + 9], rest[n_xe + 10]]
            suml_ref = rest[n_xe + 11]
        return _ffn_xe_kernel(
            l_ref, xe_refs, w13_ref, s13_ref, m1_ref, w2_ref, s2_ref,
            e2_ref, m2_ref, o_ref, y13_ref, aexp_refs, suml_ref,
            qtype=qtype, n_h=n_h, h_tile=h_tile, hidden=hidden, act=act,
            t=t, g2=g2, t_pad=t_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((h2, t_pad), jnp.float32)] + aexp
        + [pltpu.VMEM((g2, t_pad), jnp.float32)],
    )
    out = pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d_out, t_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(l_arr, *args)

    y = out.T[:t]
    return y.reshape(*lead, d_out)
