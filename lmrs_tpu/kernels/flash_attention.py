"""Blockwise (flash-style) decode attention over the bf16 KV cache.

The reference walks the whole cache with a per-head O(pos) scalar loop
(reference: src/transformer.rs:507-542).  The XLA formulation in
ops/attention.py is one einsum over a static cache-prefix bucket — fine at
short context, but at 32k it streams the ENTIRE bucket through the MXU and
materializes (T, KH, G, S) f32 scores, so decode throughput decays with
position (measured 59% retention at 32k, VERDICT r2).

This kernel streams K/V in VMEM-sized sequence blocks with an in-kernel
online-softmax accumulation (the same merge math as attention_cp's
cross-shard reduction, run across blocks instead of shards), and — the
TPU-native win — uses scalar-prefetched block indexing to SKIP blocks that
a sliding-window layer can never attend to: Gemma-2 applies a 4096-token
window in every layer (reference: src/transformer.rs:524-525), so windowed
decode at position 32k touches ~5k rows instead of 32k.

Layout contract:
* the stacked cache arrives as (L, S, KH*hd) — a free trailing-dims reshape
  of the engine's (L, S, KH, hd) buffers — so sequence blocks are contiguous
  (s_blk, KH*hd) HBM stripes and per-head windows are 128-aligned lane
  slices (requires cache_head_dim % 128 == 0; llama-1b's hd=64 keeps the
  XLA path).
* q arrives as (KH, G*T, hd): row g*T + t holds query head g*? of token t —
  scores for one kv head are ONE (G*T, s_blk) MXU dot.
* grid is (n_blk,) sequence blocks; the layer index and the first block
  (window start) are scalar-prefetched, so one call site serves every layer
  of the lax.scan decode program (axon remote-compile cost scales with call
  sites, DESIGN.md §3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WINDOW_NEG = -2.3819763e38   # reference: src/transformer.rs:525
_MASK_NEG = float(jnp.finfo(jnp.float32).min)


def _plan_blocks(attn_len: int, t_q: int, window: Optional[int],
                 s_blk_target: int = 512):
    """Static block plan: (s_blk, n_total, n_blk).  n_blk < n_total iff a
    sliding window lets the kernel skip early blocks entirely."""
    s_blk = min(s_blk_target, attn_len)
    assert attn_len % s_blk == 0, (attn_len, s_blk)
    n_total = attn_len // s_blk
    if window is not None:
        n_needed = -(-(window + t_q) // s_blk) + 1
        n_blk = min(n_total, n_needed)
    else:
        n_blk = n_total
    return s_blk, n_total, n_blk


def _block_masks(row0, pos, gt: int, s_blk: int, t_q: int,
                 window: Optional[int]):
    """(valid, win_add) for one sequence block: causal mask (global cache
    row of each score column vs the query row's absolute position) and
    the sliding-window additive mask (reference constant -2.38e38,
    src/transformer.rs:524-525)."""
    t_idx = row0 + jax.lax.broadcasted_iota(jnp.int32, (gt, s_blk), 1)
    q_pos = pos + jax.lax.broadcasted_iota(jnp.int32, (gt, s_blk), 0) % t_q
    valid = t_idx <= q_pos
    win_add = jnp.zeros((gt, s_blk), jnp.float32)
    if window is not None:
        win_add = jnp.where(q_pos - t_idx <= window, 0.0, _WINDOW_NEG)
    return valid, win_add


def _head_block_update(h: int, q_h, k2d, v2d, ks_row, vs_row,
                       m_scr, l_scr, acc_scr, *, valid, win_add,
                       scale: float, softcap: Optional[float],
                       quantized: bool, packed4: bool, hd: int,
                       pair: bool = False):
    """One (kv head, sequence block) step of the online-softmax merge —
    THE flash attention math, shared by the stacked and batched kernels
    (they differ only in grid/scalar layout and ref slicing).

    k2d/v2d are the block's 2D (s_blk, KH*hd_b) views; ks_row/vs_row the
    head's (s_blk,) f32 scale rows (int8 cache) or None.  With
    `quantized`, key scales multiply the SCORE COLUMNS and value scales
    fold into the softmax weights before the p@V dot — dequantization
    never materializes a float K/V block.  `packed4` unpacks biased int4
    nibble bytes (v = 16*q_hi + q_lo + 8 as int8, DESIGN §2 — the same
    floor/fma trick the weight kernels run); with `pair` the nibbles pair
    ACROSS adjacent heads (head 2p low, head 2p+1 high — the hd-128
    layout of models.transformer.q4_cache_pair_mode), so the load slices
    the PAIR's full-hd lane block and keeps one nibble lane set."""
    hd_b = hd // 2 if packed4 else hd   # per-head lane width in the block

    def load(ref2d):
        if packed4 and pair:
            p = h // 2
            v = ref2d[:, p * hd:(p + 1) * hd].astype(jnp.float32)
            qhi = jnp.floor(v / 16.0)
            qlo = v - 16.0 * qhi - 8.0
            return (qlo if h % 2 == 0 else qhi).astype(jnp.bfloat16)
        blk = ref2d[:, h * hd_b:(h + 1) * hd_b]
        if packed4:
            v = blk.astype(jnp.float32)
            qhi = jnp.floor(v / 16.0)
            qlo = v - 16.0 * qhi - 8.0
            return jnp.concatenate([qlo, qhi], axis=-1).astype(jnp.bfloat16)
        if quantized:
            blk = blk.astype(jnp.float32)  # int8->f32: known-good lowering
        return blk.astype(jnp.bfloat16)

    k_h = load(k2d)
    s = jax.lax.dot_general(
        q_h, k_h, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (GT, s_blk)
    if quantized:
        s = s * ks_row[None, :]
    if softcap is not None:
        s = jnp.tanh(s / softcap) * softcap
    s = s + win_add
    s = jnp.where(valid, s, _MASK_NEG)

    m_old = m_scr[h]                                     # (GT,)
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(s - m_new[:, None])                      # (GT, s_blk)
    l_scr[h] = l_scr[h] * alpha + jnp.sum(p, axis=1)
    v_h = load(v2d)
    pw = p * vs_row[None, :] if quantized else p
    pv = jax.lax.dot_general(
        pw.astype(jnp.bfloat16), v_h,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (GT, hd)
    acc_scr[h] = acc_scr[h] * alpha[:, None] + pv
    m_scr[h] = m_new


def _flash_kernel(sp_ref, q_ref, k_ref, v_ref, *rest,
                  n_blk: int, s_blk: int, kh: int, gt: int, t_q: int,
                  hd: int, scale: float, softcap: Optional[float],
                  window: Optional[int], quantized: bool = False,
                  packed4: bool = False, pair: bool = False):
    """One sequence block of online-softmax GQA attention, all kv heads.

    sp_ref (SMEM int32): [layer, start_blk, pos, last_live].  Scratch
    carries the per-head running (m, l, acc) across the sequential grid
    steps.

    Grid steps past `last_live` (the last block any query row can attend
    to — the bucket is up to 2x the true context) are DEAD: their
    BlockSpec index is clamped to last_live, so Mosaic's revisiting
    optimization elides the DMA (same block as the previous step), and
    this guard skips the compute.  The final-step output write runs
    unconditionally off the accumulated scratch.
    """
    if quantized:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest

    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _MASK_NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(sp_ref[1] + j <= sp_ref[3])
    def _live():
        pos = sp_ref[2]
        row0 = (sp_ref[1] + j) * s_blk
        valid, win_add = _block_masks(row0, pos, gt, s_blk, t_q, window)
        for h in range(kh):
            _head_block_update(
                h, q_ref[h], k_ref[0], v_ref[0],
                ks_ref[0][h] if quantized else None,
                vs_ref[0][h] if quantized else None,
                m_scr, l_scr, acc_scr, valid=valid, win_add=win_add,
                scale=scale, softcap=softcap, quantized=quantized,
                packed4=packed4, hd=hd, pair=pair)

    @pl.when(j == n_blk - 1)
    def _():
        for h in range(kh):
            o_ref[h] = acc_scr[h] / l_scr[h][:, None]


def flash_decode_stacked(
    q: jax.Array,            # (T, H, hd) f32, RoPE applied
    k_cache: jax.Array,      # (L, S, KH*hd) — the FULL stacked 3D cache
    v_cache: jax.Array,
    layer_idx,               # traced int32
    pos,                     # traced int32: absolute position of q[0]
    *,
    n_kv: int,               # KV head count (the cache's head axis is merged)
    attn_len: int,           # static bucket (cache prefix length)
    scale: float,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
    s_blk: int = 512,
    interpret: Optional[bool] = None,
    k_scale: Optional[jax.Array] = None,   # (L, KH, S) f32 — int8 cache
    v_scale: Optional[jax.Array] = None,
    packed4: bool = False,                 # int4 cache: nibble-packed bytes
) -> jax.Array:
    """Blockwise GQA attention over the stacked cache; returns (T, H, hd)
    f32.  Serves decode steps (T <= 8) AND prefill chunks (T up to a few
    hundred — scores stay one (G*T, s_blk) VMEM tile per kv head).
    With k_scale/v_scale the cache is int8 (see models.transformer.KVCache):
    scale blocks stream alongside and fold into scores / softmax weights.

    Equivalent to ops.attention.attention(q, k[l,:attn_len], v[l,:attn_len],
    pos, precision="fast") but streamed block-at-a-time with online softmax
    and TWO forms of block skipping:
    * window skip — a sliding-window layer starts at the first block the
      window can reach (scalar-prefetched), so Gemma's 4096 window costs
      O(window) at any position;
    * live clamp — blocks past the last row any query attends to
      (pos + T - 1; the pow-2 bucket is up to 2x that) collapse onto the
      last live block, whose repeat DMA Mosaic elides and whose compute
      the kernel skips.  Prefill chunks therefore read O(pos+T), not
      O(bucket), per layer.

    The cache arrives with the (KH, hd) axes MERGED — the engine's native
    3D storage layout, so sequence blocks are contiguous (s_blk, KH*hd)
    HBM stripes with a packed (seq, lanes) XLA tiling and per-head windows
    are 128-aligned lane slices in VMEM.  (A 4D (L,S,KH,hd) cache would
    put (KH, hd) in the tiled minor dims; reshaping it per call inside the
    decode scan re-materializes the multi-GB buffer — measured 3 tok/s.)
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_q, n_heads, hd = q.shape
    L, S, _ = k_cache.shape
    kh = n_kv
    g = n_heads // kh
    gt = g * t_q
    hd_b = hd // 2 if packed4 else hd     # per-head block lane width
    pair = packed4 and hd_b % 128 != 0     # head-pair int4 packing (hd 128)
    if pair:
        assert hd % 128 == 0 and kh % 2 == 0, (hd, kh)
    else:
        assert hd_b % 128 == 0, "flash path requires lane-aligned head blocks"
    assert k_cache.shape[-1] == kh * hd_b
    assert attn_len <= S

    s_blk, n_total, n_blk = _plan_blocks(attn_len, t_q, window, s_blk)

    # (T, H, hd) -> (KH, G*T, hd): row g*T + t of head block k is query
    # head k*G + g at token t  (q_pos row formula in the kernel: pos + r%T)
    qk = q.reshape(t_q, kh, g, hd).transpose(1, 2, 0, 3).reshape(kh, gt, hd)
    qk = qk.astype(jnp.bfloat16)

    if window is not None and n_blk < n_total:
        first_row = jnp.maximum(pos - window, 0)
        start = jnp.minimum(first_row // s_blk, n_total - n_blk)
    else:
        start = jnp.int32(0)
    last_live = jnp.minimum(
        (pos + t_q - 1) // s_blk, n_total - 1).astype(jnp.int32)
    sp = jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                    start.astype(jnp.int32),
                    jnp.asarray(pos, jnp.int32),
                    last_live])

    k3 = k_cache
    v3 = v_cache

    def _kv_idx(j, sp):
        return (sp[0], jnp.minimum(sp[1] + j, sp[3]), 0)

    def _ks_idx(j, sp):
        return (sp[0], 0, jnp.minimum(sp[1] + j, sp[3]))

    quantized = k_scale is not None
    in_specs = [
        pl.BlockSpec((kh, gt, hd), lambda j, sp: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_blk, kh * hd_b), _kv_idx,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_blk, kh * hd_b), _kv_idx,
                     memory_space=pltpu.VMEM),
    ]
    operands = [sp, qk, k3, v3]
    if quantized:
        in_specs += [pl.BlockSpec((1, kh, s_blk), _ks_idx,
                                  memory_space=pltpu.VMEM)] * 2
        operands += [k_scale, v_scale]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((kh, gt, hd), lambda j, sp: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((kh, gt), jnp.float32),
            pltpu.VMEM((kh, gt), jnp.float32),
            pltpu.VMEM((kh, gt, hd), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_flash_kernel, n_blk=n_blk, s_blk=s_blk, kh=kh,
                          gt=gt, t_q=t_q, hd=hd, scale=scale,
                          softcap=softcap, window=window,
                          quantized=quantized, packed4=packed4, pair=pair),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kh, gt, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    # (KH, G*T, hd) -> (T, H, hd)
    return out.reshape(kh, g, t_q, hd).transpose(2, 0, 1, 3) \
              .reshape(t_q, n_heads, hd)


def _flash_kernel_batched(sp_ref, q_ref, k_ref, v_ref, *rest,
                          n_blk: int, s_blk: int, kh: int, gt: int,
                          t_q: int, hd: int, scale: float,
                          softcap: Optional[float],
                          window: Optional[int], quantized: bool = False,
                          packed4: bool = False, pair: bool = False,
                          lse: bool = False):
    """Batched variant: grid (B, n_blk), per-slot pos/start/last_live
    scalar-prefetched (sp layout: [layer, seq_base, start_0..start_{B-1},
    pos_0..pos_{B-1}, last_0..last_{B-1}]).  Dead blocks past a slot's
    last live block are DMA-elided (clamped index) and compute-skipped —
    a freshly admitted short conversation doesn't pay the deepest slot's
    bucket.  `quantized` as in _flash_kernel.

    `seq_base` (sp[1]) is the GLOBAL row index of this cache block's row 0
    — nonzero when the sequence axis is sharded over a cp mesh axis and
    the kernel runs on one shard's rows (masks compare global positions).
    With `lse` the kernel emits the RAW online-softmax pieces (acc, m, l)
    instead of acc/l, so the caller can merge partial attention across
    sequence shards with pmax/psum (the same reduction
    ops.attention.attention_cp runs for the einsum path)."""
    if quantized:
        ks_ref, vs_ref, *rest = rest
    if lse:
        o_ref, m_ref, l_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_b = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _MASK_NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(sp_ref[2 + b] + j <= sp_ref[2 + 2 * n_b + b])
    def _live():
        pos = sp_ref[2 + n_b + b]
        row0 = sp_ref[1] + (sp_ref[2 + b] + j) * s_blk
        valid, win_add = _block_masks(row0, pos, gt, s_blk, t_q, window)
        for h in range(kh):
            _head_block_update(
                h, q_ref[0, h], k_ref[0, 0], v_ref[0, 0],
                ks_ref[0, 0][h] if quantized else None,
                vs_ref[0, 0][h] if quantized else None,
                m_scr, l_scr, acc_scr, valid=valid, win_add=win_add,
                scale=scale, softcap=softcap, quantized=quantized,
                packed4=packed4, hd=hd, pair=pair)

    @pl.when(j == n_blk - 1)
    def _():
        for h in range(kh):
            if lse:
                o_ref[0, h] = acc_scr[h]
                m_ref[0, h] = m_scr[h]
                l_ref[0, h] = l_scr[h]
            else:
                o_ref[0, h] = acc_scr[h] / l_scr[h][:, None]


def flash_decode_batched(
    q: jax.Array,            # (B, H, hd) or (B, T, H, hd) f32
    k_cache: jax.Array,      # (B, L, S, KH*hd) — 3D-per-slot storage
    v_cache: jax.Array,
    layer_idx,               # traced int32
    pos,                     # (B,) int32 per-slot positions (of q[:, 0])
    *,
    n_kv: int,
    attn_len: int,
    scale: float,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
    s_blk: int = 512,
    interpret: Optional[bool] = None,
    k_scale: Optional[jax.Array] = None,   # (B, L, KH, S) f32 — int8 cache
    v_scale: Optional[jax.Array] = None,
    seq_base=None,           # traced int32: GLOBAL row index of cache row 0
    return_lse: bool = False,
) -> jax.Array:
    """Per-slot blockwise decode attention for the continuous-batching step;
    returns (B, H, hd) (or (B, T, H, hd)) f32.  Program size is O(1) in B —
    the batch is a grid dimension, not an unrolled loop.  A 4D q carries
    t_q tokens per slot (the batched speculative verify window at long
    context): row g*T + t of a head block is query head ? of token t, with
    per-slot causal masking at q_pos = pos + t.

    Context-parallel callers (the batched scheduler over a cp mesh) pass
    `seq_base` = axis_index(cp) * S_local — the cache operand is ONE
    sequence shard, masks run on global positions — and `return_lse=True`
    to get the raw online-softmax pieces (acc (B,[T,]H,hd), m (B,[T,]H),
    l (B,[T,]H)); the shards then merge with
    m_g=pmax(m); w=exp(m-m_g); out=psum(acc*w)/psum(l*w).  A shard with
    no live rows contributes m=_MASK_NEG so its w underflows to exactly 0."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if q.ndim == 3:
        t_q = 1
        B, n_heads, hd = q.shape
        qk = q.reshape(B, n_kv, n_heads // n_kv, hd).astype(jnp.bfloat16)
    else:
        B, t_q, n_heads, hd = q.shape
        # (B, T, H, hd) -> (B, KH, G*T, hd), row g*T + t (see stacked)
        qk = q.reshape(B, t_q, n_kv, n_heads // n_kv, hd) \
             .transpose(0, 2, 3, 1, 4) \
             .reshape(B, n_kv, (n_heads // n_kv) * t_q, hd) \
             .astype(jnp.bfloat16)
    _, L, S, _ = k_cache.shape
    kh = n_kv
    g = n_heads // kh
    gt = g * t_q
    assert hd % 128 == 0
    assert k_cache.shape[-1] == kh * hd
    s_blk, n_total, n_blk = _plan_blocks(attn_len, t_q, window, s_blk)

    base = jnp.asarray(0 if seq_base is None else seq_base, jnp.int32)
    # start/last_live are LOCAL block indices (this shard's cache rows);
    # a shard whose rows all lie past pos clamps to block 0, which the
    # kernel computes fully masked (w=0 in the cp merge)
    pos_l = jnp.asarray(pos, jnp.int32) - base
    if window is not None and n_blk < n_total:
        first_row = jnp.maximum(jnp.asarray(pos, jnp.int32) - window, 0)
        start = jnp.clip((first_row - base) // s_blk, 0, n_total - n_blk)
    else:
        start = jnp.zeros((B,), jnp.int32)
    last_live = jnp.clip((pos_l + t_q - 1) // s_blk,
                         0, n_total - 1).astype(jnp.int32)
    sp = jnp.concatenate([
        jnp.asarray(layer_idx, jnp.int32)[None],
        base[None],
        start.astype(jnp.int32),
        jnp.asarray(pos, jnp.int32),
        last_live])

    k4 = k_cache
    v4 = v_cache

    def _kv_idx(b, j, sp):
        return (b, sp[0], jnp.minimum(sp[2 + b] + j, sp[2 + 2 * B + b]), 0)

    def _ks_idx(b, j, sp):
        return (b, sp[0], 0, jnp.minimum(sp[2 + b] + j, sp[2 + 2 * B + b]))

    quantized = k_scale is not None
    in_specs = [
        pl.BlockSpec((1, kh, gt, hd), lambda b, j, sp: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, s_blk, kh * hd), _kv_idx,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, s_blk, kh * hd), _kv_idx,
                     memory_space=pltpu.VMEM),
    ]
    operands = [sp, qk, k4, v4]
    if quantized:
        in_specs += [pl.BlockSpec((1, 1, kh, s_blk), _ks_idx,
                                  memory_space=pltpu.VMEM)] * 2
        operands += [k_scale, v_scale]

    o_spec = pl.BlockSpec((1, kh, gt, hd), lambda b, j, sp: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out_specs = o_spec
    out_shape = jax.ShapeDtypeStruct((B, kh, gt, hd), jnp.float32)
    if return_lse:
        ml_spec = pl.BlockSpec((1, kh, gt), lambda b, j, sp: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        out_specs = [o_spec, ml_spec, ml_spec]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B, kh, gt), jnp.float32),
                     jax.ShapeDtypeStruct((B, kh, gt), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_blk),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((kh, gt), jnp.float32),
            pltpu.VMEM((kh, gt), jnp.float32),
            pltpu.VMEM((kh, gt, hd), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_flash_kernel_batched, n_blk=n_blk, s_blk=s_blk,
                          kh=kh, gt=gt, t_q=t_q, hd=hd, scale=scale,
                          softcap=softcap, window=window,
                          quantized=quantized, lse=return_lse),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    if return_lse:
        acc, m, l = out
        if t_q == 1:
            return (acc.reshape(B, n_heads, hd),
                    m.reshape(B, n_heads), l.reshape(B, n_heads))
        # (B, KH, G*T[, hd]) -> (B, T, H[, hd]) — row g*T + t layout
        return (acc.reshape(B, kh, g, t_q, hd).transpose(0, 3, 1, 2, 4)
                .reshape(B, t_q, n_heads, hd),
                m.reshape(B, kh, g, t_q).transpose(0, 3, 1, 2)
                .reshape(B, t_q, n_heads),
                l.reshape(B, kh, g, t_q).transpose(0, 3, 1, 2)
                .reshape(B, t_q, n_heads))
    if t_q == 1:
        return out.reshape(B, n_heads, hd)
    # (B, KH, G*T, hd) -> (B, T, H, hd)
    return out.reshape(B, kh, g, t_q, hd).transpose(0, 3, 1, 2, 4) \
              .reshape(B, t_q, n_heads, hd)


def flash_decode_paged(
    q: jax.Array,            # (B, H, hd) or (B, T, H, hd) f32
    k_pool: jax.Array,       # (L, P, psz, KH*hd) — the shared page pool
    v_pool: jax.Array,
    table: jax.Array,        # (B, maxp) int32 page table (page 0 = trash)
    layer_idx,               # traced int32
    pos,                     # (B,) int32 per-slot positions (of q[:, 0])
    *,
    n_kv: int,
    scale: float,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
    interpret: Optional[bool] = None,
    k_scale: Optional[jax.Array] = None,   # (L, P, KH, psz) f32 — int8 pool
    v_scale: Optional[jax.Array] = None,
    packed4: bool = False,                 # int4 pool: nibble-packed bytes
) -> jax.Array:
    """Paged attention: flash_decode_batched over a SHARED page pool.

    The vLLM idea mapped onto the TPU the way this framework maps
    everything — through scalar prefetch: each slot's K/V live in
    psz-row pages scattered across one (L, P, psz, KH*hd) pool, and the
    per-slot page table rides in the scalar-prefetch operand, so the
    BlockSpec index map translates (slot, virtual block) -> physical page
    at DMA-issue time.  The kernel BODY is _flash_kernel_batched
    UNCHANGED — a page IS a sequence block (psz == s_blk), the causal /
    window masks run on VIRTUAL row indices, and the live-block clamp
    skips pages past each slot's pos exactly as before.  Pool memory is
    sum-of-contexts, not B x max-context (the preallocated batched cache's
    cost, serve/scheduler.py) — the capacity win for ragged fleets.

    The reference has no batched serving at all (one model instance per
    connection, src/bin/backend.rs:88-110).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if q.ndim == 3:
        t_q = 1
        B, n_heads, hd = q.shape
        qk = q.reshape(B, n_kv, n_heads // n_kv, hd).astype(jnp.bfloat16)
    else:
        B, t_q, n_heads, hd = q.shape
        qk = q.reshape(B, t_q, n_kv, n_heads // n_kv, hd) \
             .transpose(0, 2, 3, 1, 4) \
             .reshape(B, n_kv, (n_heads // n_kv) * t_q, hd) \
             .astype(jnp.bfloat16)
    L, P, psz, _ = k_pool.shape
    maxp = table.shape[1]
    kh = n_kv
    g = n_heads // kh
    gt = g * t_q
    hd_b = hd // 2 if packed4 else hd   # per-head pool lane width
    pair = packed4 and hd_b % 128 != 0   # head-pair int4 packing (hd 128)
    if pair:
        assert hd % 128 == 0 and kh % 2 == 0, (hd, kh)
    else:
        assert hd_b % 128 == 0
    assert k_pool.shape[-1] == kh * hd_b
    assert t_q <= psz, (t_q, psz)   # a query window straddles <= 2 pages

    # virtual sequence = the page-table span; pages are the blocks
    s_blk, n_total, n_blk = _plan_blocks(maxp * psz, t_q, window, psz)
    assert s_blk == psz and n_total == maxp

    if window is not None and n_blk < n_total:
        first_row = jnp.maximum(pos - window, 0)
        start = jnp.minimum(first_row // psz, n_total - n_blk)
    else:
        start = jnp.zeros((B,), jnp.int32)
    last_live = jnp.minimum((pos + t_q - 1) // psz,
                            n_total - 1).astype(jnp.int32)
    sp = jnp.concatenate([
        jnp.asarray(layer_idx, jnp.int32)[None],
        jnp.zeros((1,), jnp.int32),        # seq_base (pages are never cp)
        start.astype(jnp.int32),
        jnp.asarray(pos, jnp.int32),
        last_live,
        table.reshape(-1).astype(jnp.int32),
    ])

    def _page(b, j, sp):
        vb = jnp.minimum(sp[2 + b] + j, sp[2 + 2 * B + b])
        return sp[2 + 3 * B + b * maxp + vb]

    def _kv_idx(b, j, sp):
        # pool and scale-pool blocks share the (layer, page, 0, 0) index
        return (sp[0], _page(b, j, sp), 0, 0)

    quantized = k_scale is not None
    in_specs = [
        pl.BlockSpec((1, kh, gt, hd), lambda b, j, sp: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, psz, kh * hd_b), _kv_idx,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, psz, kh * hd_b), _kv_idx,
                     memory_space=pltpu.VMEM),
    ]
    operands = [sp, qk, k_pool, v_pool]
    if quantized:
        in_specs += [pl.BlockSpec((1, 1, kh, psz), _kv_idx,
                                  memory_space=pltpu.VMEM)] * 2
        operands += [k_scale, v_scale]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_blk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, kh, gt, hd),
                               lambda b, j, sp: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((kh, gt), jnp.float32),
            pltpu.VMEM((kh, gt), jnp.float32),
            pltpu.VMEM((kh, gt, hd), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_flash_kernel_batched, n_blk=n_blk, s_blk=psz,
                          kh=kh, gt=gt, t_q=t_q, hd=hd, scale=scale,
                          softcap=softcap, window=window,
                          quantized=quantized, packed4=packed4, pair=pair),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, kh, gt, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    if t_q == 1:
        return out.reshape(B, n_heads, hd)
    return out.reshape(B, kh, g, t_q, hd).transpose(0, 3, 1, 2, 4) \
              .reshape(B, t_q, n_heads, hd)
