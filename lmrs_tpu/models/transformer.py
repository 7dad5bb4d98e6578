"""Decoder-only transformer forward pass (Gemma-2 / Llama-3.2 / Phi-3.5).

TPU-first re-design of the reference's per-token, per-layer CPU loop
(reference: src/transformer.rs:316-684):

* One jit-compiled pure function handles both decode (T=1) and batched
  prefill (T=chunk) — the reference prefills multimodal embeddings through
  the same `forward_layer(sl>1)` path (src/transformer.rs:672-684); here
  *every* prompt is prefilled in chunks.
* Layers run under `lax.scan` over stacked per-layer weights, so the program
  compiles one layer body regardless of depth.
* The KV cache is a preallocated on-device array pair indexed by `pos` with
  `dynamic_update_slice`; buffers are donated by the engine so updates are
  in-place in HBM.  Attention reads a static prefix of the cache (the
  engine's "bucket"), keeping shapes static under jit while bounding HBM
  traffic for short contexts.

Family deltas (reference: §3.2 of SURVEY.md) are driven by ModelConfig:
Gemma-2 unit-offset rmsnorms + extra pre/post-FFN norms + softcaps + sliding
window + sqrt(dim) embedding scale + GeGLU; Llama-3 RoPE rescale + SwiGLU;
Phi-3 longrope + separate lm_head.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lmrs_tpu.config import ModelConfig, ModelType
from lmrs_tpu.ops.activations import gelu_tanh, silu
from lmrs_tpu.ops.attention import attention, attention_batched
from lmrs_tpu.ops.matmul import qmatmul
from lmrs_tpu.ops.norms import rmsnorm
from lmrs_tpu.ops.rope import apply_rope
from lmrs_tpu.quant import QTensor, QuantType, dequantize


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("att_norm", "wq", "wk", "wv", "wo", "post_att_norm",
                 "pre_ffn_norm", "w1", "w2", "w3", "post_ffn_norm",
                 "wqkv", "w13"),
    meta_fields=(),
)
@dataclasses.dataclass
class LayerWeights:
    """Weights of one (or, stacked, all) decoder layer(s).

    Tensor order matches the .lmrs layout (reference: export.py:87-125).
    pre_ffn_norm / post_ffn_norm are Gemma-only (None otherwise).

    wqkv / w13 are optional output-axis concatenations ([q;k;v] and
    [gate;up]) built by the param loader: one fused matmul per pair halves
    the kernel-launch count on the decode path, with identical arithmetic
    (group quantization is per-row, so row concatenation is exact).  When
    present they are used INSTEAD of wq/wk/wv/w1/w3 (which are then None).
    """

    att_norm: jax.Array                 # (D,)
    wq: Optional[QTensor]               # (att_dim, D)
    wk: Optional[QTensor]               # (kv_dim, D)
    wv: Optional[QTensor]               # (kv_dim, D)
    wo: QTensor                         # (D, att_dim)
    post_att_norm: jax.Array            # (D,)
    pre_ffn_norm: Optional[jax.Array]   # (D,) Gemma only
    w1: Optional[QTensor]               # (H, D) gate
    w2: QTensor                         # (D, H) down
    w3: Optional[QTensor]               # (H, D) up
    post_ffn_norm: Optional[jax.Array]  # (D,) Gemma only
    wqkv: Optional[QTensor] = None      # (att_dim + 2*kv_dim, D)
    w13: Optional[QTensor] = None       # (2*H, D)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("embed", "layers", "final_norm", "lm_head",
                 "rope_cos", "rope_sin"),
    meta_fields=(),
)
@dataclasses.dataclass
class TransformerParams:
    embed: QTensor                      # (V, D); also the tied classifier
    layers: LayerWeights                # stacked with leading (L,) axis
    final_norm: jax.Array               # (D,)
    lm_head: Optional[QTensor]          # (V, D) Phi only
    rope_cos: jax.Array                 # (S, head_dim//2) f32
    rope_sin: jax.Array                 # (S, head_dim//2) f32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("k", "v", "k_scale", "v_scale"),
    meta_fields=(),
)
@dataclasses.dataclass
class KVCache:
    """KV cache arrays stored 3D: (L, S, KH*head_dim) (batched:
    (B, L, S, KH*head_dim)).  Merging the (KH, head_dim) axes puts
    (sequence, lanes) in XLA's tiled minor dims, so a sequence block is one
    contiguous packed HBM stripe — the layout the flash kernel streams and
    head-sharding splits on contiguous lane ranges.  (A 4D layout tiles
    (KH, head_dim) instead; any KH*hd-merged view of it is a physical
    relayout, which inside the decode scan re-copied the multi-GB cache
    per layer per token — measured 3 tok/s at 32k.)

    With int8 k/v arrays the cache is QUANTIZED per (position, head):
    k_scale/v_scale hold (L, KH, S) f32 absmax/127 factors (None for float
    caches) — sequence LAST, so a flash-kernel scale block (kh, s_blk) has
    positions along lanes and per-head scale rows read as native lane
    vectors (a (s_blk, kh) layout would need an in-kernel sublane->lane
    relayout per head per block).  Halves attention HBM traffic vs bf16 and doubles the max
    context per chip; the flash kernel folds the scales into score columns
    / softmax weights, so dequantization costs one VPU broadcast multiply
    per block (the reference keeps a full-f32 host cache,
    src/transformer.rs:227-228).
    """

    k: jax.Array  # (L, S, KH * head_dim)
    v: jax.Array  # (L, S, KH * head_dim)
    k_scale: Optional[jax.Array] = None  # (L, KH, S) f32, int8 caches only
    v_scale: Optional[jax.Array] = None


def init_kv_cache(cfg: ModelConfig, dtype=jnp.float32, seq_len: Optional[int] = None,
                  sharding=None, scale_sharding=None) -> KVCache:
    """Preallocate the cache (reference keeps f32 host buffers,
    src/transformer.rs:227-228; on TPU bfloat16 halves HBM traffic and is the
    default in the engine; int8 halves it again, "int4" halves it once
    more with nibble-packed bytes — see KVCache/quantize_kv_rows_q4).
    head_dim is lane-padded (cfg.cache_head_dim)."""
    s = seq_len or cfg.seq_len
    kv_m = cfg.n_kv_heads * cfg.cache_head_dim
    packed4 = isinstance(dtype, str) and dtype == "int4"
    store = jnp.int8 if packed4 else dtype
    shape = (cfg.n_layers, s, kv_m // 2 if packed4 else kv_m)

    def alloc(shp, dt, sh):
        z = jnp.zeros(shp, dt)
        return jax.device_put(z, sh) if sh is not None else z

    ks = vs = None
    if store == jnp.int8:
        sshape = (cfg.n_layers, cfg.n_kv_heads, s)
        ks = alloc(sshape, jnp.float32, scale_sharding)
        vs = alloc(sshape, jnp.float32, scale_sharding)
    return KVCache(k=alloc(shape, store, sharding),
                   v=alloc(shape, store, sharding),
                   k_scale=ks, v_scale=vs)


def q4_cache_pair_mode(kh: int, hd: int) -> bool:
    """int4-cache packing selector.  "half" (channel i pairs with
    i + hd/2 WITHIN a head) keeps each packed head a lane-aligned block
    only when hd % 256 == 0 (gemma); hd-128 models (llama/phi after lane
    padding) instead pack HEAD PAIRS — head 2p's channel c in the low
    nibble, head 2p+1's channel c in the high nibble — so the packed unit
    is a full 128-lane block again (VERDICT r3 next #8).  Odd kv-head
    counts keep half packing (XLA unpack path only)."""
    return hd % 256 != 0 and kh % 2 == 0


def q4_cache_supported(kh: int, hd: int) -> bool:
    """Can an int4 (nibble-packed) cache serve this head geometry on the
    flash kernels?  Either lane-aligned half-packing (hd % 256 == 0) or
    head-pair packing (hd % 128 == 0 with an even kv-head count)."""
    return hd % 256 == 0 or (hd % 128 == 0 and kh % 2 == 0)


def quantize_kv_rows_q4(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(T, KH, hd) float -> ((T, KH*hd/2) int8 BIASED nibble bytes,
    (T, KH) f32 scales).  Symmetric absmax/7 per (token, head).
    Packing is "half" or "pair" per q4_cache_pair_mode (both keep scales
    per (token, head)).  The byte layout is the weights' biased scheme
    (DESIGN.md §2): the int8 view reads v = 16*q_hi + (q_lo + 8), so
    q_hi = floor(v/16) and q_lo = v - 16*q_hi - 8 — one convert, one
    floor, one fma to unpack, all ops the round-2 weight kernels
    validated on Mosaic v5e."""
    t, kh, hd = x.shape
    amax = jnp.max(jnp.abs(x), axis=-1)                     # (T, KH)
    inv = jnp.where(amax > 0, 7.0 / amax, 0.0)
    q = jnp.clip(jnp.round(x * inv[..., None]), -8, 7).astype(jnp.int32)
    if q4_cache_pair_mode(kh, hd):
        qlo, qhi = q[:, 0::2, :], q[:, 1::2, :]             # head pairs
        v = (16 * qhi + qlo + 8).astype(jnp.int8)           # (T, KH/2, hd)
    else:
        qlo, qhi = q[..., : hd // 2], q[..., hd // 2:]
        v = (16 * qhi + qlo + 8).astype(jnp.int8)           # biased bytes
    return v.reshape(t, kh * hd // 2), amax / 7.0


def unpack_kv_q4(vals: jax.Array, kh: int, hd: int) -> jax.Array:
    """Inverse of quantize_kv_rows_q4's packing (no scale): (..., KH*hd/2)
    int8 biased bytes -> (..., KH, hd) f32 UNSCALED int values."""
    if q4_cache_pair_mode(kh, hd):
        v = vals.astype(jnp.float32).reshape(
            vals.shape[:-1] + (kh // 2, hd))
        qhi = jnp.floor(v / 16.0)
        qlo = v - 16.0 * qhi - 8.0
        q = jnp.stack([qlo, qhi], axis=-2)                  # (.., KH/2, 2, hd)
        return q.reshape(vals.shape[:-1] + (kh, hd))
    v = vals.astype(jnp.float32).reshape(vals.shape[:-1] + (kh, hd // 2))
    qhi = jnp.floor(v / 16.0)
    qlo = v - 16.0 * qhi - 8.0
    return jnp.concatenate([qlo, qhi], axis=-1)


def quantize_kv_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(T, KH, hd) float -> ((T, KH*hd) int8 rows, (T, KH) f32 scales).
    Symmetric absmax/127 per (token, head); all-zero rows get scale 0."""
    amax = jnp.max(jnp.abs(x), axis=-1)                     # (T, KH)
    inv = jnp.where(amax > 0, 127.0 / amax, 0.0)
    q = jnp.round(x * inv[..., None]).astype(jnp.int8)
    return q.reshape(x.shape[0], x.shape[1] * x.shape[2]), amax / 127.0


def _localize(qt: Optional[QTensor]) -> Optional[QTensor]:
    """QTensor metadata rebuilt from the LOCAL array shapes.

    Inside a shard_map body the q/s arrays are per-device blocks but the
    pytree aux data still carries the global out/in sizes; every forward-path
    consumer below re-derives them so the same code runs sharded or not
    (no-op when the metadata already matches)."""
    if qt is None or not isinstance(qt, QTensor) or qt.kmajor:
        # K-major tensors never run under shard_map (single-device decode
        # layout) and their trailing dims are (Kb, O_T), not (O, in)
        return qt
    o = qt.q.shape[-2]
    i = qt.q.shape[-1] * (2 if qt.qtype == QuantType.Q4_0 else 1)
    if qt.out_features == o and qt.in_features == i:
        return qt
    return QTensor(qt.q, qt.s, qt.qtype, qt.group_size, o, i)


def _flash_eligible(cfg: ModelConfig, t_q: int, attn_len: int) -> bool:
    """Use the blockwise Pallas attention kernel?  Fast path only.

    Measured on the v5e chip (scripts/flash_crossover.py, gemma-2-9b Q4):
    flash beats the XLA einsum at EVERY position — 16.2 vs 16.9 ms/tok at
    pos 16 (einsum bucket 256), 16.9 vs 17.9 at pos 1.8k (bucket 2048),
    17.8 vs 19.1 at pos 3.9k — the feared per-layer kernel-call overhead
    is smaller than the einsum's (T, KH, G, S) f32 score materialization
    even at short context.  So the default threshold is 256 (every
    bucket): with the engine's flash bucket collapse this makes the WHOLE
    engine two compiled programs (one prefill, one decode) with O(pos)
    attention reads at any position.  LMRS_FLASH_MIN_BUCKET overrides
    (10**9 disables flash for A/B runs).
    Serves decode steps AND prefill chunks (t_q up to 256: scores stay one
    (G*T, s_blk) VMEM tile per kv head)."""
    if cfg.matmul_impl != "fast" or t_q > 256:
        return False
    if cfg.cache_head_dim % 128 != 0:
        return False
    if cfg.cp_axis is not None:
        return False
    if attn_len % min(512, attn_len) != 0:
        # the kernel's block plan needs attn_len % s_blk == 0 with
        # s_blk = min(512, attn_len); ragged user --seq-len values keep
        # the XLA path (pow-2 buckets below 512 are always aligned)
        return False
    min_bucket = int(os.environ.get("LMRS_FLASH_MIN_BUCKET", "256"))
    return attn_len >= min_bucket


def cp_masked_write(cache_arr: jax.Array, rows: jax.Array, layer_idx,
                    pos, s_loc: int, axis: str) -> jax.Array:
    """Write T (KH*hd)-merged rows at GLOBAL position `pos` into this
    shard's local sequence block — ROW-exact: each shard takes exactly the
    sub-range of rows it owns, so a multi-token window MAY straddle a
    shard boundary (speculative verify windows, misaligned chunk resumes).
    Out-of-range shards re-write their own current rows (no-op RMW).

    Mechanics: anchor a T-row local window at idx = clip(lp, 0, s_loc-T)
    where lp = pos - shard*s_loc; local window row m corresponds to global
    write row j = idx + m - lp, valid iff 0 <= j < T.  Requires
    T <= s_loc (the engine's chunk/spec sizing guarantees it)."""
    t = rows.shape[0]
    if t > s_loc:
        raise ValueError(
            f"cp write window T={t} exceeds local shard rows s_loc="
            f"{s_loc}; the clip anchor would go negative and corrupt "
            "cache rows — shrink the (padded) prefill/spec chunk or "
            "lower cp")
    r = jax.lax.axis_index(axis)
    lp = pos - r * s_loc
    idx = jnp.clip(lp, 0, s_loc - t)
    j = idx + jnp.arange(t, dtype=jnp.int32) - lp
    mask = (j >= 0) & (j < t)
    picked = jnp.take(rows, jnp.clip(j, 0, t - 1), axis=0)
    old = jax.lax.dynamic_slice(
        cache_arr, (layer_idx, idx, 0), (1, t, cache_arr.shape[2]))
    new = jnp.where(mask[None, :, None],
                    picked[None].astype(cache_arr.dtype), old)
    return jax.lax.dynamic_update_slice(cache_arr, new,
                                        (layer_idx, idx, 0))


def cp_masked_write_scales(s_arr: jax.Array, srows: jax.Array, layer_idx,
                           pos, s_loc: int, axis: str) -> jax.Array:
    """cp_masked_write for the (L, KH, S)-layout scale planes of an int8
    cache: srows is (T, KH) (token-major, matching quantize_kv_rows); the
    write lands at sequence offset `pos` of the owning shard.  Row-exact
    like cp_masked_write — straddling windows split across shards."""
    t = srows.shape[0]
    if t > s_loc:
        raise ValueError(
            f"cp write window T={t} exceeds local shard rows s_loc={s_loc}")
    r = jax.lax.axis_index(axis)
    lp = pos - r * s_loc
    idx = jnp.clip(lp, 0, s_loc - t)
    j = idx + jnp.arange(t, dtype=jnp.int32) - lp
    mask = (j >= 0) & (j < t)
    picked = jnp.take(srows, jnp.clip(j, 0, t - 1), axis=0)  # (T, KH)
    old = jax.lax.dynamic_slice(
        s_arr, (layer_idx, 0, idx), (1, s_arr.shape[1], t))
    new = jnp.where(mask[None, None, :], picked.T[None], old)
    return jax.lax.dynamic_update_slice(s_arr, new, (layer_idx, 0, idx))


def embed_tokens(params: TransformerParams, cfg: ModelConfig,
                 tokens: jax.Array) -> jax.Array:
    """Gather (+dequantize) embedding rows; (T,) int32 → (T, D) float32.

    The reference eagerly dequantizes the whole table to f32 at load
    (src/transformer.rs:241-245); we keep it quantized in HBM and dequantize
    the gathered rows — bit-identical values, 4x less HBM.
    Gemma scales embeddings by sqrt(dim) (src/transformer.rs:326-332).

    With cfg.tp_axis set (inside shard_map) the table is vocab-sharded:
    masked local gather + psum.
    """
    emb = _localize(params.embed)
    if cfg.tp_axis is not None:
        vloc = emb.out_features
        r = jax.lax.axis_index(cfg.tp_axis)
        local = tokens - r * vloc
        ok = (local >= 0) & (local < vloc)
        idx = jnp.clip(local, 0, vloc - 1)
    else:
        ok = None
        idx = tokens
    if emb.qtype == QuantType.NONE:
        x = emb.q[idx].astype(jnp.float32)
    else:
        if emb.kmajor:
            # K-major tiled table (1, n_o, Kb, O_T): row v lives at
            # [0, v // O_T, :, v % O_T] — bytes along Kb are exactly the
            # runtime packed row, so the unpack below is unchanged
            o_t = emb.q.shape[-1]
            qrows = emb.q[0, idx // o_t, :, idx % o_t]
            srows = emb.s[0, idx // o_t, :, idx % o_t]
        else:
            qrows = emb.q[idx]
            srows = emb.s[idx]
        if emb.qtype == QuantType.Q4_0:
            from lmrs_tpu.quant import unpack_q4
            vals = unpack_q4(qrows, emb.group_size).astype(jnp.float32)
        else:
            vals = qrows.astype(jnp.float32)
        gs = emb.group_size
        g = vals.reshape(*vals.shape[:-1], vals.shape[-1] // gs, gs)
        x = (g * srows[..., None]).reshape(tokens.shape + (cfg.dim,))
    if ok is not None:
        x = jnp.where(ok[..., None], x, 0.0)
        x = jax.lax.psum(x, cfg.tp_axis)
    if cfg.embed_scale_by_sqrt_dim:
        x = x * jnp.float32(math.sqrt(cfg.dim))
    return x


def _unpermute_w13_cols(cfg: ModelConfig, w13: QTensor,
                        gu: jax.Array) -> jax.Array:
    """Q4 + fuse_ffn stores w13 rows in the fused kernel's split order
    (io/params.py); when the UNFUSED path computes gu = xb @ w13^T (prefill
    chunks), restore logical [gate;up] column order."""
    if not cfg.fuse_ffn or w13.qtype != QuantType.Q4_0:
        return gu
    import numpy as np

    from lmrs_tpu.kernels.fused_ffn import ffn_split_perm

    h = cfg.hidden_dim
    p = ffn_split_perm(h, cfg.group_size)
    perm = np.concatenate([p, h + p])
    inv = np.argsort(perm)  # logical feature j sits at fused column inv[j]
    return gu[:, inv]


def _layer(cfg: ModelConfig, x: jax.Array, lw: LayerWeights,
           k_cache: jax.Array, v_cache: jax.Array, layer_idx: jax.Array,
           cos: jax.Array, sin: jax.Array, pos: jax.Array,
           attn_len: int, stacked_idx=None, k_s=None, v_s=None,
           sp: bool = False):
    """One decoder layer over T tokens.  Returns (x, k_cache, v_cache,
    k_s, v_s) — the scale arrays are None unless the cache is int8.

    With `sp` (sequence-parallel prefill, cp meshes only) x holds only
    this shard's T/cp token slice — projections and FFN run on it alone —
    and pos is still the FULL chunk's first absolute position; the cp
    branch all_gathers the q/k/v row tiles for the cache write and the
    cross-shard attention merge.

    The FULL stacked (L, S, KH*hd) cache is threaded through (scan carry),
    updated in place at (layer_idx, pos) — XLA keeps carried
    dynamic-update-slices in-place in HBM, whereas stacking per-layer caches
    as scan outputs would copy the whole cache every step.

    Parity with reference src/transformer.rs:388-657.
    """
    t_q = x.shape[0]
    is_gemma = cfg.model_type == ModelType.GEMMA

    xb = rmsnorm(x, lw.att_norm, cfg.rms_norm_eps, cfg.norm_unit_offset)

    if lw.wqkv is not None:
        qkv = qmatmul(xb, _localize(lw.wqkv), cfg.matmul_impl,
                      layer_idx=stacked_idx)
        q = qkv[:, : cfg.att_dim]
        k = qkv[:, cfg.att_dim: cfg.att_dim + cfg.kv_dim]
        v = qkv[:, cfg.att_dim + cfg.kv_dim:]
    else:
        q = qmatmul(xb, _localize(lw.wq), cfg.matmul_impl,
                    layer_idx=stacked_idx)
        k = qmatmul(xb, _localize(lw.wk), cfg.matmul_impl,
                    layer_idx=stacked_idx)
        v = qmatmul(xb, _localize(lw.wv), cfg.matmul_impl,
                    layer_idx=stacked_idx)
    q = q.reshape(t_q, cfg.n_heads, cfg.head_dim)
    k = k.reshape(t_q, cfg.n_kv_heads, cfg.head_dim)
    v = v.reshape(t_q, cfg.n_kv_heads, cfg.head_dim)

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # Lane-pad head_dim (see ModelConfig.cache_head_dim): zero-padded q/k
    # add nothing to scores; zero-padded v rows are sliced off after.
    hd_pad = cfg.cache_head_dim - cfg.head_dim
    if hd_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, hd_pad)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, hd_pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, hd_pad)))

    # The cache stores rotated keys, like the reference (which applies RoPE
    # in-place on cache slices, src/transformer.rs:443,486-491); rows are
    # written (KH*hd)-merged (see KVCache).
    kv_m = cfg.n_kv_heads * cfg.cache_head_dim
    quant_kv = k_cache.dtype == jnp.int8
    quant4 = quant_kv and k_cache.shape[-1] == kv_m // 2
    if quant4:
        k_row, k_srow = quantize_kv_rows_q4(k)
        v_row, v_srow = quantize_kv_rows_q4(v)
    elif quant_kv:
        k_row, k_srow = quantize_kv_rows(k)
        v_row, v_srow = quantize_kv_rows(v)
    else:
        k_row = k.reshape(t_q, kv_m)
        v_row = v.reshape(t_q, kv_m)

    def _deq(att_vals, att_scales):
        # int8: (attn, KH*hd); int4: (attn, KH*hd/2) biased nibble bytes.
        # att_scales (KH, attn) f32 -> (attn, KH, hd) float
        if quant4:
            a3 = unpack_kv_q4(att_vals, cfg.n_kv_heads, cfg.cache_head_dim)
        else:
            a3 = att_vals.reshape(att_vals.shape[0], cfg.n_kv_heads,
                                  cfg.cache_head_dim).astype(jnp.float32)
        return a3 * att_scales.T[..., None]

    if cfg.cp_axis is not None:
        if sp:
            # sequence-parallel prefill: this shard projected only its own
            # T/cp token slice (forward sliced x); the cache write and the
            # attention_cp merge need the FULL chunk — all_gather the tiny
            # (T, KH*hd) row tiles and (T, H, hd) queries (O(T·heads)
            # bytes, nothing O(S)).  Shard order == token order.
            ag = lambda a: jax.lax.all_gather(a, cfg.cp_axis, axis=0,
                                              tiled=True)
            k_row, v_row = ag(k_row), ag(v_row)
            q = ag(q)
            if quant_kv:
                k_srow, v_srow = ag(k_srow), ag(v_srow)
        # sequence-sharded cache: the write lands on the owning shard only
        s_loc = k_cache.shape[1]
        k_cache = cp_masked_write(k_cache, k_row, layer_idx, pos, s_loc,
                                  cfg.cp_axis)
        v_cache = cp_masked_write(v_cache, v_row, layer_idx, pos, s_loc,
                                  cfg.cp_axis)
        if quant_kv:
            k_s = cp_masked_write_scales(k_s, k_srow, layer_idx, pos,
                                         s_loc, cfg.cp_axis)
            v_s = cp_masked_write_scales(v_s, v_srow, layer_idx, pos,
                                         s_loc, cfg.cp_axis)
        from lmrs_tpu.ops.attention import attention_cp

        k_att = jax.lax.dynamic_slice(
            k_cache, (layer_idx, 0, 0), (1, s_loc, k_cache.shape[2]))[0]
        v_att = jax.lax.dynamic_slice(
            v_cache, (layer_idx, 0, 0), (1, s_loc, v_cache.shape[2]))[0]
        if quant_kv:
            k_att = _deq(k_att, jax.lax.dynamic_slice(
                k_s, (layer_idx, 0, 0),
                (1, cfg.n_kv_heads, s_loc))[0])
            v_att = _deq(v_att, jax.lax.dynamic_slice(
                v_s, (layer_idx, 0, 0),
                (1, cfg.n_kv_heads, s_loc))[0])
        else:
            k_att = k_att.reshape(s_loc, cfg.n_kv_heads, cfg.cache_head_dim)
            v_att = v_att.reshape(s_loc, cfg.n_kv_heads, cfg.cache_head_dim)
        att = attention_cp(q, k_att, v_att, pos, cfg.cp_axis,
                           scale=cfg.attn_scale,
                           softcap=cfg.attn_logit_softcap,
                           window=cfg.sliding_window)
        if sp:
            # keep only this shard's token slice for the o-proj / FFN
            att = jax.lax.dynamic_slice_in_dim(
                att, jax.lax.axis_index(cfg.cp_axis) * t_q, t_q, 0)
    else:
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_row[None].astype(k_cache.dtype), (layer_idx, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_row[None].astype(v_cache.dtype), (layer_idx, pos, 0))
        if quant_kv:
            k_s = jax.lax.dynamic_update_slice(
                k_s, k_srow.T[None], (layer_idx, 0, pos))
            v_s = jax.lax.dynamic_update_slice(
                v_s, v_srow.T[None], (layer_idx, 0, pos))

        quant4_flash_ok = (not quant4) or q4_cache_supported(
            cfg.n_kv_heads, cfg.cache_head_dim)
        if _flash_eligible(cfg, t_q, attn_len) and quant4_flash_ok:
            from lmrs_tpu.kernels.flash_attention import flash_decode_stacked

            att = flash_decode_stacked(
                q, k_cache, v_cache, layer_idx, pos,
                n_kv=cfg.n_kv_heads, attn_len=attn_len,
                scale=cfg.attn_scale, softcap=cfg.attn_logit_softcap,
                window=cfg.sliding_window, k_scale=k_s, v_scale=v_s,
                packed4=quant4)
        else:
            k_att = jax.lax.dynamic_slice(
                k_cache, (layer_idx, 0, 0),
                (1, attn_len, k_cache.shape[2]))[0]
            v_att = jax.lax.dynamic_slice(
                v_cache, (layer_idx, 0, 0),
                (1, attn_len, v_cache.shape[2]))[0]
            if quant_kv:
                k_att = _deq(k_att, jax.lax.dynamic_slice(
                    k_s, (layer_idx, 0, 0),
                    (1, cfg.n_kv_heads, attn_len))[0])
                v_att = _deq(v_att, jax.lax.dynamic_slice(
                    v_s, (layer_idx, 0, 0),
                    (1, cfg.n_kv_heads, attn_len))[0])
            else:
                k_att = k_att.reshape(attn_len, cfg.n_kv_heads,
                                      cfg.cache_head_dim)
                v_att = v_att.reshape(attn_len, cfg.n_kv_heads,
                                      cfg.cache_head_dim)
            att = attention(
                q,
                k_att,
                v_att,
                pos,
                scale=cfg.attn_scale,
                softcap=cfg.attn_logit_softcap,
                window=cfg.sliding_window,
                precision="fast" if cfg.matmul_impl != "exact" else "highest",
            )
    if hd_pad:
        att = att[..., : cfg.head_dim]

    o = qmatmul(att.reshape(t_q, cfg.att_dim), _localize(lw.wo),
                cfg.matmul_impl, layer_idx=stacked_idx)
    if cfg.tp_axis is not None:
        o = jax.lax.psum(o, cfg.tp_axis)          # row-parallel reduce

    if is_gemma:
        # post-attention norm BEFORE the residual add, then pre-FFN norm
        # (reference: src/transformer.rs:563-572)
        h = rmsnorm(o, lw.post_att_norm, cfg.rms_norm_eps, True)
        x = x + h
        xb2 = rmsnorm(x, lw.pre_ffn_norm, cfg.rms_norm_eps, True)
    else:
        x = x + o
        xb2 = rmsnorm(x, lw.post_att_norm, cfg.rms_norm_eps, False)

    # Fused one-call FFN only at decode-sized T: its y13/g VMEM scratch
    # scales with T (prefill chunks OOM scoped VMEM), and per-call overhead
    # — the thing fusion removes — amortizes over T in prefill anyway.
    if (lw.w13 is not None and cfg.fuse_ffn and t_q <= 16
            and stacked_idx is None and not lw.w13.kmajor):
        from lmrs_tpu.kernels.fused_ffn import ffn_fused_pallas

        ff = ffn_fused_pallas(xb2, lw.w13, lw.w2,
                              act="gelu" if is_gemma else "silu")
    elif (lw.w13 is not None and cfg.fuse_ffn and t_q <= 8
            and stacked_idx is not None and not lw.w13.kmajor):
        from lmrs_tpu.kernels.fused_ffn import ffn_fused_xe_stacked

        ff = ffn_fused_xe_stacked(xb2, lw.w13, lw.w2, stacked_idx,
                                  act="gelu" if is_gemma else "silu")
    else:
        if lw.w13 is not None:
            gu = qmatmul(xb2, _localize(lw.w13), cfg.matmul_impl,
                         layer_idx=stacked_idx)
            gu = _unpermute_w13_cols(cfg, lw.w13, gu)
            gate, up = gu[:, : cfg.hidden_dim], gu[:, cfg.hidden_dim:]
        else:
            gate = qmatmul(xb2, _localize(lw.w1), cfg.matmul_impl,
                           layer_idx=stacked_idx)
            up = qmatmul(xb2, _localize(lw.w3), cfg.matmul_impl,
                         layer_idx=stacked_idx)
        act = (gelu_tanh(gate) if is_gemma else silu(gate)) * up
        ff = qmatmul(act, _localize(lw.w2), cfg.matmul_impl,
                     layer_idx=stacked_idx)
    if cfg.tp_axis is not None:
        ff = jax.lax.psum(ff, cfg.tp_axis)        # row-parallel reduce

    if is_gemma:
        # post-FFN norm before the residual add (reference: src/transformer.rs:643-650)
        x = x + rmsnorm(ff, lw.post_ffn_norm, cfg.rms_norm_eps, True)
    else:
        x = x + ff
    return x, k_cache, v_cache, k_s, v_s


@lru_cache(maxsize=None)
def _scan_fast_body(cfg: ModelConfig, attn_len: int, t_q: int,
                    sp: bool = False):
    """Stable scan-body function per (cfg, attn_len).

    All traced values (activations, cache, the stacked weights, rope rows,
    pos) travel through the scan CARRY — the weights pass through unchanged,
    which XLA treats as loop invariants — so the function object itself is
    cacheable and lax.scan's jaxpr-tracing cache hits instead of re-tracing
    a fresh closure on every call (the round-2 `TRACING CACHE MISS ...
    re-defined repeatedly` warnings, VERDICT r2 weak #2)."""

    def body(carry, xs):
        h, k_c, v_c, k_s, v_s, l, layers, cos, sin, pos = carry
        an, pan, pfn, pfn2 = xs
        lw = LayerWeights(
            att_norm=an, wq=None, wk=None, wv=None, wo=layers.wo,
            post_att_norm=pan, pre_ffn_norm=pfn, w1=None, w2=layers.w2,
            w3=None, post_ffn_norm=pfn2, wqkv=layers.wqkv,
            w13=layers.w13)
        h, k_c, v_c, k_s, v_s = _layer(cfg, h, lw, k_c, v_c, l, cos, sin,
                                       pos, attn_len, stacked_idx=l,
                                       k_s=k_s, v_s=v_s, sp=sp)
        return (h, k_c, v_c, k_s, v_s, l + 1, layers, cos, sin, pos), None

    return body


@lru_cache(maxsize=None)
def _scan_exact_body(cfg: ModelConfig, attn_len: int, t_q: int,
                     sp: bool = False):
    """Stable scan body for the stacked-exact layout (weights as scan xs)."""

    def body(carry, lw):
        h, k_c, v_c, k_s, v_s, l, cos, sin, pos = carry
        h, k_c, v_c, k_s, v_s = _layer(cfg, h, lw, k_c, v_c, l, cos, sin,
                                       pos, attn_len, k_s=k_s, v_s=v_s,
                                       sp=sp)
        return (h, k_c, v_c, k_s, v_s, l + 1, cos, sin, pos), None

    return body


def forward(
    params: TransformerParams,
    cfg: ModelConfig,
    cache: KVCache,
    x: jax.Array,            # (T, D) float32 input embeddings
    pos: jax.Array,          # scalar int32 — absolute position of x[0]
    attn_len: int,           # static: cache prefix length to attend over
    logit_idx: Optional[jax.Array] = None,  # scalar int32 row of x to get logits for
) -> Tuple[Optional[jax.Array], KVCache]:
    """Run all layers; optionally project one row to logits.

    Returns (logits (V,) float32 or None, updated cache).  With
    logit_idx=None this is the reference's `fill_kv_cache`
    (src/transformer.rs:672-684); with T=1, logit_idx=0 it is `forward`
    (src/transformer.rs:316-384).
    """
    t_q = x.shape[0]
    cos = jax.lax.dynamic_slice(params.rope_cos, (pos, 0),
                                (t_q, params.rope_cos.shape[1]))
    sin = jax.lax.dynamic_slice(params.rope_sin, (pos, 0),
                                (t_q, params.rope_sin.shape[1]))

    # Sequence-parallel prefill (cp meshes): each shard projects only its
    # own T/cp slice of the chunk, so projection/FFN FLOPs shard over cp
    # instead of being replicated (round-2 cp replicated them all —
    # VERDICT r2 weak #5).  The cp branch of _layer all_gathers the tiny
    # q/k/v row tiles for the cache write + attention merge; decode steps
    # (T=1) and non-divisible chunks keep the replicated path.
    sp = (cfg.cp_axis is not None and cfg.cp_degree > 1 and t_q > 1
          and t_q % cfg.cp_degree == 0)
    if sp:
        tl = t_q // cfg.cp_degree
        r0 = jax.lax.axis_index(cfg.cp_axis) * tl
        x = jax.lax.dynamic_slice_in_dim(x, r0, tl, 0)
        cos = jax.lax.dynamic_slice_in_dim(cos, r0, tl, 0)
        sin = jax.lax.dynamic_slice_in_dim(sin, r0, tl, 0)
        t_q = tl

    if isinstance(params.layers, (list, tuple)):
        # unrolled: each layer's weights are separate jit inputs, so the
        # fused matmul kernels read them straight from their HBM buffers
        # (scan xs slicing materializes a copy of every layer's weights
        # before each opaque kernel call — measurable on real chips)
        k_c, v_c = cache.k, cache.v
        k_s, v_s = cache.k_scale, cache.v_scale
        for l, lw in enumerate(params.layers):
            x, k_c, v_c, k_s, v_s = _layer(cfg, x, lw, k_c, v_c, l, cos,
                                           sin, pos, attn_len,
                                           k_s=k_s, v_s=v_s, sp=sp)
        k_new, v_new, ks_new, vs_new = k_c, v_c, k_s, v_s
    elif (cfg.matmul_impl in ("fast", "xla")
          and params.layers.wqkv is not None
          and (params.layers.wqkv.q.ndim == 3
               or params.layers.wqkv.kmajor)):
        # scan-fast layout: big weights stay OUTSIDE the scan (the stacked
        # Pallas kernels index the layer via scalar prefetch — no per-layer
        # HBM copies, and the program has ~5 kernel call sites instead of
        # layers*4, which on the axon remote compiler is minutes of compile)
        layers = params.layers
        norm_xs = (layers.att_norm, layers.post_att_norm,
                   layers.pre_ffn_norm, layers.post_ffn_norm)
        (x, k_new, v_new, ks_new, vs_new, _, _, _, _, _), _ = jax.lax.scan(
            _scan_fast_body(cfg, attn_len, t_q, sp),
            (x, cache.k, cache.v, cache.k_scale, cache.v_scale,
             jnp.int32(0), layers, cos, sin, pos),
            norm_xs)
    else:
        (x, k_new, v_new, ks_new, vs_new, _, _, _, _), _ = jax.lax.scan(
            _scan_exact_body(cfg, attn_len, t_q, sp),
            (x, cache.k, cache.v, cache.k_scale, cache.v_scale,
             jnp.int32(0), cos, sin, pos),
            params.layers)
    new_cache = KVCache(k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new)

    if logit_idx is None:
        return None, new_cache

    if sp:
        # re-assemble the chunk's hidden rows so logit_idx stays a global
        # token index (one (T, D) all_gather per chunk, only when logits
        # are wanted)
        x = jax.lax.all_gather(x, cfg.cp_axis, axis=0, tiled=True)

    if isinstance(logit_idx, str) and logit_idx == "all":
        # trace-time switch: logits for EVERY row (perplexity scoring);
        # the reference has no equivalent — it only ever projects the last
        # token (src/transformer.rs:345-373)
        xl = x
    else:
        xl = jax.lax.dynamic_slice(x, (logit_idx, 0), (1, cfg.dim))
    xl = rmsnorm(xl, params.final_norm, cfg.rms_norm_eps, cfg.norm_unit_offset)

    cls = params.embed if cfg.tied_lm_head else params.lm_head
    logits = qmatmul(xl, _localize(cls), cfg.matmul_impl)
    if cfg.tp_axis is not None:
        # vocab-sharded classifier: gather the local logit blocks
        logits = jax.lax.all_gather(logits, cfg.tp_axis, axis=-1, tiled=True)

    if cfg.final_logit_softcap is not None:
        cap = cfg.final_logit_softcap
        if cfg.parity_gemma_softcap_bug:
            # Replicate reference src/transformer.rs:375-381, which softcaps
            # only logits[0:dim] (loop bound is `dim`, not vocab_size).
            head = jnp.tanh(logits[:, : cfg.dim] / cap) * cap
            logits = jnp.concatenate([head, logits[:, cfg.dim:]], axis=-1)
        else:
            logits = jnp.tanh(logits / cap) * cap

    if isinstance(logit_idx, str):
        return logits, new_cache
    return logits[0], new_cache


def _layer_batched(cfg: ModelConfig, x: jax.Array, lw: LayerWeights,
                   k_c: jax.Array, v_c: jax.Array, layer_idx,
                   cos: jax.Array, sin: jax.Array, pos: jax.Array,
                   attn_len: int, stacked_idx=None, k_s=None, v_s=None,
                   t_q: int = 1, table=None):
    """One decoder layer over a BATCH of single-token slots.

    x (B, D); cache (B, L, S, KH*hd); pos (B,).  With t_q > 1 (the batched
    speculative verify) x is (B*t_q, D) row-flattened, cos/sin are per
    row, and each slot writes/attends a t_q-token window starting at its
    own pos.  Program size is O(1) in
    B: the cache update is a fori_loop of single-slice DUS ops (a vmapped
    DUS with per-slot positions lowers to scatter, which copies the
    multi-GB batched cache every step), and attention is one per-slot-
    masked einsum (ops.attention.attention_batched) or the batched flash
    kernel at long context.  k_s/v_s are the (B, L, S, KH) scale arrays of
    an int8 cache (None otherwise).

    With `table` (a (B, maxp) int32 page table) the cache is PAGED: k_c /
    v_c are shared (L, P, psz, KH*hd) pools, rows write into the slot's
    pages (virtual position -> table lookup -> physical page), scales
    into (L, P, KH, psz) planes, and attention runs the paged flash
    kernel (kernels.flash_attention.flash_decode_paged).  Pool memory is
    sum-of-contexts instead of B x max-context.
    """
    b = x.shape[0]
    is_gemma = cfg.model_type == ModelType.GEMMA

    xb = rmsnorm(x, lw.att_norm, cfg.rms_norm_eps, cfg.norm_unit_offset)
    if lw.wqkv is not None:
        qkv = qmatmul(xb, _localize(lw.wqkv), cfg.matmul_impl,
                      layer_idx=stacked_idx)
        q = qkv[:, : cfg.att_dim]
        k = qkv[:, cfg.att_dim: cfg.att_dim + cfg.kv_dim]
        v = qkv[:, cfg.att_dim + cfg.kv_dim:]
    else:
        q = qmatmul(xb, _localize(lw.wq), cfg.matmul_impl,
                    layer_idx=stacked_idx)
        k = qmatmul(xb, _localize(lw.wk), cfg.matmul_impl,
                    layer_idx=stacked_idx)
        v = qmatmul(xb, _localize(lw.wv), cfg.matmul_impl,
                    layer_idx=stacked_idx)
    q = q.reshape(b, cfg.n_heads, cfg.head_dim)
    k = k.reshape(b, cfg.n_kv_heads, cfg.head_dim)
    v = v.reshape(b, cfg.n_kv_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    hd_pad = cfg.cache_head_dim - cfg.head_dim
    if hd_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, hd_pad)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, hd_pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, hd_pad)))

    kv_m = cfg.n_kv_heads * cfg.cache_head_dim
    quant_kv = k_c.dtype == jnp.int8
    # int4 pool (paged only): int8-dtype storage at HALF the lane width,
    # nibble-packed by quantize_kv_rows_q4
    packed4 = (table is not None and quant_kv
               and k_c.shape[-1] == kv_m // 2)
    n_slots = b // t_q
    if packed4:
        kd, k_srow = quantize_kv_rows_q4(k)     # (B*T, kv_m/2), (B*T, KH)
        vd, v_srow = quantize_kv_rows_q4(v)
        k_s3 = k_srow.reshape(n_slots, t_q, -1).transpose(0, 2, 1)
        v_s3 = v_srow.reshape(n_slots, t_q, -1).transpose(0, 2, 1)
    elif quant_kv:
        kd, k_srow = quantize_kv_rows(k)        # (B*T, kv_m), (B*T, KH)
        vd, v_srow = quantize_kv_rows(v)
        # (n_slots, KH, t_q) transposed slabs for the seq-last scale planes
        k_s3 = k_srow.reshape(n_slots, t_q, -1).transpose(0, 2, 1)
        v_s3 = v_srow.reshape(n_slots, t_q, -1).transpose(0, 2, 1)
    else:
        kd = k.reshape(b, kv_m).astype(k_c.dtype)
        vd = v.reshape(b, kv_m).astype(v_c.dtype)
        k_s3 = v_s3 = None

    if table is not None:
        # paged pool: slot i's t_q rows land at virtual positions
        # pos[i]..pos[i]+t_q-1, physical page table[i, vp // psz], page
        # row vp % psz.  Fast path: the whole window as ONE slab DUS when
        # it fits a single page (t_q <= psz guarantees it straddles at
        # most one boundary); the boundary case falls back to row-wise
        # DUS.  Program size stays O(1) in B either way.
        psz = k_c.shape[2]
        kh = cfg.n_kv_heads
        kv_w = kd.shape[-1]              # kv_m, or kv_m/2 nibble-packed
        kd3p = kd.reshape(n_slots, t_q, kv_w)
        vd3p = vd.reshape(n_slots, t_q, kv_w)
        # hoist the page-table lookups out of the slot loop: one (B,)
        # vector gather instead of B scalar gathers per layer per step
        # (the scalar form cost ~L*B tiny ops per decode step)
        pg0v = jnp.take_along_axis(table, (pos // psz)[:, None],
                                   axis=1)[:, 0]
        off0v = pos % psz

        def _upd_slot(i, kv):
            pg0 = pg0v[i]
            off0 = off0v[i]

            def slab(kv):
                kc, vc, ks, vs = kv
                krows = jax.lax.dynamic_slice_in_dim(kd3p, i, 1, 0) \
                    .reshape(1, 1, t_q, kv_w)
                vrows = jax.lax.dynamic_slice_in_dim(vd3p, i, 1, 0) \
                    .reshape(1, 1, t_q, kv_w)
                kc = jax.lax.dynamic_update_slice(
                    kc, krows, (layer_idx, pg0, off0, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, vrows, (layer_idx, pg0, off0, 0))
                if quant_kv:
                    # scale pools are (L, P, KH, psz)
                    ks = jax.lax.dynamic_update_slice(
                        ks, jax.lax.dynamic_slice_in_dim(k_s3, i, 1, 0)
                        .reshape(1, 1, kh, t_q),
                        (layer_idx, pg0, 0, off0))
                    vs = jax.lax.dynamic_update_slice(
                        vs, jax.lax.dynamic_slice_in_dim(v_s3, i, 1, 0)
                        .reshape(1, 1, kh, t_q),
                        (layer_idx, pg0, 0, off0))
                return kc, vc, ks, vs

            def rows(kv):
                def rw(r, kv):
                    kc, vc, ks, vs = kv
                    vp = pos[i] + r
                    pg = table[i, vp // psz]
                    off = vp % psz
                    g = i * t_q + r
                    kc = jax.lax.dynamic_update_slice(
                        kc, kd[g].reshape(1, 1, 1, kv_w),
                        (layer_idx, pg, off, 0))
                    vc = jax.lax.dynamic_update_slice(
                        vc, vd[g].reshape(1, 1, 1, kv_w),
                        (layer_idx, pg, off, 0))
                    if quant_kv:
                        ks = jax.lax.dynamic_update_slice(
                            ks, k_srow[g].reshape(1, 1, kh, 1),
                            (layer_idx, pg, 0, off))
                        vs = jax.lax.dynamic_update_slice(
                            vs, v_srow[g].reshape(1, 1, kh, 1),
                            (layer_idx, pg, 0, off))
                    return kc, vc, ks, vs

                return jax.lax.fori_loop(0, t_q, rw, kv)

            if t_q == 1:
                return slab(kv)          # one row never straddles
            return jax.lax.cond(off0 + t_q <= psz, slab, rows, kv)

        k_c, v_c, k_s, v_s = jax.lax.fori_loop(0, n_slots, _upd_slot,
                                               (k_c, v_c, k_s, v_s))
        from lmrs_tpu.kernels.flash_attention import flash_decode_paged

        qf = q if t_q == 1 else q.reshape(n_slots, t_q, cfg.n_heads,
                                          cfg.cache_head_dim)
        att = flash_decode_paged(
            qf, k_c, v_c, table, layer_idx, pos, n_kv=cfg.n_kv_heads,
            scale=cfg.attn_scale, softcap=cfg.attn_logit_softcap,
            window=cfg.sliding_window, k_scale=k_s, v_scale=v_s,
            packed4=packed4)
        if t_q > 1:
            att = att.reshape(b, cfg.n_heads, cfg.cache_head_dim)
        if hd_pad:
            att = att[..., : cfg.head_dim]
        o = qmatmul(att.reshape(b, cfg.att_dim), _localize(lw.wo),
                    cfg.matmul_impl, layer_idx=stacked_idx)
        return _layer_batched_post(cfg, x, lw, o, stacked_idx,
                                   k_c, v_c, k_s, v_s)

    kd3 = kd.reshape(n_slots, t_q, kv_m)
    vd3 = vd.reshape(n_slots, t_q, kv_m)

    if cfg.cp_axis is not None:
        # Batched serving over a cp mesh: the contiguous cache's SEQUENCE
        # axis is sharded (local (B, L, S/cp, kv_m) block inside
        # shard_map).  Writes are the per-slot form of cp_masked_write
        # (row-exact, straddle-safe: a speculative verify window may split
        # across two shards); attention runs the batched flash kernel on
        # the local rows with seq_base-global masks and merges partials
        # across shards with the attention_cp online-softmax reduction —
        # communication is O(B·heads) scalars, never O(S).
        s_loc = k_c.shape[2]
        assert t_q <= s_loc, (t_q, s_loc)
        seq_base = jax.lax.axis_index(cfg.cp_axis) * s_loc
        kh = cfg.n_kv_heads
        tra = jnp.arange(t_q, dtype=jnp.int32)

        def _upd_cp(i, kv):
            kc, vc, ks, vs = kv
            lp = pos[i] - seq_base
            idx = jnp.clip(lp, 0, s_loc - t_q)
            jj = idx + tra - lp       # source row for each local dest row
            mask = (jj >= 0) & (jj < t_q)
            jjc = jnp.clip(jj, 0, t_q - 1)

            def row_pick(a3):         # (n_slots, t_q, W) -> (t_q, W)
                return jnp.take(
                    jax.lax.dynamic_slice_in_dim(a3, i, 1, 0)[0], jjc,
                    axis=0)

            kold = jax.lax.dynamic_slice(
                kc, (i, layer_idx, idx, 0), (1, 1, t_q, kv_m))
            vold = jax.lax.dynamic_slice(
                vc, (i, layer_idx, idx, 0), (1, 1, t_q, kv_m))
            kc = jax.lax.dynamic_update_slice(
                kc, jnp.where(mask[:, None], row_pick(kd3),
                              kold[0, 0])[None, None],
                (i, layer_idx, idx, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, jnp.where(mask[:, None], row_pick(vd3),
                              vold[0, 0])[None, None],
                (i, layer_idx, idx, 0))
            if quant_kv:
                # scale planes (B, L, KH, S/cp); k_s3 is (n_slots, KH, t_q)
                def s_pick(s3):
                    return jnp.take(
                        jax.lax.dynamic_slice_in_dim(s3, i, 1, 0)[0], jjc,
                        axis=1)       # (KH, t_q)

                sold_k = jax.lax.dynamic_slice(
                    ks, (i, layer_idx, 0, idx), (1, 1, kh, t_q))
                sold_v = jax.lax.dynamic_slice(
                    vs, (i, layer_idx, 0, idx), (1, 1, kh, t_q))
                ks = jax.lax.dynamic_update_slice(
                    ks, jnp.where(mask[None, :], s_pick(k_s3),
                                  sold_k[0, 0])[None, None],
                    (i, layer_idx, 0, idx))
                vs = jax.lax.dynamic_update_slice(
                    vs, jnp.where(mask[None, :], s_pick(v_s3),
                                  sold_v[0, 0])[None, None],
                    (i, layer_idx, 0, idx))
            return kc, vc, ks, vs

        k_c, v_c, k_s, v_s = jax.lax.fori_loop(0, n_slots, _upd_cp,
                                               (k_c, v_c, k_s, v_s))

        from lmrs_tpu.kernels.flash_attention import flash_decode_batched

        qf = q if t_q == 1 else q.reshape(n_slots, t_q, cfg.n_heads,
                                          cfg.cache_head_dim)
        acc, m, lden = flash_decode_batched(
            qf, k_c, v_c, layer_idx, pos, n_kv=cfg.n_kv_heads,
            attn_len=s_loc, scale=cfg.attn_scale,
            softcap=cfg.attn_logit_softcap, window=cfg.sliding_window,
            k_scale=k_s, v_scale=v_s, seq_base=seq_base, return_lse=True)
        m_g = jax.lax.pmax(m, cfg.cp_axis)
        w = jnp.exp(m - m_g)
        num = jax.lax.psum(acc * w[..., None], cfg.cp_axis)
        den = jax.lax.psum(lden * w, cfg.cp_axis)
        att = num / den[..., None]
        if t_q > 1:
            att = att.reshape(b, cfg.n_heads, cfg.cache_head_dim)
        if hd_pad:
            att = att[..., : cfg.head_dim]
        o = qmatmul(att.reshape(b, cfg.att_dim), _localize(lw.wo),
                    cfg.matmul_impl, layer_idx=stacked_idx)
        return _layer_batched_post(cfg, x, lw, o, stacked_idx,
                                   k_c, v_c, k_s, v_s)

    def _upd(i, kv):
        kc, vc, ks, vs = kv
        kc = jax.lax.dynamic_update_slice(
            kc, jax.lax.dynamic_slice_in_dim(kd3, i, 1, 0)[:, None],
            (i, layer_idx, pos[i], 0))
        vc = jax.lax.dynamic_update_slice(
            vc, jax.lax.dynamic_slice_in_dim(vd3, i, 1, 0)[:, None],
            (i, layer_idx, pos[i], 0))
        if quant_kv:
            # scale planes are (B, L, KH, S): a (1, 1, KH, t_q) slab
            ks = jax.lax.dynamic_update_slice(
                ks, jax.lax.dynamic_slice_in_dim(k_s3, i, 1, 0)[:, None],
                (i, layer_idx, 0, pos[i]))
            vs = jax.lax.dynamic_update_slice(
                vs, jax.lax.dynamic_slice_in_dim(v_s3, i, 1, 0)[:, None],
                (i, layer_idx, 0, pos[i]))
        return kc, vc, ks, vs

    k_c, v_c, k_s, v_s = jax.lax.fori_loop(0, n_slots, _upd,
                                           (k_c, v_c, k_s, v_s))

    if _flash_eligible(cfg, t_q, attn_len):
        from lmrs_tpu.kernels.flash_attention import flash_decode_batched

        qf = q if t_q == 1 else q.reshape(n_slots, t_q, cfg.n_heads,
                                          cfg.cache_head_dim)
        att = flash_decode_batched(
            qf, k_c, v_c, layer_idx, pos, n_kv=cfg.n_kv_heads,
            attn_len=attn_len,
            scale=cfg.attn_scale, softcap=cfg.attn_logit_softcap,
            window=cfg.sliding_window, k_scale=k_s, v_scale=v_s)
        if t_q > 1:
            att = att.reshape(b, cfg.n_heads, cfg.cache_head_dim)
    else:
        kl = jax.lax.dynamic_slice_in_dim(k_c, layer_idx, 1, 1)[:, 0,
                                                                :attn_len]
        vl = jax.lax.dynamic_slice_in_dim(v_c, layer_idx, 1, 1)[:, 0,
                                                                :attn_len]
        kl = kl.reshape(n_slots, attn_len, cfg.n_kv_heads,
                        cfg.cache_head_dim)
        vl = vl.reshape(n_slots, attn_len, cfg.n_kv_heads,
                        cfg.cache_head_dim)
        if quant_kv:
            ksl = jax.lax.dynamic_slice_in_dim(k_s, layer_idx, 1, 1)[
                :, 0, :, :attn_len]                       # (B, KH, attn)
            vsl = jax.lax.dynamic_slice_in_dim(v_s, layer_idx, 1, 1)[
                :, 0, :, :attn_len]
            kl = kl.astype(jnp.float32) * ksl.transpose(0, 2, 1)[..., None]
            vl = vl.astype(jnp.float32) * vsl.transpose(0, 2, 1)[..., None]
        if t_q == 1:
            att = attention_batched(
                q, kl, vl, pos, scale=cfg.attn_scale,
                softcap=cfg.attn_logit_softcap, window=cfg.sliding_window,
                precision="fast" if cfg.matmul_impl != "exact"
                else "highest")
        else:
            from lmrs_tpu.ops.attention import attention_batched_multi

            att = attention_batched_multi(
                q.reshape(n_slots, t_q, cfg.n_heads, cfg.cache_head_dim),
                kl, vl, pos, scale=cfg.attn_scale,
                softcap=cfg.attn_logit_softcap, window=cfg.sliding_window,
                precision="fast" if cfg.matmul_impl != "exact"
                else "highest")
            att = att.reshape(b, cfg.n_heads, cfg.cache_head_dim)
    if hd_pad:
        att = att[..., : cfg.head_dim]

    o = qmatmul(att.reshape(b, cfg.att_dim), _localize(lw.wo),
                cfg.matmul_impl, layer_idx=stacked_idx)
    return _layer_batched_post(cfg, x, lw, o, stacked_idx,
                               k_c, v_c, k_s, v_s)


def _layer_batched_post(cfg: ModelConfig, x, lw: LayerWeights, o,
                        stacked_idx, k_c, v_c, k_s, v_s):
    """Post-attention tail of a batched layer (residual + norms + FFN),
    shared by the contiguous-cache and paged-cache paths."""
    b = x.shape[0]
    is_gemma = cfg.model_type == ModelType.GEMMA
    if cfg.tp_axis is not None:
        o = jax.lax.psum(o, cfg.tp_axis)
    if is_gemma:
        h = rmsnorm(o, lw.post_att_norm, cfg.rms_norm_eps, True)
        x = x + h
        xb2 = rmsnorm(x, lw.pre_ffn_norm, cfg.rms_norm_eps, True)
    else:
        x = x + o
        xb2 = rmsnorm(x, lw.post_att_norm, cfg.rms_norm_eps, False)
    if (lw.w13 is not None and cfg.fuse_ffn and b <= 16
            and stacked_idx is None):
        from lmrs_tpu.kernels.fused_ffn import ffn_fused_pallas

        ff = ffn_fused_pallas(xb2, lw.w13, lw.w2,
                              act="gelu" if is_gemma else "silu")
    elif (lw.w13 is not None and cfg.fuse_ffn and b <= 8
            and stacked_idx is not None):
        from lmrs_tpu.kernels.fused_ffn import ffn_fused_xe_stacked

        ff = ffn_fused_xe_stacked(xb2, lw.w13, lw.w2, stacked_idx,
                                  act="gelu" if is_gemma else "silu")
    else:
        if lw.w13 is not None:
            gu = qmatmul(xb2, _localize(lw.w13), cfg.matmul_impl,
                         layer_idx=stacked_idx)
            gu = _unpermute_w13_cols(cfg, lw.w13, gu)
            gate, up = gu[:, : cfg.hidden_dim], gu[:, cfg.hidden_dim:]
        else:
            gate = qmatmul(xb2, _localize(lw.w1), cfg.matmul_impl,
                           layer_idx=stacked_idx)
            up = qmatmul(xb2, _localize(lw.w3), cfg.matmul_impl,
                         layer_idx=stacked_idx)
        act = (gelu_tanh(gate) if is_gemma else silu(gate)) * up
        ff = qmatmul(act, _localize(lw.w2), cfg.matmul_impl,
                     layer_idx=stacked_idx)
    if cfg.tp_axis is not None:
        ff = jax.lax.psum(ff, cfg.tp_axis)
    if is_gemma:
        x = x + rmsnorm(ff, lw.post_ffn_norm, cfg.rms_norm_eps, True)
    else:
        x = x + ff
    return x, k_c, v_c, k_s, v_s


@lru_cache(maxsize=None)
def _batched_fast_body(cfg: ModelConfig, attn_len: int, b: int,
                       t_q: int = 1, paged: bool = False):
    """Stable scan body for the batched scan-fast decode (see
    _scan_fast_body for why the traced values travel in the carry).
    With `paged` the carry also holds the page table (a traced array)."""

    def body(carry, xs):
        if paged:
            (h, k_c, v_c, k_s, v_s, l, layers, cos, sin, pos,
             table) = carry
        else:
            h, k_c, v_c, k_s, v_s, l, layers, cos, sin, pos = carry
            table = None
        an, pan, pfn, pfn2 = xs
        lw = LayerWeights(
            att_norm=an, wq=None, wk=None, wv=None, wo=layers.wo,
            post_att_norm=pan, pre_ffn_norm=pfn, w1=None, w2=layers.w2,
            w3=None, post_ffn_norm=pfn2, wqkv=layers.wqkv,
            w13=layers.w13)
        h, k_c, v_c, k_s, v_s = _layer_batched(
            cfg, h, lw, k_c, v_c, l, cos, sin, pos, attn_len,
            stacked_idx=l, k_s=k_s, v_s=v_s, t_q=t_q, table=table)
        out = (h, k_c, v_c, k_s, v_s, l + 1, layers, cos, sin, pos)
        if paged:
            out = out + (table,)
        return out, None

    return body


@lru_cache(maxsize=None)
def _batched_exact_body(cfg: ModelConfig, attn_len: int, b: int,
                        t_q: int = 1, paged: bool = False):
    def body(carry, lw):
        if paged:
            h, k_c, v_c, k_s, v_s, l, cos, sin, pos, table = carry
        else:
            h, k_c, v_c, k_s, v_s, l, cos, sin, pos = carry
            table = None
        h, k_c, v_c, k_s, v_s = _layer_batched(
            cfg, h, lw, k_c, v_c, l, cos, sin, pos, attn_len,
            k_s=k_s, v_s=v_s, t_q=t_q, table=table)
        out = (h, k_c, v_c, k_s, v_s, l + 1, cos, sin, pos)
        if paged:
            out = out + (table,)
        return out, None

    return body


def forward_batched(
    params: TransformerParams,
    cfg: ModelConfig,
    cache: KVCache,          # arrays shaped (B, L, S, KH*head_dim)
    x: jax.Array,            # (B*t_q, D) — t_q tokens per slot, flattened
    pos: jax.Array,          # (B,) int32 — per-slot absolute positions
    attn_len: int,           # static cache prefix length (shared bucket)
    t_q: int = 1,            # tokens per slot (speculative verify: k+1)
    table: Optional[jax.Array] = None,   # (B, maxp) int32: PAGED cache
    want_logits: bool = True,            # False: skip the classifier
) -> Tuple[jax.Array, KVCache]:
    """One decode step for a BATCH of independent sequences.

    The TPU-native continuous-batching step: all matmuls run on the stacked
    (B, D) activations so the quantized weights stream from HBM ONCE per
    step regardless of batch size (the MXU is happier with B>1 rows too);
    only attention and the KV-cache update — the genuinely per-sequence
    state — are per-slot, and both are O(1) in program size (fori_loop DUS
    + one per-slot-masked einsum / batched flash kernel), so B=32 compiles
    in the same time as B=8.  This is the piece the reference lacks
    entirely (it instantiates a whole model per connection,
    reference: src/bin/backend.rs:88-110).

    Returns (logits (B*t_q, V) f32, updated cache).
    """
    if t_q == 1:
        positions = pos
    else:
        positions = (pos[:, None]
                     + jnp.arange(t_q, dtype=jnp.int32)[None, :]).reshape(-1)
    cos = params.rope_cos[positions]      # (B*t_q, hd/2)
    sin = params.rope_sin[positions]

    layers = params.layers
    k_c, v_c = cache.k, cache.v
    k_s, v_s = cache.k_scale, cache.v_scale
    paged = table is not None
    if isinstance(layers, (list, tuple)):
        for l, lw in enumerate(layers):
            x, k_c, v_c, k_s, v_s = _layer_batched(
                cfg, x, lw, k_c, v_c, l, cos, sin, pos, attn_len,
                k_s=k_s, v_s=v_s, t_q=t_q, table=table)
    elif (cfg.matmul_impl == "fast" and layers.wqkv is not None
          and layers.wqkv.q.ndim == 3):
        # scan-fast: stacked kernels select the layer via scalar prefetch
        # (see forward) — batched decode gets the same fast-compile path
        norm_xs = (layers.att_norm, layers.post_att_norm,
                   layers.pre_ffn_norm, layers.post_ffn_norm)
        carry = (x, k_c, v_c, k_s, v_s, jnp.int32(0), layers, cos, sin,
                 pos)
        if paged:
            carry = carry + (table,)
        carry, _ = jax.lax.scan(
            _batched_fast_body(cfg, attn_len, x.shape[0], t_q, paged),
            carry, norm_xs)
        x, k_c, v_c, k_s, v_s = carry[:5]
    else:
        carry = (x, k_c, v_c, k_s, v_s, jnp.int32(0), cos, sin, pos)
        if paged:
            carry = carry + (table,)
        carry, _ = jax.lax.scan(
            _batched_exact_body(cfg, attn_len, x.shape[0], t_q, paged),
            carry, layers)
        x, k_c, v_c, k_s, v_s = carry[:5]

    new_cache = KVCache(k=k_c, v=v_c, k_scale=k_s, v_scale=v_s)
    if not want_logits:
        return None, new_cache
    x = rmsnorm(x, params.final_norm, cfg.rms_norm_eps,
                cfg.norm_unit_offset)
    cls = params.embed if cfg.tied_lm_head else params.lm_head
    logits = qmatmul(x, _localize(cls), cfg.matmul_impl)
    if cfg.tp_axis is not None:
        logits = jax.lax.all_gather(logits, cfg.tp_axis, axis=-1, tiled=True)
    if cfg.final_logit_softcap is not None:
        cap = cfg.final_logit_softcap
        if cfg.parity_gemma_softcap_bug:
            head = jnp.tanh(logits[:, : cfg.dim] / cap) * cap
            logits = jnp.concatenate([head, logits[:, cfg.dim:]], axis=1)
        else:
            logits = jnp.tanh(logits / cap) * cap
    return logits, new_cache


def dequantize_params(params: TransformerParams) -> TransformerParams:
    """Debug helper: fully dequantized f32 copy of all weights."""
    def deq(qt):
        if isinstance(qt, QTensor) and qt.qtype != QuantType.NONE:
            return QTensor(dequantize(qt), None, QuantType.NONE,
                           qt.group_size, qt.out_features, qt.in_features)
        return qt
    return jax.tree_util.tree_map(
        deq, params, is_leaf=lambda n: isinstance(n, QTensor))
