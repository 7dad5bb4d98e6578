"""Group-wise weight/activation quantization (Q8_0 / Q4_0).

TPU-native re-design of the reference's quantization core
(reference: src/quantization.rs:1-95, utils/quantization.py:4-66):

* Weights are stored exactly as the `.lmrs` format stores them — Q8_0 as int8
  values + one f32 scale per `group_size` values, Q4_0 as two 4-bit values
  packed per byte (lo nibble first, value range [0,15] with an implicit -8
  offset) + f32 scales — so HBM traffic matches the file's byte count.
* Activations are re-quantized on the fly before every quantized matmul with
  the reference's exact runtime scheme (scale = absmax/127 for Q8, and the
  asymmetric absmax/-8 for Q4 — note the export side uses absmax/-7.5 for
  weights; that asymmetry is by design, reference: utils/quantization.py:18 vs
  src/quantization.rs:71).

Everything here is shape-polymorphic over leading (batch/sequence) dims; the
group dimension is always the innermost axis.
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class QuantType(enum.IntEnum):
    """On-disk/in-HBM weight encoding (reference: src/quantization.rs:1-6)."""

    NONE = 0
    Q8_0 = 1
    Q4_0 = 2


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("q", "s"),
    meta_fields=("qtype", "group_size", "out_features", "in_features",
                 "kmajor"),
)
@dataclasses.dataclass
class QTensor:
    """A (possibly) quantized 2-D weight matrix of logical shape (out, in).

    - NONE:  q is float (out, in), s is None.
    - Q8_0:  q is int8 (out, in), s is f32 (out, in//gs).
    - Q4_0:  q is uint8 (out, in//2) nibble-packed, s is f32 (out, in//gs).

    Layer-stacked variants carry a leading n_layers axis on both q and s.

    kmajor=True marks the K-major tiled decode layout
    (kernels/vpu_matvec.py): q (L, n_o, Kb, O_T), s (L, n_o, G, O_T),
    L=1 for non-stacked tensors.
    """

    q: jax.Array
    s: Optional[jax.Array]
    qtype: QuantType
    group_size: int
    out_features: int
    in_features: int
    kmajor: bool = False

    @property
    def logical_shape(self):
        return (self.out_features, self.in_features)


# ---------------------------------------------------------------------------
# Rounding helpers
# ---------------------------------------------------------------------------

def _round_half_away(x: jax.Array) -> jax.Array:
    """Round half away from zero — Rust f32::round semantics
    (reference: src/quantization.rs:63 `.round()`), unlike numpy/jnp's
    round-half-to-even."""
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


def _np_round_half_away(x: np.ndarray) -> np.ndarray:
    return np.trunc(x + np.where(x >= 0, 0.5, -0.5))


# ---------------------------------------------------------------------------
# Activation quantization (runtime, JAX) — exact parity with the reference's
# on-the-fly re-quantization before every quantized matmul.
# ---------------------------------------------------------------------------

def quantize_q8_act(x: jax.Array, group_size: int):
    """Per-group symmetric int8 activation quantization.

    Parity with reference src/quantization.rs:44-67: scale = absmax/127,
    round half away from zero.  All-zero groups produce q=0, s=0 (the
    reference's 0/0=NaN → `as i8` → 0 path).

    Returns (q int8 (..., n), s f32 (..., n//gs)).
    """
    n = x.shape[-1]
    g = x.reshape(*x.shape[:-1], n // group_size, group_size)
    wmax = jnp.max(jnp.abs(g), axis=-1)
    scale = wmax / 127.0
    safe = jnp.where(scale == 0, 1.0, scale)
    q = _round_half_away(g / safe[..., None])
    q = jnp.where(scale[..., None] == 0, 0.0, q).astype(jnp.int8)
    return q.reshape(x.shape), scale.astype(jnp.float32)


def quantize_q4_act(x: jax.Array, group_size: int):
    """Per-group int4 activation quantization, kept UNPACKED as int8 in [-8,7].

    Parity with reference src/quantization.rs:69-95: scale = absmax/(-8),
    q_u = clamp(round(x/scale + 8), 0, 15), stored value q_u - 8.  The
    reference packs two values per byte purely as a storage format; the int
    dot products it computes are over the unpacked values, so an unpacked
    int8 representation is bit-equivalent (and is what the MXU wants).

    All-zero groups: reference hits (NaN+8) `as u8` == 0 → value -8 with
    scale -0.0, whose group contribution is ±0.0 — we replicate q_u=0.

    Returns (values int8 (..., n) in [-8,7], s f32 (..., n//gs)).
    """
    n = x.shape[-1]
    g = x.reshape(*x.shape[:-1], n // group_size, group_size)
    wmax = jnp.max(jnp.abs(g), axis=-1)
    scale = wmax / (-8.0)
    safe = jnp.where(scale == 0, 1.0, scale)
    qu = _round_half_away(g / safe[..., None] + 8.0)
    qu = jnp.clip(qu, 0.0, 15.0)
    qu = jnp.where(scale[..., None] == 0, 0.0, qu)
    q = (qu - 8.0).astype(jnp.int8)
    return q.reshape(x.shape), scale.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Weight dequantization (JAX)
# ---------------------------------------------------------------------------

def unpack_q4_file(packed: jax.Array) -> jax.Array:
    """Unpack FILE-layout Q4 bytes (..., n//2) → int8 values (..., n).

    The .lmrs file packs adjacent elements: low nibble = even element, high
    nibble = odd (reference: src/quantization.rs:17-23,
    utils/quantization.py:37)."""
    u = packed.astype(jnp.uint8)
    lo = (u & 0x0F).astype(jnp.int8) - 8
    hi = ((u >> 4) & 0x0F).astype(jnp.int8) - 8
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


def unpack_q4(packed: jax.Array, group_size: int) -> jax.Array:
    """Unpack RUNTIME-layout Q4 bytes (..., n//2) → int8 values (..., n).

    The runtime layout pairs element j of a group with element j + gs/2 of
    the SAME group (low nibble = first half, high = second half), so a
    packed byte's two values share one scale and unpacked halves are
    block-contiguous — the fused kernels then need no element-interleaving
    (see kernels/dequant_matmul.py).  Runtime bytes are additionally
    BIASED by XOR 0x80: the int8 view of a stored byte is exactly u-128,
    which the Pallas kernels exploit for a comparison-free nibble split
    (Mosaic on v5e has no uint8 converts)."""
    half = group_size // 2
    u = packed.astype(jnp.uint8) ^ 0x80
    lo = (u & 0x0F).astype(jnp.int8) - 8
    hi = ((u >> 4) & 0x0F).astype(jnp.int8) - 8
    g = packed.shape[-1] // half
    lo = lo.reshape(*packed.shape[:-1], g, half)
    hi = hi.reshape(*packed.shape[:-1], g, half)
    out = jnp.concatenate([lo, hi], axis=-1)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


def q4_file_to_runtime_np(packed: np.ndarray, group_size: int) -> np.ndarray:
    """Repack file-layout (adjacent-pair) Q4 bytes into the runtime
    group-half-offset layout.  Pure byte permutation — values unchanged."""
    u = np.asarray(packed).view(np.uint8)
    n2 = u.shape[-1]
    lo = u & 0x0F           # even elements (+8)
    hi = (u >> 4) & 0x0F    # odd elements (+8)
    vals = np.stack([lo, hi], axis=-1).reshape(*u.shape[:-1], n2 * 2)
    g = vals.reshape(*u.shape[:-1], (n2 * 2) // group_size, group_size)
    first = g[..., : group_size // 2]
    second = g[..., group_size // 2:]
    # XOR 0x80 bias: int8 view of a runtime byte == unsigned byte - 128
    out = ((first | (second << 4)) ^ 0x80).astype(np.uint8)
    return out.reshape(*u.shape[:-1], n2)


def dequantize(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    """Dequantize a QTensor to a dense float array of its logical shape.

    Parity with reference src/quantization.rs:25-42."""
    if qt.qtype == QuantType.NONE:
        return qt.q.astype(dtype)
    if qt.qtype == QuantType.Q8_0:
        vals = qt.q.astype(jnp.float32)
    elif qt.qtype == QuantType.Q4_0:
        vals = unpack_q4(qt.q, qt.group_size).astype(jnp.float32)
    else:
        raise ValueError(qt.qtype)
    gs = qt.group_size
    shape = vals.shape
    g = vals.reshape(*shape[:-1], shape[-1] // gs, gs)
    out = g * qt.s[..., None]
    return out.reshape(shape).astype(dtype)


# ---------------------------------------------------------------------------
# Weight quantization (numpy, export/offline side)
# ---------------------------------------------------------------------------

def quantize_q80_np(w: np.ndarray, group_size: int):
    """Export-side Q8_0 (reference: utils/quantization.py:42-66).

    scale = absmax/127 with round-half-to-even (torch.round semantics).
    Returns (int8 values flat-grouped, f32 scales, max group error).
    """
    assert w.size % group_size == 0
    w32 = w.astype(np.float32).reshape(-1, group_size)
    wmax = np.abs(w32).max(axis=1)
    scale = wmax / 127.0
    with np.errstate(divide="ignore", invalid="ignore"):
        quant = w32 / scale[:, None]
    quant = np.nan_to_num(quant, nan=0.0, posinf=0.0, neginf=0.0)
    int8val = np.round(quant).astype(np.int8)  # np.round == half-to-even == torch.round
    fp32val = int8val.astype(np.float32) * scale[:, None]
    err = np.abs(fp32val - w32).max() if w32.size else 0.0
    return int8val, scale.astype(np.float32), float(err)


def quantize_q40_np(w: np.ndarray, group_size: int):
    """Export-side Q4_0 (reference: utils/quantization.py:4-39).

    scale = absmax/(-7.5), values +8 offset, packed lo|hi<<4.
    Returns (packed uint8 (groups, gs//2), f32 scales, max group error).
    """
    assert w.size % group_size == 0 and group_size % 2 == 0
    w32 = w.astype(np.float32).reshape(-1, group_size)
    wmax = np.abs(w32).max(axis=1)
    scale = wmax / -7.5
    with np.errstate(divide="ignore", invalid="ignore"):
        quant = w32 / scale[:, None]
    quant = np.nan_to_num(quant, nan=-8.0, posinf=0.0, neginf=0.0)
    uint8val = np.clip(np.round(quant + 8.0), 0, 15).astype(np.uint8)
    fp32val = (uint8val.astype(np.float32) - 8.0) * scale[:, None]
    err = np.abs(fp32val - w32).max() if w32.size else 0.0
    pairs = uint8val.reshape(uint8val.shape[0], group_size // 2, 2)
    packed = (pairs[..., 0] | (pairs[..., 1] << 4)).astype(np.uint8)
    return packed, scale.astype(np.float32), float(err)


def dequantize_np(q: np.ndarray, s: np.ndarray, qtype: QuantType,
                  group_size: int, n: int) -> np.ndarray:
    """Numpy dequantization of flat tensor data (parity with
    reference src/quantization.rs:25-42)."""
    if qtype == QuantType.Q8_0:
        vals = q.astype(np.float32).ravel()[:n]
    elif qtype == QuantType.Q4_0:
        u = q.view(np.uint8).ravel()[: n // 2]
        lo = (u & 0x0F).astype(np.int8) - 8
        hi = ((u >> 4) & 0x0F).astype(np.int8) - 8
        vals = np.stack([lo, hi], axis=-1).reshape(-1).astype(np.float32)
    else:
        raise ValueError(qtype)
    return (vals.reshape(-1, group_size) * s.ravel()[: n // group_size, None]).reshape(n)


# ---------------------------------------------------------------------------
# Building runtime QTensors
# ---------------------------------------------------------------------------

def qtensor_from_float_np(w: np.ndarray, qtype: QuantType, group_size: int,
                          ) -> QTensor:
    """Quantize a dense float (out, in) numpy matrix into a runtime QTensor
    using the EXPORT-side math (what a .lmrs file would contain)."""
    out_f, in_f = w.shape[-2], w.shape[-1]
    lead = w.shape[:-2]
    if qtype == QuantType.NONE:
        return QTensor(jnp.asarray(w, jnp.float32), None, qtype, group_size,
                       out_f, in_f)
    flat = w.reshape(-1, in_f)
    if qtype == QuantType.Q8_0:
        q, s, _ = quantize_q80_np(flat, group_size)
        q = q.reshape(*lead, out_f, in_f)
    else:
        q, s, _ = quantize_q40_np(flat, group_size)
        q = q4_file_to_runtime_np(q.reshape(-1, group_size // 2)
                                  .reshape(flat.shape[0], in_f // 2),
                                  group_size)
        q = q.reshape(*lead, out_f, in_f // 2)
    s = s.reshape(*lead, out_f, in_f // group_size)
    return QTensor(jnp.asarray(q), jnp.asarray(s), qtype, group_size, out_f, in_f)
