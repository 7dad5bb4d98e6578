"""Rotary position embeddings — plain, Llama-3-rescaled, and Phi-3 longrope.

The reference computes frequencies per token inside the forward loop
(reference: src/transformer.rs:443-495).  On TPU we precompute cos/sin tables
for all positions once on the host (cheap, seq_len × head_dim/2 floats) and
gather rows per step; the rotation itself is fused elementwise math.

Rotation layout parity: the reference rotates pairs (j, j + head_dim/2) — the
"half-split" (NeoX) convention — for every query head, and for key heads only
(reference: src/transformer.rs:483-492).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from lmrs_tpu.config import ModelConfig, ModelType


def rope_tables(cfg: ModelConfig) -> tuple[np.ndarray, np.ndarray]:
    """Precompute (cos, sin) tables of shape (seq_len, head_dim//2), float32.

    Includes the per-family frequency transforms:
      * Llama-3 wavelength-dependent rescale (reference: src/transformer.rs:451-470)
      * Phi-3 longrope short factors + attention scale folded into cos/sin
        (reference: src/transformer.rs:472-478)
    """
    half = cfg.head_dim // 2
    j = np.arange(half, dtype=np.float64)
    freq = 1.0 / np.power(np.float64(cfg.rope_theta), 2.0 * j / cfg.head_dim)
    scaling = 1.0

    if cfg.model_type == ModelType.LLAMA and cfg.rope_scaling is not None:
        rs = cfg.rope_scaling
        wavelen = (2.0 * math.pi) / freq
        low_wl = rs.original_context_len / rs.low_freq_factor
        high_wl = rs.original_context_len / rs.high_freq_factor
        smooth = (rs.original_context_len / wavelen - rs.low_freq_factor) / (
            rs.high_freq_factor - rs.low_freq_factor)
        mid = (1.0 - smooth) * freq / rs.factor + smooth * freq
        freq = np.where(wavelen > low_wl, freq / rs.factor,
                        np.where(wavelen >= high_wl, mid, freq))

    if cfg.model_type == ModelType.PHI and cfg.rope_short_factor is not None:
        sf = np.asarray(cfg.rope_short_factor, dtype=np.float64)
        assert sf.shape == (half,), (
            f"rope_short_factor has {sf.shape[0]} entries, head_dim/2={half}")
        freq = freq / sf
        scaling = cfg.rope_attn_scale

    pos = np.arange(cfg.seq_len, dtype=np.float64)
    angles = pos[:, None] * freq[None, :]
    cos = (np.cos(angles) * scaling).astype(np.float32)
    sin = (np.sin(angles) * scaling).astype(np.float32)
    return cos, sin


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate half-split pairs.

    x: (..., T, H, head_dim); cos/sin: (T, head_dim//2) rows for the absolute
    positions of the T tokens.  Returns same shape/dtype as x.
    """
    half = x.shape[-1] // 2
    x32 = x.astype(jnp.float32)
    x1 = x32[..., :half]
    x2 = x32[..., half:]
    c = cos[..., :, None, :]  # broadcast over heads
    s = sin[..., :, None, :]
    o1 = x1 * c - x2 * s
    o2 = x1 * s + x2 * c
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
