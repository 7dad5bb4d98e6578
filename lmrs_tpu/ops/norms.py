"""Normalization ops (reference: src/functional.rs:48-114).

All statistics in float32 regardless of input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def rmsnorm(x, weight, eps: float, unit_offset: bool = False):
    """RMS norm over the last axis.

    Parity with reference src/functional.rs:48-78:
        ss = 1/sqrt(mean(x^2) + eps);  out = w' * (ss * x)
    where w' = 1 + w when `unit_offset` (Gemma) else w.
    """
    x32 = x.astype(jnp.float32)
    ss = jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps
    inv = 1.0 / jnp.sqrt(ss)
    w = weight.astype(jnp.float32)
    if unit_offset:
        w = 1.0 + w
    return (w * (inv * x32)).astype(x.dtype)


def layernorm(x, weight, bias, eps: float):
    """Layer norm over the last axis (used by the CLIP vision encoder).

    Parity with reference src/functional.rs:80-114 (biased variance).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    diff = x32 - mean
    var = jnp.mean(diff * diff, axis=-1, keepdims=True)
    inv_std = 1.0 / jnp.sqrt(var + eps)
    out = diff * inv_std * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)
