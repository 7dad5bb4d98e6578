"""Activation functions (reference: src/transformer.rs:607-624, src/vision.rs:475-551)."""

from __future__ import annotations

import jax.numpy as jnp


def silu(x):
    """SiLU, used by Llama/Phi FFNs (reference: src/transformer.rs:617)."""
    x32 = x.astype(jnp.float32)
    return (x32 * (1.0 / (1.0 + jnp.exp(-x32)))).astype(x.dtype)


def gelu_tanh(x):
    """tanh-approximated GELU, used by Gemma FFNs
    (reference: src/transformer.rs:614)."""
    x32 = x.astype(jnp.float32)
    c = 0.7978845608028654  # sqrt(2/pi)
    inner = c * (x32 + 0.044715 * x32 * x32 * x32)
    return (x32 * 0.5 * (1.0 + jnp.tanh(inner))).astype(x.dtype)


def quick_gelu(x):
    """QuickGELU x*sigmoid(1.702x), used by the CLIP encoder
    (reference: src/vision.rs:520-523)."""
    x32 = x.astype(jnp.float32)
    return (x32 * (1.0 / (1.0 + jnp.exp(-1.702 * x32)))).astype(x.dtype)
