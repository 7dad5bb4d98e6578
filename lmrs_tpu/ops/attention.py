"""GQA attention over an on-device KV cache.

The reference walks the cache with per-head scalar loops
(reference: src/transformer.rs:501-544).  The TPU formulation is one batched
einsum over all heads against a statically-shaped cache prefix, with the
causal structure expressed as masks — no data-dependent shapes, so the whole
step jits.

Supports the Gemma-2 deltas: attention logit softcapping and the additive
sliding-window mask with the reference's exact -2.3819763e38 constant
(reference: src/transformer.rs:518-526).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


_WINDOW_NEG = -2.3819763e38  # reference: src/transformer.rs:525
_MASK_NEG = jnp.finfo(jnp.float32).min


def attention(
    q: jnp.ndarray,          # (T, H, head_dim) float32, RoPE already applied
    k_cache: jnp.ndarray,    # (S, KH, head_dim) — rotated keys
    v_cache: jnp.ndarray,    # (S, KH, head_dim)
    pos,                     # scalar int32: absolute position of query token 0
    *,
    scale: float,
    softcap: Optional[float] = None,
    window: Optional[int] = None,
) -> jnp.ndarray:
    """Causal grouped-query attention; returns (T, H, head_dim) float32.

    Queries at absolute positions pos..pos+T-1 attend to cache slots
    t <= query position.  Gemma's sliding window masks t with
    q_pos - t > window additively (the reference applies this window in every
    layer and computes it from the query's position; src/transformer.rs:524).
    """
    t_q, n_heads, head_dim = q.shape
    s_len, n_kv, _ = k_cache.shape
    kv_group = n_heads // n_kv

    qg = q.astype(jnp.float32).reshape(t_q, n_kv, kv_group, head_dim)
    k32 = k_cache.astype(jnp.float32)
    v32 = v_cache.astype(jnp.float32)

    # (T, KH, G, S).  HIGHEST keeps true-f32 MXU passes — the TPU default
    # would round f32 operands to bf16, which breaks greedy parity.
    scores = jnp.einsum("tkgd,skd->tkgs", qg, k32,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) * scale

    if softcap is not None:
        scores = jnp.tanh(scores / softcap) * softcap

    t_idx = jnp.arange(s_len, dtype=jnp.int32)[None, :]           # (1, S)
    q_pos = pos + jnp.arange(t_q, dtype=jnp.int32)[:, None]        # (T, 1)

    if window is not None:
        win_mask = jnp.where(q_pos - t_idx <= window, 0.0, _WINDOW_NEG)
        scores = scores + win_mask[:, None, None, :]

    causal = t_idx <= q_pos                                        # (T, S)
    scores = jnp.where(causal[:, None, None, :], scores, _MASK_NEG)

    # max-subtracted softmax over the cache axis (reference: src/functional.rs:122-140)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    att = e / jnp.sum(e, axis=-1, keepdims=True)

    out = jnp.einsum("tkgs,skd->tkgd", att, v32,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(t_q, n_heads, head_dim)
