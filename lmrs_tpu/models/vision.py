"""CLIP ViT-L/14-336 vision encoder (Phi-3.5-vision).

TPU re-design of the reference's crop-batched CPU encoder
(reference: src/vision.rs:98-577): one jitted graph batched over image crops,
with the patch-embedding conv expressed as a single matmul over extracted
patches (the reference does the same, src/vision.rs:262-265) and full
(non-causal) attention as batched einsums.

Faithful quirks: only the first n_layers-1 layers run (Phi-3 uses the
penultimate layer's hidden states, src/vision.rs:304); queries are
pre-divided by sqrt(head_dim) right after the bias add (src/vision.rs:341,
357); the CLS token is prepended before position embeddings and stripped at
the end (src/vision.rs:267-290, 566-574).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from lmrs_tpu.ops.activations import quick_gelu
from lmrs_tpu.ops.matmul import qmatmul
from lmrs_tpu.ops.norms import layernorm
from lmrs_tpu.quant import QTensor, QuantType

N_POSITIONS = 577  # 24*24 patches + CLS (reference: src/vision.rs:116,180)


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """Mirrors the 37-byte vision header (reference: export.py:133-142,
    src/vision.rs:11-24)."""

    dim: int = 1024
    hidden_dim: int = 4096
    n_layers: int = 24
    n_heads: int = 16
    head_dim: int = 64
    layernorm_eps: float = 1e-5
    patch_size: int = 14
    image_size: int = 336
    quant: QuantType = QuantType.NONE
    group_size: int = 128
    matmul_impl: str = "exact"

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def n_patches(self) -> int:
        return self.patches_per_side ** 2


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("ln1_w", "ln1_b", "ln2_w", "ln2_b", "wq", "wq_b", "wk",
                 "wk_b", "wv", "wv_b", "wo", "wo_b", "w1", "w1_b", "w2",
                 "w2_b"),
    meta_fields=(),
)
@dataclasses.dataclass
class VisionLayerWeights:
    ln1_w: jax.Array
    ln1_b: jax.Array
    ln2_w: jax.Array
    ln2_b: jax.Array
    wq: QTensor
    wq_b: jax.Array
    wk: QTensor
    wk_b: jax.Array
    wv: QTensor
    wv_b: jax.Array
    wo: QTensor
    wo_b: jax.Array
    w1: QTensor
    w1_b: jax.Array
    w2: QTensor
    w2_b: jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("class_embedding", "patch_embedding", "position_embedding",
                 "layers", "pre_ln_w", "pre_ln_b"),
    meta_fields=(),
)
@dataclasses.dataclass
class VisionParams:
    class_embedding: jax.Array      # (D,)
    patch_embedding: jax.Array      # (D, 3*ps*ps) f32 (never quantized)
    position_embedding: jax.Array   # (577, D) f32
    layers: VisionLayerWeights      # stacked (L, ...)
    pre_ln_w: jax.Array             # (D,)
    pre_ln_b: jax.Array             # (D,)


def _vlayer(cfg: VisionConfig, h: jax.Array, lw: VisionLayerWeights):
    """One CLIP encoder layer over (C, T, D).  Parity with reference
    src/vision.rs:304-563."""
    c, t, d = h.shape
    hs = cfg.head_dim
    x = h
    e = layernorm(h, lw.ln1_w, lw.ln1_b, cfg.layernorm_eps)

    flat = e.reshape(c * t, d)
    q = (qmatmul(flat, lw.wq, cfg.matmul_impl) + lw.wq_b) / jnp.float32(
        math.sqrt(hs))
    k = qmatmul(flat, lw.wk, cfg.matmul_impl) + lw.wk_b
    v = qmatmul(flat, lw.wv, cfg.matmul_impl) + lw.wv_b

    q = q.reshape(c, t, cfg.n_heads, hs)
    k = k.reshape(c, t, cfg.n_heads, hs)
    v = v.reshape(c, t, cfg.n_heads, hs)

    scores = jnp.einsum("cthd,cshd->chts", q, k,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    att = jnp.einsum("chts,cshd->cthd", p, v,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)

    o = qmatmul(att.reshape(c * t, d), lw.wo, cfg.matmul_impl) + lw.wo_b
    h = x + o.reshape(c, t, d)

    x2 = h
    e2 = layernorm(h, lw.ln2_w, lw.ln2_b, cfg.layernorm_eps)
    hid = qmatmul(e2.reshape(c * t, d), lw.w1, cfg.matmul_impl) + lw.w1_b
    hid = quick_gelu(hid)
    mlp = qmatmul(hid, lw.w2, cfg.matmul_impl) + lw.w2_b
    return x2 + mlp.reshape(c, t, d)


def vision_forward(params: VisionParams, cfg: VisionConfig,
                   patches: jax.Array) -> jax.Array:
    """patches (C, n_patches, 3*ps*ps) float32 → features (C, n_patches, D).

    Returns the penultimate layer's hidden states with the CLS token
    stripped (reference: src/vision.rs:244-577).
    """
    c = patches.shape[0]
    # conv-as-matmul patch embedding (reference: src/vision.rs:262-265)
    pe = jnp.einsum("cpk,dk->cpd", patches.astype(jnp.float32),
                    params.patch_embedding.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    cls = jnp.broadcast_to(params.class_embedding, (c, 1, cfg.dim))
    h = jnp.concatenate([cls, pe], axis=1)              # (C, 577, D)
    h = h + params.position_embedding[None, :, :]
    h = layernorm(h, params.pre_ln_w, params.pre_ln_b, cfg.layernorm_eps)

    # penultimate output: run n_layers-1 layers
    used = jax.tree_util.tree_map(lambda a: a[: cfg.n_layers - 1],
                                  params.layers)

    def body(carry, lw):
        return _vlayer(cfg, carry, lw), None

    h, _ = jax.lax.scan(body, h, used)
    return h[:, 1:, :]                                  # strip CLS
