"""Independent numpy implementation of the reference's numerics — the oracle.

Written directly from the reference's scalar semantics (file:line cited per
function), NOT from lmrs_tpu's JAX code, so the two implementations are
independent derivations and parity tests are meaningful.  Everything is
float32 numpy, batch-1, mirroring lm.rs's decode path token-by-token.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np

from lmrs_tpu.config import ModelConfig, ModelType
from lmrs_tpu.quant import QuantType

F32 = np.float32


# ---------------------------------------------------------------------------
# quantization (runtime semantics: src/quantization.rs)
# ---------------------------------------------------------------------------

def _round_half_away(x):
    return np.trunc(x + np.where(x >= 0, 0.5, -0.5))


def g_quantize_q8(x: np.ndarray, gs: int):
    """reference: src/quantization.rs:44-67"""
    n = x.shape[-1]
    g = x.reshape(-1, n // gs, gs).astype(F32)
    wmax = np.abs(g).max(axis=-1)
    scale = (wmax / F32(127.0)).astype(F32)
    q = np.zeros_like(g)
    nz = scale != 0
    q[nz] = _round_half_away(g[nz] / scale[nz][..., None])
    q = q.astype(np.int8).reshape(x.shape)
    return q, scale.reshape(*x.shape[:-1], n // gs)


def g_quantize_q4(x: np.ndarray, gs: int):
    """reference: src/quantization.rs:69-95 — returns UNPACKED values in
    [-8,7] (the packed byte layout doesn't change the dot products)."""
    n = x.shape[-1]
    g = x.reshape(-1, n // gs, gs).astype(F32)
    wmax = np.abs(g).max(axis=-1)
    scale = (wmax / F32(-8.0)).astype(F32)
    qu = np.zeros_like(g)
    nz = scale != 0
    qu[nz] = np.clip(_round_half_away(g[nz] / scale[nz][..., None] + 8.0), 0, 15)
    q = (qu - 8.0).astype(np.int8).reshape(x.shape)
    return q, scale.reshape(*x.shape[:-1], n // gs)


def g_matmul_int(xq: np.ndarray, xs: np.ndarray, wq: np.ndarray,
                 ws: np.ndarray, gs: int) -> np.ndarray:
    """Group-wise integer matmul (reference: src/functional.rs:173-250).

    xq (n,) or (T,n) int8; wq (o,n) int8 (Q4 already unpacked);
    returns f32 (o,) or (T,o)."""
    single = xq.ndim == 1
    xq2 = xq[None] if single else xq
    xs2 = xs[None] if single else xs
    t, n = xq2.shape
    o = wq.shape[0]
    g = n // gs
    ival = np.einsum("tgk,ogk->tog",
                     xq2.reshape(t, g, gs).astype(np.int32),
                     wq.reshape(o, g, gs).astype(np.int32))
    out = (ival.astype(F32) * ws[None].astype(F32)
           * xs2[:, None, :].astype(F32)).sum(axis=-1, dtype=F32)
    return out[0] if single else out


def g_matmul_f32(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """reference: src/functional.rs:142-171 (plain f32)."""
    return (x.astype(F32) @ w.astype(F32).T).astype(F32)


def g_rmsnorm(x, w, eps, unit_offset):
    """reference: src/functional.rs:48-78"""
    x = x.astype(F32)
    ss = F32(1.0) / np.sqrt(np.sum(x * x, dtype=F32) / F32(x.size) + F32(eps))
    wid = (1.0 + w.astype(F32)) if unit_offset else w.astype(F32)
    return (wid * (ss * x)).astype(F32)


def g_layernorm(x, w, b, eps):
    """reference: src/functional.rs:80-114"""
    x = x.astype(F32)
    mean = np.mean(x, dtype=F32)
    var = np.mean((x - mean) ** 2, dtype=F32) + F32(eps)
    return ((x - mean) / np.sqrt(var) * w.astype(F32) + b.astype(F32)).astype(F32)


def g_softmax(x):
    """reference: src/functional.rs:122-140"""
    x = x.astype(F32)
    e = np.exp(x - x.max())
    return (e / e.sum(dtype=F32)).astype(F32)


# ---------------------------------------------------------------------------
# RoPE frequency computation (reference: src/transformer.rs:443-495)
# ---------------------------------------------------------------------------

def g_rope_freqs(cfg: ModelConfig):
    half = cfg.head_dim // 2
    freqs = np.zeros(half, F32)
    scaling = np.ones(half, F32)
    for j in range(half):
        freq = F32(1.0) / F32(cfg.rope_theta) ** F32(2 * j / cfg.head_dim)
        if cfg.model_type == ModelType.LLAMA and cfg.rope_scaling:
            rs = cfg.rope_scaling
            wavelen = F32(2.0 * math.pi) / freq
            low_wl = rs.original_context_len / rs.low_freq_factor
            high_wl = rs.original_context_len / rs.high_freq_factor
            if wavelen > low_wl:
                freq = freq / F32(rs.factor)
            elif high_wl <= wavelen <= low_wl:
                smooth = (rs.original_context_len / wavelen - rs.low_freq_factor) / (
                    rs.high_freq_factor - rs.low_freq_factor)
                freq = F32((1.0 - smooth) * freq / rs.factor + smooth * freq)
        if cfg.model_type == ModelType.PHI and cfg.rope_short_factor:
            freq = F32(freq * (1.0 / cfg.rope_short_factor[j]))
            scaling[j] = F32(cfg.rope_attn_scale)
        freqs[j] = freq
    return freqs, scaling


def g_apply_rope(vec: np.ndarray, pos: int, freqs, scaling, n_rot_heads: int,
                 head_dim: int):
    """Rotate pairs (j, j+hd/2) of the first n_rot_heads heads in a flat
    (heads*head_dim,) vector (reference: src/transformer.rs:480-492)."""
    out = vec.astype(F32).copy()
    half = head_dim // 2
    for h in range(n_rot_heads):
        base = h * head_dim
        for j in range(half):
            val = F32(pos) * freqs[j]
            fcr = F32(np.cos(val) * scaling[j])
            fci = F32(np.sin(val) * scaling[j])
            v0 = out[base + j]
            v1 = out[base + j + half]
            out[base + j] = v0 * fcr - v1 * fci
            out[base + j + half] = v0 * fci + v1 * fcr
    return out


# ---------------------------------------------------------------------------
# Full golden transformer (decode path, batch 1, token-by-token)
# ---------------------------------------------------------------------------

class GoldenTransformer:
    """Mirror of reference Transformer (src/transformer.rs:127-684) on dense
    float weights quantized with the export-side math."""

    def __init__(self, cfg: ModelConfig, weights: Dict[str, np.ndarray]):
        from lmrs_tpu.quant import quantize_q40_np, quantize_q80_np

        self.cfg = cfg
        self.qtype = cfg.quant
        gs = cfg.group_size
        self.w: Dict[str, tuple] = {}
        for name, arr in weights.items():
            base = name.split("@")[0]
            quantized = (self.qtype != QuantType.NONE and base in
                         ("embed", "wq", "wk", "wv", "wo", "w1", "w2", "w3",
                          "lm_head"))
            if not quantized:
                self.w[name] = (arr.astype(F32), None)
            elif self.qtype == QuantType.Q8_0:
                q, s, _ = quantize_q80_np(arr, gs)
                self.w[name] = (q.reshape(arr.shape),
                                s.reshape(arr.shape[0], -1))
            else:
                q, s, _ = quantize_q40_np(arr, gs)
                # unpack for the int dot (same values the reference unpacks)
                lo = (q & 0x0F).astype(np.int8) - 8
                hi = ((q >> 4) & 0x0F).astype(np.int8) - 8
                vals = np.stack([lo, hi], -1).reshape(arr.shape[0], -1)
                self.w[name] = (vals.astype(np.int8),
                                s.reshape(arr.shape[0], -1))

        # eager-dequantized embedding table (reference: src/transformer.rs:241-245)
        if self.qtype == QuantType.NONE:
            self.embed_f32 = self.w["embed"][0]
        else:
            q, s = self.w["embed"]
            g = q.astype(F32).reshape(cfg.vocab_size, cfg.dim // gs, gs)
            self.embed_f32 = (g * s[..., None]).reshape(cfg.vocab_size,
                                                        cfg.dim).astype(F32)

        self.k_cache = np.zeros(
            (cfg.n_layers, cfg.seq_len, cfg.kv_dim), F32)
        self.v_cache = np.zeros_like(self.k_cache)
        self.freqs, self.rope_scaling_vec = g_rope_freqs(cfg)

    # -- quantized matvec dispatch --
    def _matmul(self, x: np.ndarray, name: str) -> np.ndarray:
        wq, ws = self.w[name]
        if self.qtype == QuantType.NONE:
            return g_matmul_f32(x, wq)
        gs = self.cfg.group_size
        if self.qtype == QuantType.Q8_0:
            xq, xs = g_quantize_q8(x, gs)
        else:
            xq, xs = g_quantize_q4(x, gs)
        return g_matmul_int(xq, xs, wq, ws, gs)

    def embed(self, token: int) -> np.ndarray:
        x = self.embed_f32[token].copy()
        if self.cfg.embed_scale_by_sqrt_dim:
            x *= F32(math.sqrt(self.cfg.dim))
        return x

    def forward(self, token: int, pos: int) -> np.ndarray:
        """reference: src/transformer.rs:316-384 (sl=1)."""
        cfg = self.cfg
        x = self.embed(token)
        for l in range(cfg.n_layers):
            x = self._layer(x, l, pos)
        xn = g_rmsnorm(x, self.w["final_norm"][0], cfg.rms_norm_eps,
                       cfg.norm_unit_offset)
        cls = "lm_head" if cfg.model_type == ModelType.PHI else "embed"
        logits = self._matmul(xn, cls)
        if cfg.final_logit_softcap:
            cap = F32(cfg.final_logit_softcap)
            if cfg.parity_gemma_softcap_bug:
                logits[:cfg.dim] = np.tanh(logits[:cfg.dim] / cap) * cap
            else:
                logits = np.tanh(logits / cap) * cap
        return logits.astype(F32)

    def _layer(self, x: np.ndarray, l: int, pos: int) -> np.ndarray:
        """reference: src/transformer.rs:388-657 (sl=1)."""
        cfg = self.cfg
        gemma = cfg.model_type == ModelType.GEMMA
        hd = cfg.head_dim

        xb = g_rmsnorm(x, self.w[f"att_norm@{l}"][0], cfg.rms_norm_eps,
                       cfg.norm_unit_offset)
        q = self._matmul(xb, f"wq@{l}")
        k = self._matmul(xb, f"wk@{l}")
        v = self._matmul(xb, f"wv@{l}")

        q = g_apply_rope(q, pos, self.freqs, self.rope_scaling_vec,
                         cfg.n_heads, hd)
        k = g_apply_rope(k, pos, self.freqs, self.rope_scaling_vec,
                         cfg.n_kv_heads, hd)
        self.k_cache[l, pos] = k
        self.v_cache[l, pos] = v

        att_out = np.zeros(cfg.att_dim, F32)
        for h in range(cfg.n_heads):
            kvh = h // cfg.kv_group
            qh = q[h * hd:(h + 1) * hd]
            scores = np.zeros(pos + 1, F32)
            for t in range(pos + 1):
                kt = self.k_cache[l, t, kvh * hd:(kvh + 1) * hd]
                s = F32(np.dot(qh, kt) / math.sqrt(hd))
                if gemma:
                    s = F32(np.tanh(s / F32(50.0)) * F32(50.0))
                    if pos - t > cfg.sliding_window:
                        s = s + F32(-2.3819763e38)
                scores[t] = s
            p = g_softmax(scores)
            acc = np.zeros(hd, F32)
            for t in range(pos + 1):
                acc += p[t] * self.v_cache[l, t, kvh * hd:(kvh + 1) * hd]
            att_out[h * hd:(h + 1) * hd] = acc

        o = self._matmul(att_out, f"wo@{l}")

        if gemma:
            hnorm = g_rmsnorm(o, self.w[f"post_att_norm@{l}"][0],
                              cfg.rms_norm_eps, True)
            x = x + hnorm
            xb2 = g_rmsnorm(x, self.w[f"pre_ffn_norm@{l}"][0],
                            cfg.rms_norm_eps, True)
        else:
            x = x + o
            xb2 = g_rmsnorm(x, self.w[f"post_att_norm@{l}"][0],
                            cfg.rms_norm_eps, False)

        h1 = self._matmul(xb2, f"w1@{l}")
        h3 = self._matmul(xb2, f"w3@{l}")
        if gemma:
            act = h1 * F32(0.5) * (1.0 + np.tanh(
                F32(0.7978845608028654) * (h1 + F32(0.044715) * h1 ** 3)))
        else:
            act = h1 * (1.0 / (1.0 + np.exp(-h1)))
        ff = self._matmul((act * h3).astype(F32), f"w2@{l}")

        if gemma:
            x = x + g_rmsnorm(ff, self.w[f"post_ffn_norm@{l}"][0],
                              cfg.rms_norm_eps, True)
        else:
            x = x + ff
        return x.astype(F32)

    def generate_greedy(self, prompt_tokens, n_new: int):
        """Feed prompt token-by-token (the reference's text path,
        chat.rs:187-216), then greedy-decode n_new tokens."""
        pos = 0
        out = []
        logits = None
        for tok in prompt_tokens:
            logits = self.forward(tok, pos)
            pos += 1
        tok = int(np.argmax(logits))
        out.append(tok)
        for _ in range(n_new - 1):
            logits = self.forward(tok, pos)
            pos += 1
            tok = int(np.argmax(logits))
            out.append(tok)
        return out
