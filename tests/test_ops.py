"""Op layer vs the golden numpy implementations."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.synthetic import tiny_config
from lmrs_tpu.ops import qmatmul, rmsnorm, layernorm, apply_rope, rope_tables
from lmrs_tpu.ops.activations import gelu_tanh, quick_gelu, silu
from lmrs_tpu.ops.attention import attention
from lmrs_tpu.quant import QuantType, qtensor_from_float_np
from golden import (
    g_apply_rope,
    g_layernorm,
    g_matmul_f32,
    g_matmul_int,
    g_quantize_q4,
    g_quantize_q8,
    g_rmsnorm,
    g_rope_freqs,
    g_softmax,
)

RNG = np.random.default_rng(7)


def test_rmsnorm_matches_golden():
    x = RNG.normal(0, 1, 64).astype(np.float32)
    w = RNG.normal(0, 0.1, 64).astype(np.float32)
    for unit in (False, True):
        got = np.asarray(rmsnorm(jnp.asarray(x), jnp.asarray(w), 1e-6, unit))
        want = g_rmsnorm(x, w, 1e-6, unit)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_layernorm_matches_golden():
    x = RNG.normal(0, 1, 64).astype(np.float32)
    w = RNG.normal(1, 0.1, 64).astype(np.float32)
    b = RNG.normal(0, 0.1, 64).astype(np.float32)
    got = np.asarray(layernorm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1e-5))
    want = g_layernorm(x, w, b, 1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_activations():
    x = np.linspace(-6, 6, 101).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(silu(jnp.asarray(x))), x / (1 + np.exp(-x)),
        rtol=1e-6, atol=1e-6)
    want_gelu = x * 0.5 * (1 + np.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))
    np.testing.assert_allclose(
        np.asarray(gelu_tanh(jnp.asarray(x))), want_gelu, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(quick_gelu(jnp.asarray(x))), x / (1 + np.exp(-1.702 * x)),
        rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("qtype", [QuantType.NONE, QuantType.Q8_0,
                                   QuantType.Q4_0])
@pytest.mark.parametrize("batch", [1, 5])
def test_qmatmul_matches_golden(qtype, batch):
    n, o, gs = 64, 48, 32
    x = RNG.normal(0, 1, (batch, n)).astype(np.float32)
    w = RNG.normal(0, 0.1, (o, n)).astype(np.float32)
    qt = qtensor_from_float_np(w, qtype, gs)
    got = np.asarray(qmatmul(jnp.asarray(x), qt))

    if qtype == QuantType.NONE:
        want = g_matmul_f32(x, w)
    else:
        if qtype == QuantType.Q8_0:
            xq, xs = g_quantize_q8(x, gs)
            wq, ws = np.asarray(qt.q), np.asarray(qt.s)
        else:
            xq, xs = g_quantize_q4(x, gs)
            from lmrs_tpu.quant import unpack_q4
            wq, ws = np.asarray(unpack_q4(qt.q, gs)), np.asarray(qt.s)
        want = g_matmul_int(xq, xs, wq, ws, gs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("family", [ModelType.GEMMA, ModelType.LLAMA,
                                    ModelType.PHI])
def test_rope_matches_golden(family):
    cfg = tiny_config(family, QuantType.NONE)
    cos, sin = rope_tables(cfg)
    freqs, scal = g_rope_freqs(cfg)
    hd, H = cfg.head_dim, cfg.n_heads
    x = RNG.normal(0, 1, (1, H, hd)).astype(np.float32)
    for pos in [0, 1, 17, 100]:
        got = np.asarray(apply_rope(
            jnp.asarray(x), jnp.asarray(cos[pos:pos + 1]),
            jnp.asarray(sin[pos:pos + 1])))[0]
        want = g_apply_rope(x.reshape(-1), pos, freqs, scal, H, hd)
        np.testing.assert_allclose(got.reshape(-1), want, rtol=1e-4,
                                   atol=1e-5)


def test_attention_decode_matches_golden_loop():
    """Single-query attention vs an explicit per-head loop."""
    S, KH, G, hd = 32, 2, 3, 16
    H = KH * G
    pos = 19
    k = RNG.normal(0, 1, (S, KH, hd)).astype(np.float32)
    v = RNG.normal(0, 1, (S, KH, hd)).astype(np.float32)
    q = RNG.normal(0, 1, (1, H, hd)).astype(np.float32)
    scale = 1.0 / math.sqrt(hd)

    got = np.asarray(attention(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), jnp.int32(pos), scale=scale))

    want = np.zeros((H, hd), np.float32)
    for h in range(H):
        kvh = h // G
        scores = np.array([np.dot(q[0, h], k[t, kvh]) * scale
                           for t in range(pos + 1)], np.float32)
        p = g_softmax(scores)
        want[h] = sum(p[t] * v[t, kvh] for t in range(pos + 1))
    np.testing.assert_allclose(got[0], want, rtol=1e-5, atol=1e-5)


def test_attention_softcap_and_window():
    S, KH, hd = 64, 1, 8
    pos = 40
    window = 16
    k = RNG.normal(0, 1, (S, KH, hd)).astype(np.float32)
    v = RNG.normal(0, 1, (S, KH, hd)).astype(np.float32)
    q = RNG.normal(0, 1, (1, KH, hd)).astype(np.float32)
    scale = 1.0 / math.sqrt(hd)
    got = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               jnp.int32(pos), scale=scale, softcap=50.0,
                               window=window))[0, 0]
    scores = np.array([np.tanh(np.dot(q[0, 0], k[t, 0]) * scale / 50) * 50
                       + (0.0 if pos - t <= window else -2.3819763e38)
                       for t in range(pos + 1)], np.float32)
    p = g_softmax(scores)
    want = sum(p[t] * v[t, 0] for t in range(pos + 1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # masked-out positions contribute nothing
    assert p[: pos - window].max() == 0.0
