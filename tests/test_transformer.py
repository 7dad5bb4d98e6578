"""End-to-end forward parity: JAX model vs independent numpy golden, for all
three families × all three quantization modes, plus prefill/decode
equivalence and .lmrs file roundtrips."""

import numpy as np
import jax.numpy as jnp
import pytest

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.lmrs import read_lmrs, write_lmrs
from lmrs_tpu.io.params import params_from_lmrs, params_from_weights
from lmrs_tpu.io.synthetic import random_weights, tiny_config
from lmrs_tpu.quant import QuantType
from lmrs_tpu.runtime.engine import Engine, GenerationConfig
from golden import GoldenTransformer

FAMILIES = [ModelType.GEMMA, ModelType.LLAMA, ModelType.PHI]
QTYPES = [QuantType.NONE, QuantType.Q8_0, QuantType.Q4_0]


def _build(family, qtype, seed=0, **cfg_kw):
    cfg = tiny_config(family, qtype, **cfg_kw)
    weights = random_weights(cfg, seed)
    return cfg, weights


@pytest.mark.parametrize("family", FAMILIES)
@pytest.mark.parametrize("qtype", QTYPES)
def test_greedy_decode_matches_golden(family, qtype):
    cfg, weights = _build(family, qtype)
    golden = GoldenTransformer(cfg, weights)
    params = params_from_weights(cfg, weights)
    eng = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                 prefill_chunk=8)

    prompt = [1, 7, 42, 9, 100]
    n_new = 8

    want_tokens = golden.generate_greedy(prompt, n_new)
    got_tokens = eng.generate(prompt, GenerationConfig(temperature=0.0,
                                                       max_new_tokens=n_new))
    assert got_tokens == want_tokens


@pytest.mark.parametrize("family", FAMILIES)
def test_logits_close_to_golden(family):
    """Compare raw logits (not just argmax) for the quantized path."""
    cfg, weights = _build(family, QuantType.Q8_0)
    golden = GoldenTransformer(cfg, weights)
    params = params_from_weights(cfg, weights)
    eng = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                 prefill_chunk=8)

    prompt = [3, 11, 250]
    g_logits = None
    for i, t in enumerate(prompt):
        g_logits = golden.forward(t, i)
    j_logits = np.asarray(eng.prefill(prompt))
    np.testing.assert_allclose(j_logits, g_logits, rtol=2e-4, atol=2e-4)


def test_prefill_equals_tokenwise_decode():
    """Chunked prefill must produce the same cache/logits as one-token steps."""
    cfg, weights = _build(ModelType.LLAMA, QuantType.Q8_0)
    params = params_from_weights(cfg, weights)
    prompt = list(range(1, 12))

    eng_a = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                   prefill_chunk=8)
    logits_a = np.asarray(eng_a.prefill(prompt))

    eng_b = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                   prefill_chunk=8)
    logits_b = None
    eng_b.prefill(prompt[:1])
    for t in prompt[1:]:
        logits_b = np.asarray(eng_b.decode_step(t))
    np.testing.assert_allclose(logits_a, logits_b, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("qtype", QTYPES)
def test_lmrs_roundtrip(tmp_path, qtype):
    """write_lmrs → read_lmrs must reproduce identical parameters/logits."""
    cfg, weights = _build(ModelType.LLAMA, qtype)
    path = str(tmp_path / "model.lmrs")
    write_lmrs(path, cfg, weights)

    f = read_lmrs(path)
    assert f.cfg.dim == cfg.dim
    assert f.cfg.model_type == cfg.model_type
    assert f.cfg.quant == qtype
    assert f.cfg.group_size == cfg.group_size

    params_file = params_from_lmrs(f)
    params_mem = params_from_weights(cfg, weights)

    prompt = [5, 9, 2]
    e1 = Engine(f.cfg, params_file, cache_dtype=jnp.float32,
                min_attn_bucket=32, prefill_chunk=8)
    e2 = Engine(cfg, params_mem, cache_dtype=jnp.float32,
                min_attn_bucket=32, prefill_chunk=8)
    l1 = np.asarray(e1.prefill(prompt))
    l2 = np.asarray(e2.prefill(prompt))
    np.testing.assert_array_equal(l1, l2)


def test_gemma_softcap_bug_parity_flag():
    """The parity flag must reproduce the reference's first-dim-only softcap."""
    cfg, weights = _build(ModelType.GEMMA, QuantType.NONE)
    cfg_bug = cfg.replace(parity_gemma_softcap_bug=True)

    golden_bug = GoldenTransformer(cfg_bug, weights)
    params = params_from_weights(cfg_bug, weights)
    eng = Engine(cfg_bug, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                 prefill_chunk=8)
    want = golden_bug.forward(17, 0)
    got = np.asarray(eng.prefill([17]))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # and the flag must actually change something vs the fixed version
    golden_fixed = GoldenTransformer(cfg, weights)
    fixed = golden_fixed.forward(17, 0)
    assert not np.allclose(fixed, want)


@pytest.mark.parametrize("qtype", [QuantType.Q8_0, QuantType.Q4_0])
def test_unrolled_fused_layout_matches_stacked(qtype):
    """Unrolled layer list + fused [q;k;v]/[gate;up] matmuls must produce
    byte-identical logits to the scanned stacked layout (row concatenation
    is exact for per-row group quantization)."""
    cfg, weights = _build(ModelType.LLAMA, qtype)
    prompt = [4, 8, 15, 16, 23, 42]

    eng_a = Engine(cfg, params_from_weights(cfg, weights),
                   cache_dtype=jnp.float32, min_attn_bucket=32,
                   prefill_chunk=8)
    eng_b = Engine(cfg, params_from_weights(cfg, weights, stack_layers=False,
                                            fuse_qkv=True),
                   cache_dtype=jnp.float32, min_attn_bucket=32,
                   prefill_chunk=8)
    la = np.asarray(eng_a.prefill(prompt))
    lb = np.asarray(eng_b.prefill(prompt))
    np.testing.assert_allclose(la, lb, rtol=1e-6, atol=1e-6)

    gen = GenerationConfig(temperature=0.0, max_new_tokens=10)
    eng_a.reset()
    eng_b.reset()
    assert eng_a.generate(prompt, gen) == eng_b.generate(prompt, gen)


def test_long_generation_crosses_buckets():
    """Generation that crosses attn_len bucket boundaries stays coherent."""
    cfg, weights = _build(ModelType.LLAMA, QuantType.Q8_0)
    golden = GoldenTransformer(cfg, weights)
    params = params_from_weights(cfg, weights)
    eng = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=16,
                 prefill_chunk=8)
    prompt = [2, 4, 6]
    n_new = 40  # crosses 16 → 32 → 64 buckets
    want = golden.generate_greedy(prompt, n_new)
    got = eng.generate(prompt, GenerationConfig(temperature=0.0,
                                                max_new_tokens=n_new))
    assert got == want


def test_padded_cache_head_dim_matches_golden():
    """head_dim=24 (not lane-aligned) pads the runtime KV cache to 128
    (ModelConfig.cache_head_dim) — numerics must be unchanged (Phi-3.5's
    head_dim=96 hits this path at full scale)."""
    cfg = tiny_config(ModelType.PHI, QuantType.Q8_0, head_dim=24,
                      n_heads=4, n_kv_heads=2, dim=96,
                      rope_short_factor=tuple(1.0 + 0.05 * i
                                              for i in range(12)))
    assert cfg.cache_head_dim == 128
    weights = random_weights(cfg, 9)
    golden = GoldenTransformer(cfg, weights)
    params = params_from_weights(cfg, weights)
    eng = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                 prefill_chunk=8)

    prompt = [1, 7, 42]
    want = golden.generate_greedy(prompt, 6)
    got = eng.generate(prompt, GenerationConfig(temperature=0.0,
                                                max_new_tokens=6))
    assert got == want


def test_q4_cache_pack_roundtrip_modes():
    """int4 KV pack/unpack inverts exactly in BOTH packings: group-half
    (hd % 256 == 0) and head-pair (hd 128, even kv heads); odd kv heads
    fall back to half packing."""
    import jax.numpy as jnp

    from lmrs_tpu.models.transformer import (q4_cache_pair_mode,
                                             quantize_kv_rows_q4,
                                             unpack_kv_q4)

    rng = np.random.default_rng(5)
    for kh, hd, want_pair in ((2, 256, False), (2, 128, True),
                              (4, 128, True), (3, 128, False)):
        assert q4_cache_pair_mode(kh, hd) == want_pair, (kh, hd)
        x = jnp.asarray(rng.standard_normal((3, kh, hd)), jnp.float32)
        packed, scales = quantize_kv_rows_q4(x)
        assert packed.shape == (3, kh * hd // 2)
        vals = unpack_kv_q4(packed, kh, hd)      # unscaled ints
        # reference quantization: absmax/7 per (token, head), clip [-8,7]
        amax = np.max(np.abs(np.asarray(x)), axis=-1)
        inv = np.where(amax > 0, 7.0 / amax, 0.0)
        q_ref = np.clip(np.round(np.asarray(x) * inv[..., None]), -8, 7)
        np.testing.assert_array_equal(np.asarray(vals), q_ref)
        np.testing.assert_allclose(np.asarray(scales), amax / 7.0,
                                   rtol=1e-6)
