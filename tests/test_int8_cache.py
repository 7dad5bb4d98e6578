"""int8 (quantized) KV cache: per-(position, head) absmax/127 storage.

Covers the quantize helper, the flash kernels' fused-scale path (scales
fold into score columns / softmax weights, never materializing a float
K/V block), end-to-end forward/engine closeness vs a float cache, session
checkpointing, the continuous-batching scheduler, and the mesh engine.

The reference keeps a full-f32 host cache (src/transformer.rs:227-228);
the int8 cache is a TPU capacity/bandwidth feature beyond it: half the
attention HBM traffic of bf16 and double the max context per chip.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.params import params_from_weights
from lmrs_tpu.io.synthetic import random_weights, tiny_config
from lmrs_tpu.kernels.flash_attention import (flash_decode_batched,
                                              flash_decode_stacked)
from lmrs_tpu.models.transformer import quantize_kv_rows
from lmrs_tpu.ops.attention import attention
from lmrs_tpu.quant import QuantType
from lmrs_tpu.runtime.engine import Engine, GenerationConfig

# heavyweight interpret-mode / mesh parity matrix: excluded from the
# default fast run (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow



# ---------------------------------------------------------------- helper

def test_quantize_kv_rows_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 3, 32), dtype=np.float32)) * 5.0
    q, s = quantize_kv_rows(x)
    assert q.dtype == jnp.int8 and q.shape == (4, 3 * 32)
    assert s.shape == (4, 3)
    deq = np.asarray(q, np.float32).reshape(4, 3, 32) * np.asarray(s)[..., None]
    err = np.abs(deq - np.asarray(x))
    # absmax/127 symmetric: error bounded by scale/2 per element
    assert (err <= np.asarray(s)[..., None] / 2 + 1e-6).all()


def test_quantize_kv_rows_zero_row():
    q, s = quantize_kv_rows(jnp.zeros((2, 2, 8)))
    assert not np.asarray(q).any() and not np.asarray(s).any()


# ------------------------------------------------- flash kernels (fused)

def _quantize_cache(k4, v4):
    """(L, S, KH, hd) float -> int8 3D cache + (L, KH, S) scales
    (sequence-LAST scale planes, see models.transformer.KVCache)."""
    L, S, KH, HD = k4.shape

    def q(a):
        vals, scales = jax.vmap(quantize_kv_rows)(a)  # over L
        return vals, scales.transpose(0, 2, 1)        # (L, KH, S)

    kq, ks = q(k4)
    vq, vs = q(v4)
    return kq, vq, ks, vs


@pytest.mark.parametrize("t_q", [1, 64])
@pytest.mark.parametrize("softcap,window", [(None, None), (50.0, 256)])
def test_flash_stacked_quantized_matches_dequantized(t_q, softcap, window):
    """Kernel with int8 K/V + fused scales == XLA attention over the
    explicitly dequantized float cache (exact same numerics target)."""
    L, S, KH, G, HD = 2, 1024, 2, 2, 128
    H = KH * G
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((t_q, H, HD), dtype=np.float32))
    k4 = jnp.asarray(rng.standard_normal((L, S, KH, HD), dtype=np.float32))
    v4 = jnp.asarray(rng.standard_normal((L, S, KH, HD), dtype=np.float32))
    kq, vq, ks, vs = _quantize_cache(k4, v4)
    k_deq = (kq.astype(jnp.float32).reshape(L, S, KH, HD)
             * ks.transpose(0, 2, 1)[..., None]).astype(jnp.bfloat16)
    v_deq = (vq.astype(jnp.float32).reshape(L, S, KH, HD)
             * vs.transpose(0, 2, 1)[..., None]).astype(jnp.bfloat16)
    scale = 1.0 / np.sqrt(HD)

    for layer in [0, 1]:
        for pos in [3, 900, 1024 - t_q]:
            ref = attention(q, k_deq[layer], v_deq[layer], jnp.int32(pos),
                            scale=scale, softcap=softcap, window=window,
                            precision="fast")
            out = flash_decode_stacked(
                q, kq, vq, jnp.int32(layer), jnp.int32(pos), n_kv=KH,
                attn_len=S, scale=scale, softcap=softcap, window=window,
                s_blk=256, interpret=True, k_scale=ks, v_scale=vs)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=0, atol=3e-2)


def test_flash_batched_quantized_matches_per_slot():
    B, L, S, KH, G, HD = 2, 2, 1024, 2, 2, 128
    H = KH * G
    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.standard_normal((B, H, HD), dtype=np.float32))
    k5 = jnp.asarray(rng.standard_normal((B, L, S, KH, HD),
                                         dtype=np.float32))
    v5 = jnp.asarray(rng.standard_normal((B, L, S, KH, HD),
                                         dtype=np.float32))
    kq, vq, ks, vs = jax.vmap(_quantize_cache)(k5, v5)
    pos = jnp.asarray([100, 1000], jnp.int32)
    scale = 1.0 / np.sqrt(HD)
    layer = 1

    out = flash_decode_batched(
        q, kq, vq, jnp.int32(layer), pos, n_kv=KH, attn_len=S, scale=scale,
        s_blk=256, interpret=True, k_scale=ks, v_scale=vs)
    for b in range(B):
        k_deq = (kq[b, layer].astype(jnp.float32).reshape(S, KH, HD)
                 * ks[b, layer].T[..., None]).astype(jnp.bfloat16)
        v_deq = (vq[b, layer].astype(jnp.float32).reshape(S, KH, HD)
                 * vs[b, layer].T[..., None]).astype(jnp.bfloat16)
        ref = attention(q[b][None], k_deq, v_deq, pos[b], scale=scale,
                        precision="fast")
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(ref[0]),
                                   rtol=0, atol=3e-2)


# --------------------------------------------- end-to-end engine parity

FAMILIES = [ModelType.GEMMA, ModelType.LLAMA, ModelType.PHI]


def _build_engines(family, **kw):
    cfg = tiny_config(family, QuantType.Q8_0)
    params = params_from_weights(cfg, random_weights(cfg, seed=3))
    e_f32 = Engine(cfg, params, cache_dtype=jnp.float32,
                   min_attn_bucket=32, prefill_chunk=8, **kw)
    e_i8 = Engine(cfg, params, cache_dtype=jnp.int8,
                  min_attn_bucket=32, prefill_chunk=8, **kw)
    return e_f32, e_i8


@pytest.mark.parametrize("family", FAMILIES)
def test_prefill_logits_close_to_f32_cache(family):
    """Cache quantization error must stay small relative to the logit
    scale (per-head absmax/127 keeps K/V error <0.4%)."""
    e_f32, e_i8 = _build_engines(family)
    prompt = [3, 11, 250, 17, 42, 9]
    ref = np.asarray(e_f32.prefill(prompt))
    got = np.asarray(e_i8.prefill(prompt))
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(got, ref, rtol=0, atol=0.05 * scale)


def test_greedy_generate_int8_runs_and_tracks_f32():
    """Greedy decode with the int8 cache: same API, and the token stream
    stays on the f32-cache stream for a clearly-peaked tiny model (token
    flips can legitimately happen at near-ties; the first tokens of this
    seed/model are not near-tied)."""
    e_f32, e_i8 = _build_engines(ModelType.LLAMA, decode_chunk=4)
    prompt = [1, 7, 42]
    gc = GenerationConfig(temperature=0.0, max_new_tokens=8)
    want = e_f32.generate(prompt, gc)
    got = e_i8.generate(prompt, gc)
    assert len(got) == len(want)
    # quantization can flip near-tie tokens late in the stream; the head
    # of the stream must agree
    assert got[:4] == want[:4], (got, want)


def test_session_roundtrip_int8(tmp_path):
    _, e_i8 = _build_engines(ModelType.LLAMA, decode_chunk=4)
    prompt = [1, 7, 42, 5]
    gc = GenerationConfig(temperature=0.0, max_new_tokens=4)
    first = e_i8.generate(prompt, gc)
    path = str(tmp_path / "sess.npz")
    e_i8.save_session(path)

    _, e2 = _build_engines(ModelType.LLAMA, decode_chunk=4)
    e2.load_session(path)
    assert e2.pos == e_i8.pos
    assert e2.cache.k_scale is not None
    np.testing.assert_array_equal(np.asarray(e2.cache.k),
                                  np.asarray(e_i8.cache.k))
    np.testing.assert_array_equal(np.asarray(e2.cache.k_scale),
                                  np.asarray(e_i8.cache.k_scale))


def test_session_dtype_mismatch_rejected(tmp_path):
    e_f32, e_i8 = _build_engines(ModelType.LLAMA)
    e_i8.prefill([1, 2, 3])
    path = str(tmp_path / "sess.npz")
    e_i8.save_session(path)
    with pytest.raises(ValueError, match="int8"):
        e_f32.load_session(path)


# ----------------------------------------------------- batch scheduler

def test_scheduler_int8_matches_single_stream_int8():
    """Batched decode over an int8 cache must match the single-stream
    int8 engine token-for-token (same quantization at write, same fused
    dequant at read)."""
    from lmrs_tpu.serve.scheduler import BatchScheduler

    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, dim=64,
                      hidden_dim=128, n_layers=2, vocab_size=256,
                      group_size=32, seq_len=128)
    params = params_from_weights(cfg, random_weights(cfg, seed=1))
    prompts = [[1, 5, 9], [2, 4]]
    n_new = 8

    want = []
    for p in prompts:
        eng = Engine(cfg, params, cache_dtype=jnp.int8, min_attn_bucket=32,
                     prefill_chunk=8, decode_chunk=4)
        want.append(eng.generate(
            p, GenerationConfig(temperature=0.0, max_new_tokens=n_new)))

    sched = BatchScheduler(cfg, params, max_batch=2, max_ctx=64,
                           cache_dtype=jnp.int8, prefill_chunk=8,
                           decode_chunk=4, min_attn_bucket=32,
                           temperature=0.0)
    done = {}
    for i, p in enumerate(prompts):
        sched.submit(p, max_new_tokens=n_new,
                     on_done=lambda out, i=i: done.setdefault(i, out))
    sched.run()
    for i in range(len(prompts)):
        assert done[i] == want[i], (i, done[i], want[i])


# ------------------------------------------------------- mesh engine

def test_mesh_engine_int8_tp2():
    """int8 cache under the shard_map tp path: scales shard on the head
    axis alongside the values; logits close to the single-device int8
    engine."""
    from lmrs_tpu.parallel.sharding import make_mesh
    from lmrs_tpu.parallel.tp import build_tp_params_stacked
    from test_tp import _quantized_tensors

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, dim=64,
                      hidden_dim=128, n_layers=2, vocab_size=256,
                      group_size=16, seq_len=64, n_heads=8, n_kv_heads=4,
                      matmul_impl="fast")
    weights = random_weights(cfg, seed=2)
    params = params_from_weights(cfg, weights, stack_layers=True,
                                 fuse_qkv=True)

    ref_eng = Engine(cfg, params, cache_dtype=jnp.int8, min_attn_bucket=32,
                     prefill_chunk=8)
    ref = np.asarray(ref_eng.prefill([5, 9, 33, 2]))

    mesh = make_mesh(tp=2, devices=jax.devices()[:2])
    tp_params, spec = build_tp_params_stacked(
        cfg, _quantized_tensors(cfg, weights), mesh)
    eng = Engine(cfg, tp_params, cache_dtype=jnp.int8, mesh=mesh,
                 param_spec=spec, min_attn_bucket=32, prefill_chunk=8)
    got = np.asarray(eng.prefill([5, 9, 33, 2]))
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(got, ref, rtol=0, atol=0.05 * scale)


@pytest.mark.parametrize("quantized", [False, True])
def test_flash_batched_multi_token(quantized):
    """Batched flash kernel with t_q>1 (the long-context batched
    speculative verify) matches per-slot XLA attention."""
    B, L, S, KH, G, HD, T = 2, 2, 1024, 2, 2, 128, 4
    H = KH * G
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((B, T, H, HD), dtype=np.float32))
    k5 = jnp.asarray(rng.standard_normal((B, L, S, KH, HD),
                                         dtype=np.float32))
    v5 = jnp.asarray(rng.standard_normal((B, L, S, KH, HD),
                                         dtype=np.float32))
    pos = jnp.asarray([100, S - T], jnp.int32)
    scale = 1.0 / np.sqrt(HD)
    layer = 1

    if quantized:
        kq, vq, ks, vs = jax.vmap(_quantize_cache)(k5, v5)
        kb, vb = kq, vq
        kw = dict(k_scale=ks, v_scale=vs)
        k_ref = (kq.astype(jnp.float32).reshape(B, L, S, KH, HD)
                 * ks.transpose(0, 1, 3, 2)[..., None]).astype(jnp.bfloat16)
        v_ref = (vq.astype(jnp.float32).reshape(B, L, S, KH, HD)
                 * vs.transpose(0, 1, 3, 2)[..., None]).astype(jnp.bfloat16)
    else:
        kb = k5.reshape(B, L, S, KH * HD).astype(jnp.bfloat16)
        vb = v5.reshape(B, L, S, KH * HD).astype(jnp.bfloat16)
        kw = {}
        k_ref = k5.astype(jnp.bfloat16)
        v_ref = v5.astype(jnp.bfloat16)

    out = flash_decode_batched(
        q, kb, vb, jnp.int32(layer), pos, n_kv=KH, attn_len=S, scale=scale,
        s_blk=256, interpret=True, **kw)
    assert out.shape == (B, T, H, HD)
    for b in range(B):
        ref = attention(q[b], k_ref[b, layer], v_ref[b, layer], pos[b],
                        scale=scale, precision="fast")
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(ref),
                                   rtol=0, atol=4e-2)


# ------------------------------------------------------------- int4 cache

def test_quantize_kv_rows_q4_roundtrip():
    from lmrs_tpu.models.transformer import (quantize_kv_rows_q4,
                                             unpack_kv_q4)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 3, 32), dtype=np.float32)) * 5.0
    v, s = quantize_kv_rows_q4(x)
    assert v.dtype == jnp.int8 and v.shape == (4, 3 * 16)
    deq = np.asarray(unpack_kv_q4(v, 3, 32)) * np.asarray(s)[..., None]
    err = np.abs(deq - np.asarray(x))
    assert (err <= np.asarray(s)[..., None] / 2 + 1e-6).all()


def test_flash_stacked_packed4_matches_dequantized():
    """Flash kernel in packed4 mode (in-kernel nibble unpack + fused
    scales) == XLA attention over the explicitly dequantized cache."""
    from lmrs_tpu.models.transformer import (quantize_kv_rows_q4,
                                             unpack_kv_q4)

    L, S, KH, G, HD = 2, 1024, 2, 2, 256   # hd % 256 == 0 for packed4
    H = KH * G
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((1, H, HD), dtype=np.float32))
    k4 = jnp.asarray(rng.standard_normal((L, S, KH, HD), dtype=np.float32))
    v4 = jnp.asarray(rng.standard_normal((L, S, KH, HD), dtype=np.float32))

    def qc(a):
        vals, scales = jax.vmap(quantize_kv_rows_q4)(a)
        return vals, scales.transpose(0, 2, 1)     # (L, KH, S)

    kq, ks = qc(k4)
    vq, vs = qc(v4)
    k_deq = (unpack_kv_q4(kq, KH, HD)
             * ks.transpose(0, 2, 1)[..., None]).astype(jnp.bfloat16)
    v_deq = (unpack_kv_q4(vq, KH, HD)
             * vs.transpose(0, 2, 1)[..., None]).astype(jnp.bfloat16)
    scale = 1.0 / np.sqrt(HD)
    for pos in [3, 1000]:
        ref = attention(q, k_deq[1], v_deq[1], jnp.int32(pos),
                        scale=scale, precision="fast")
        out = flash_decode_stacked(
            q, kq, vq, jnp.int32(1), jnp.int32(pos), n_kv=KH, attn_len=S,
            scale=scale, s_blk=256, interpret=True,
            k_scale=ks, v_scale=vs, packed4=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=3e-2)


def test_engine_int4_generate_and_session(tmp_path):
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0)
    params = params_from_weights(cfg, random_weights(cfg, seed=3))
    eng = Engine(cfg, params, cache_dtype="int4", min_attn_bucket=32,
                 prefill_chunk=8, decode_chunk=4)
    assert eng.cache.k.shape[-1] == cfg.n_kv_heads * cfg.cache_head_dim // 2
    gc = GenerationConfig(temperature=0.0, max_new_tokens=8)
    a = eng.generate([1, 7, 42], gc)
    eng.reset()
    assert eng.generate([1, 7, 42], gc) == a   # deterministic

    path = str(tmp_path / "s4.npz")
    eng.save_session(path)
    e2 = Engine(cfg, params, cache_dtype="int4", min_attn_bucket=32,
                prefill_chunk=8, decode_chunk=4)
    e2.load_session(path)
    np.testing.assert_array_equal(np.asarray(e2.cache.k),
                                  np.asarray(eng.cache.k))

    # width mismatch (int8 engine loading an int4 session) is rejected
    e8 = Engine(cfg, params, cache_dtype=jnp.int8, min_attn_bucket=32,
                prefill_chunk=8, decode_chunk=4)
    with pytest.raises(ValueError, match="shape"):
        e8.load_session(path)


def test_int4_logits_close_to_f32():
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0)
    params = params_from_weights(cfg, random_weights(cfg, seed=3))
    e_f32 = Engine(cfg, params, cache_dtype=jnp.float32,
                   min_attn_bucket=32, prefill_chunk=8)
    e_i4 = Engine(cfg, params, cache_dtype="int4",
                  min_attn_bucket=32, prefill_chunk=8)
    prompt = [3, 11, 250, 17, 42, 9]
    ref = np.asarray(e_f32.prefill(prompt))
    got = np.asarray(e_i4.prefill(prompt))
    scale = max(np.abs(ref).max(), 1.0)
    # int4 is coarser than int8; bound the logit error at 12% of scale
    np.testing.assert_allclose(got, ref, rtol=0, atol=0.12 * scale)


def test_scheduler_rejects_int4():
    from lmrs_tpu.serve.scheduler import BatchScheduler

    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0)
    params = params_from_weights(cfg, random_weights(cfg, seed=1))
    with pytest.raises(ValueError, match="int4"):
        BatchScheduler(cfg, params, max_batch=2, cache_dtype="int4")


def test_mesh_engine_int4_tp2_generate_parity():
    """int4 (nibble-packed) cache under the shard_map tp path (VERDICT r3
    next #8): the packed value lanes split on head boundaries
    ((KH/tp)*(hd/2) lanes per shard) and the (L, KH, S) scale planes shard
    with them — greedy tokens must match the single-device int4 engine
    exactly (the per-(pos, head) quantization is shard-local math)."""
    from lmrs_tpu.parallel.sharding import make_mesh
    from lmrs_tpu.parallel.tp import build_tp_params_stacked
    from lmrs_tpu.runtime.engine import GenerationConfig
    from test_tp import _quantized_tensors

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, dim=64,
                      hidden_dim=128, n_layers=2, vocab_size=256,
                      group_size=16, seq_len=64, n_heads=8, n_kv_heads=4,
                      matmul_impl="fast")
    weights = random_weights(cfg, seed=2)
    params = params_from_weights(cfg, weights, stack_layers=True,
                                 fuse_qkv=True)
    gen = GenerationConfig(temperature=0.0, max_new_tokens=10)

    ref_eng = Engine(cfg, params, cache_dtype="int4", min_attn_bucket=32,
                     prefill_chunk=8, decode_chunk=4)
    want = ref_eng.generate([5, 9, 33, 2], gen)

    mesh = make_mesh(tp=2, devices=jax.devices()[:2])
    tp_params, spec = build_tp_params_stacked(
        cfg, _quantized_tensors(cfg, weights), mesh)
    eng = Engine(cfg, tp_params, cache_dtype="int4", mesh=mesh,
                 param_spec=spec, min_attn_bucket=32, prefill_chunk=8,
                 decode_chunk=4)
    got = eng.generate([5, 9, 33, 2], gen)
    assert got == want, (got, want)
    assert eng.cache.k.dtype == jnp.int8  # packed storage
    assert eng.cache.k_scale is not None
