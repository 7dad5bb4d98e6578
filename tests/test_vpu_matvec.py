"""K-major quantized kernels (kernels/vpu_matvec.py) vs the
dequantize-then-matmul reference, plus the layout round-trip, the K-major
embedding gather, and end-to-end engine parity.

The K-major layout is the round-5 single-stream decode path: T=1 runs a
VPU matvec (no MXU), 2<=T<=8 the transposed x-expansion kernels,
8<T<=512 the s@E prefill kernels, T>512 a dense fallback — all from ONE
weight layout so decode and prefill share HBM-resident params."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lmrs_tpu.kernels.vpu_matvec import (kmajor_o_tile, kmajor_params,
                                         kmajor_to_dense, qmatmul_kmajor,
                                         to_kmajor)
from lmrs_tpu.quant import QuantType, dequantize, qtensor_from_float_np

RNG = np.random.default_rng(11)


def _mk(o, n, qtype, gs=128, layers=0):
    """A (stacked) QTensor plus its dequantized float reference."""
    if layers:
        w = RNG.normal(0, 0.1, (layers, o, n)).astype(np.float32)
        qts = [qtensor_from_float_np(w[i], qtype, gs) for i in range(layers)]
        q = jnp.stack([qt.q for qt in qts])
        s = jnp.stack([qt.s for qt in qts])
        from lmrs_tpu.quant import QTensor
        qt = QTensor(q, s, qtype, gs, o, n)
        dense = np.stack([np.asarray(dequantize(x)) for x in qts])
    else:
        qt = qtensor_from_float_np(RNG.normal(0, 0.1, (o, n))
                                   .astype(np.float32), qtype, gs)
        dense = np.asarray(dequantize(qt))[None]
    return qt, dense


@pytest.mark.parametrize("qtype", [QuantType.Q8_0, QuantType.Q4_0])
@pytest.mark.parametrize("t", [1, 3, 8, 17, 200])
def test_kmajor_matches_dequant(qtype, t):
    o, n, gs = 512, 768, 128
    qt, dense = _mk(o, n, qtype, gs)
    km = to_kmajor(qt)
    assert km.kmajor and km.q.shape[0] == 1
    x = RNG.normal(0, 1, (t, n)).astype(np.float32)
    got = np.asarray(qmatmul_kmajor(jnp.asarray(x), km, 0, interpret=True))
    want = x @ dense[0].T
    # T=1 VPU path and 8<T<=512 s@E paths hold weights at (near-)full
    # precision; 2<=T<=8 int8 path adds activation-quant error
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=0.01 * np.sqrt(n))


@pytest.mark.parametrize("qtype", [QuantType.Q8_0, QuantType.Q4_0])
def test_kmajor_stacked_layer_select(qtype):
    o, n, gs, L = 384, 512, 64, 3
    qt, dense = _mk(o, n, qtype, gs, layers=L)
    km = to_kmajor(qt)
    assert km.q.shape[0] == L
    x = RNG.normal(0, 1, (1, n)).astype(np.float32)
    for l in range(L):
        got = np.asarray(qmatmul_kmajor(jnp.asarray(x), km, l,
                                        interpret=True))
        want = x @ dense[l].T
        np.testing.assert_allclose(got, want, rtol=3e-2,
                                   atol=0.01 * np.sqrt(n))
        # and it selected THIS layer, not a neighbour
        other = x @ dense[(l + 1) % L].T
        assert np.abs(got - other).max() > 0.1


@pytest.mark.parametrize("qtype", [QuantType.Q8_0, QuantType.Q4_0])
def test_kmajor_roundtrip(qtype):
    o, n, gs, L = 256, 512, 128, 2
    qt, dense = _mk(o, n, qtype, gs, layers=L)
    km = to_kmajor(qt)
    back = np.asarray(kmajor_to_dense(km))
    np.testing.assert_allclose(back, dense, rtol=1e-6, atol=1e-6)


def test_kmajor_t1_q8_matches_f32_tightly():
    """The T=1 Q8 VPU path is full f32 math — it should agree with the
    f32 dequant product to accumulation-order noise, far tighter than the
    bf16 MXU kernels."""
    o, n, gs = 512, 1024, 128
    qt, dense = _mk(o, n, QuantType.Q8_0, gs)
    km = to_kmajor(qt)
    x = RNG.normal(0, 1, (1, n)).astype(np.float32)
    got = np.asarray(qmatmul_kmajor(jnp.asarray(x), km, 0, interpret=True))
    want = x @ dense[0].T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_kmajor_large_t_dense_fallback():
    o, n, gs = 256, 512, 128
    qt, dense = _mk(o, n, QuantType.Q4_0, gs)
    km = to_kmajor(qt)
    x = RNG.normal(0, 1, (600, n)).astype(np.float32)
    got = np.asarray(qmatmul_kmajor(jnp.asarray(x), km, 0, interpret=True))
    want = x @ dense[0].T
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=0.01 * np.sqrt(n))


def test_kmajor_o_tile_divides():
    for o in (256, 3584, 4096, 14336, 28672, 256000):
        ot = kmajor_o_tile(o)
        assert o % ot == 0 and ot >= 128


def test_kmajor_o_shape_mosaic_legal():
    """Every tile is Mosaic-legal for a (.., o_t) output block: a multiple
    of 128 or the whole O.  O with no 128-aligned divisor (Phi's vocab
    32064) pads to the next tile multiple."""
    from lmrs_tpu.kernels.vpu_matvec import kmajor_o_shape

    for o in (64, 256, 3072, 3584, 9216, 32064, 128256, 256000):
        ot, op = kmajor_o_shape(o)
        assert ot % 128 == 0 or ot == op == o, (o, ot, op)
        assert op % ot == 0 and op >= o and op - o < ot, (o, ot, op)
    assert kmajor_o_shape(32064) == (512, 32256)       # phi vocab
    assert kmajor_o_shape(128256) == (384, 128256)     # llama vocab: exact


@pytest.mark.parametrize("qtype", [QuantType.Q8_0, QuantType.Q4_0])
@pytest.mark.parametrize("t", [1, 3, 17])
def test_kmajor_padded_o_matches_dequant(qtype, t):
    """O=672 has no 128-aligned divisor <= 512: the layout pads to
    2x512 dead rows and the dispatch slices them off — numerics must
    match the dense reference exactly as in the aligned case."""
    from lmrs_tpu.kernels.vpu_matvec import kmajor_o_shape

    o, n, gs = 672, 512, 64
    assert kmajor_o_shape(o) == (512, 1024)
    qt, dense = _mk(o, n, qtype, gs)
    km = to_kmajor(qt)
    assert km.q.shape[1] * km.q.shape[3] == 1024 and km.out_features == o
    back = np.asarray(kmajor_to_dense(km))
    np.testing.assert_allclose(back, dense, rtol=1e-6, atol=1e-6)
    x = RNG.normal(0, 1, (t, n)).astype(np.float32)
    got = np.asarray(qmatmul_kmajor(jnp.asarray(x), km, 0, interpret=True))
    assert got.shape == (t, o)
    want = x @ dense[0].T
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=0.01 * np.sqrt(n))


@pytest.mark.parametrize("qtype", [QuantType.Q8_0, QuantType.Q4_0])
def test_kmajor_embed_gather(qtype):
    """models.transformer.embed_tokens on a K-major table returns the same
    embedding rows as the row-major table."""
    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.models.transformer import embed_tokens

    cfg = tiny_config(ModelType.GEMMA, qtype, dim=128, group_size=64,
                      hidden_dim=256, vocab_size=512)
    params = params_from_weights(cfg, random_weights(cfg, 0),
                                 stack_layers=True, fuse_qkv=True)
    ids = jnp.asarray([0, 1, 7, 130, 511], jnp.int32)
    want = np.asarray(embed_tokens(params, cfg, ids))
    km = kmajor_params(params, donate=False)
    got = np.asarray(embed_tokens(km, cfg, ids))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_precompile_shapes_match_kmajor_params():
    """runtime.precompile.params_shapes(kmajor=True) mirrors the actual
    kmajor_params layout — shape/dtype tree equality (AOT programs must
    bind the runtime params)."""
    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.runtime.precompile import params_shapes

    cfg = tiny_config(ModelType.GEMMA, QuantType.Q4_0, dim=256,
                      group_size=64, hidden_dim=512, vocab_size=512)
    params = kmajor_params(
        params_from_weights(cfg, random_weights(cfg, 0), stack_layers=True,
                            fuse_qkv=True),
        donate=False)
    sh = params_shapes(cfg, kmajor=True)
    real = jax.tree_util.tree_map(
        lambda a: (a.shape, jnp.asarray(a).dtype), params)
    spec = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), sh)
    assert jax.tree_util.tree_structure(real) == \
        jax.tree_util.tree_structure(spec)
    for r, s in zip(jax.tree_util.tree_leaves(real),
                    jax.tree_util.tree_leaves(spec)):
        assert r == s, (r, s)


@pytest.mark.parametrize("qtype", [QuantType.Q8_0, QuantType.Q4_0])
def test_kmajor_engine_end_to_end(qtype):
    """An Engine running on K-major params generates the same greedy tokens
    as the row-major fast path on a well-separated tiny model, and is
    deterministic across reset()."""
    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig

    cfg = tiny_config(ModelType.LLAMA, qtype, dim=128, group_size=64,
                      hidden_dim=256, vocab_size=512).replace(
                          matmul_impl="fast")
    weights = random_weights(cfg, 0)
    gen = GenerationConfig(temperature=0.0, max_new_tokens=6)

    params = params_from_weights(cfg, weights, stack_layers=True,
                                 fuse_qkv=True)
    eng_rm = Engine(cfg, params, min_attn_bucket=32, prefill_chunk=8)
    want = eng_rm.generate([1, 5, 9], gen)

    eng_km = Engine(cfg, kmajor_params(params, donate=False),
                    min_attn_bucket=32, prefill_chunk=8)
    got = eng_km.generate([1, 5, 9], gen)
    assert got == want, (got, want)
    eng_km.reset()
    assert eng_km.generate([1, 5, 9], gen) == got


@pytest.mark.parametrize("qtype", [QuantType.Q8_0, QuantType.Q4_0])
@pytest.mark.parametrize("t", [1, 5])
def test_qmatmul_xla_impl_matches_dequant(qtype, t):
    """impl="xla" (the no-Pallas serving fallback) matches the dense
    reference on K-major AND row-major stacked layouts."""
    from lmrs_tpu.ops.matmul import qmatmul

    o, n, gs, L = 384, 512, 64, 3
    qt, dense = _mk(o, n, qtype, gs, layers=L)
    km = to_kmajor(qt)
    x = RNG.normal(0, 1, (t, n)).astype(np.float32)
    for l in range(L):
        want = x @ dense[l].T
        got_km = np.asarray(qmatmul(jnp.asarray(x), km, "xla", layer_idx=l))
        np.testing.assert_allclose(got_km, want, rtol=3e-2,
                                   atol=0.02 * np.sqrt(n))
        got_rm = np.asarray(qmatmul(jnp.asarray(x), qt, "xla", layer_idx=l))
        np.testing.assert_allclose(got_rm, want, rtol=3e-2,
                                   atol=0.02 * np.sqrt(n))


def test_engine_xla_fallback_serves_and_switches():
    """Engine.fallback_until routes steps through the pure-XLA programs
    while the event is unset (serve-before-warmup), matches a from-scratch
    impl="xla" engine token-for-token, and switches to the fast kernels
    mid-conversation when the event fires without corrupting the stream."""
    import threading

    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig

    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, dim=128,
                      group_size=64, hidden_dim=256, vocab_size=512
                      ).replace(matmul_impl="fast")
    weights = random_weights(cfg, 0)
    params = kmajor_params(
        params_from_weights(cfg, weights, stack_layers=True, fuse_qkv=True),
        donate=False)
    gen = GenerationConfig(temperature=0.0, max_new_tokens=6)

    # ground truth: an engine whose cfg is natively impl="xla"
    eng_xla = Engine(cfg.replace(matmul_impl="xla"), params,
                     min_attn_bucket=32, prefill_chunk=8)
    want = eng_xla.generate([1, 5, 9], gen)

    ev = threading.Event()
    eng = Engine(cfg, params, min_attn_bucket=32, prefill_chunk=8)
    eng.fallback_until = ev
    assert eng._use_fallback()
    got = eng.generate([1, 5, 9], gen)
    assert got == want, (got, want)

    # flip mid-conversation: continue the SAME stream on fast kernels
    ev.set()
    assert not eng._use_fallback()
    more = eng.generate([got[-1]], gen)
    assert len(more) == 6 and all(0 <= t < 512 for t in more)

    # and the fast-path engine agrees with the fallback greedy stream on
    # this well-separated model
    eng_fast = Engine(cfg, params, min_attn_bucket=32, prefill_chunk=8)
    assert eng_fast.generate([1, 5, 9], gen) == want
