"""Quantization core: JAX runtime quant vs golden, pack/unpack, roundtrips."""

import numpy as np
import jax.numpy as jnp
import pytest

from lmrs_tpu.quant import (
    QuantType,
    dequantize,
    dequantize_np,
    quantize_q4_act,
    quantize_q8_act,
    quantize_q40_np,
    quantize_q80_np,
    qtensor_from_float_np,
    unpack_q4,
)
from golden import g_quantize_q4, g_quantize_q8

RNG = np.random.default_rng(42)


def _acts(shape):
    x = RNG.normal(0, 2.0, size=shape).astype(np.float32)
    # exercise exact halves and zeros
    x.reshape(-1)[::7] = 0.0
    return x


@pytest.mark.parametrize("shape", [(64,), (4, 64), (3, 128)])
def test_q8_act_matches_golden(shape):
    x = _acts(shape)
    qj, sj = quantize_q8_act(jnp.asarray(x), 32)
    qg, sg = g_quantize_q8(x, 32)
    np.testing.assert_array_equal(np.asarray(qj), qg)
    np.testing.assert_allclose(np.asarray(sj), sg, rtol=0, atol=0)


@pytest.mark.parametrize("shape", [(64,), (4, 64), (3, 128)])
def test_q4_act_matches_golden(shape):
    x = _acts(shape)
    qj, sj = quantize_q4_act(jnp.asarray(x), 32)
    qg, sg = g_quantize_q4(x, 32)
    np.testing.assert_array_equal(np.asarray(qj), qg)
    np.testing.assert_allclose(np.asarray(sj), sg, rtol=0, atol=0)


def test_q8_zero_group():
    x = np.zeros((64,), np.float32)
    q, s = quantize_q8_act(jnp.asarray(x), 32)
    assert np.all(np.asarray(q) == 0)
    assert np.all(np.asarray(s) == 0)


def test_round_half_away_from_zero():
    # values engineered so x/scale hits exact .5 boundaries
    x = np.array([2.5, -2.5, 1.5, -1.5, 127.0, -127.0, 0.5, -0.5],
                 np.float32)
    q, s = quantize_q8_act(jnp.asarray(x), 8)
    # scale = 1.0; Rust .round() rounds away from zero
    np.testing.assert_array_equal(
        np.asarray(q), np.array([3, -3, 2, -2, 127, -127, 1, -1], np.int8))


def test_q4_pack_unpack_roundtrip():
    from lmrs_tpu.quant import q4_file_to_runtime_np, unpack_q4_file

    w = RNG.normal(0, 1, size=(8, 64)).astype(np.float32)
    packed, s, err = quantize_q40_np(w, 32)
    packed = packed.reshape(8, 32)
    # file layout unpack
    un_file = np.asarray(unpack_q4_file(jnp.asarray(packed)))
    assert un_file.shape == (8, 64)
    assert un_file.min() >= -8 and un_file.max() <= 7
    # runtime repack + runtime unpack must give the SAME natural-order values
    rt = q4_file_to_runtime_np(packed, 32)
    un_rt = np.asarray(unpack_q4(jnp.asarray(rt), 32))
    np.testing.assert_array_equal(un_rt, un_file)
    # reconstruction error bounded by scale (scale = absmax/7.5 per group)
    deq = dequantize_np(packed, s, QuantType.Q4_0, 32, w.size)
    assert np.abs(deq - w.reshape(-1)).max() <= np.abs(s).max() * 0.5 + 1e-6
    assert err <= np.abs(s).max() * 0.5 + 1e-6


def test_q8_export_roundtrip_error_bound():
    w = RNG.normal(0, 0.1, size=(16, 128)).astype(np.float32)
    q, s, err = quantize_q80_np(w, 64)
    deq = dequantize_np(q, s, QuantType.Q8_0, 64, w.size)
    assert np.abs(deq - w.reshape(-1)).max() <= np.abs(s).max() * 0.5 + 1e-7
    assert err < 0.01


@pytest.mark.parametrize("qtype", [QuantType.NONE, QuantType.Q8_0,
                                   QuantType.Q4_0])
def test_qtensor_dequant_matches_np(qtype):
    w = RNG.normal(0, 0.5, size=(16, 64)).astype(np.float32)
    qt = qtensor_from_float_np(w, qtype, 32)
    deq = np.asarray(dequantize(qt))
    if qtype == QuantType.NONE:
        np.testing.assert_array_equal(deq, w)
    elif qtype == QuantType.Q8_0:
        ref = dequantize_np(np.asarray(qt.q), np.asarray(qt.s), qtype, 32,
                            w.size).reshape(16, 64)
        np.testing.assert_allclose(deq, ref, atol=0)
    else:
        # runtime QTensor uses the group-half layout; compare against the
        # file-layout dequant of the same quantization
        qf, s, _ = quantize_q40_np(w, 32)
        ref = dequantize_np(qf, s, qtype, 32, w.size).reshape(16, 64)
        np.testing.assert_allclose(deq, ref, atol=0)
