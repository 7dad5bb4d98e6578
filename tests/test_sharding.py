"""Tensor-parallel sharding: logits parity vs single-device, dp+tp dry run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lmrs_tpu.config import ModelConfig, ModelType
from lmrs_tpu.io.params import params_from_weights
from lmrs_tpu.io.synthetic import random_weights
from lmrs_tpu.parallel.sharding import (cache_sharding, make_mesh,
                                        tp_param_shardings)
from lmrs_tpu.quant import QuantType
from lmrs_tpu.runtime.engine import Engine, GenerationConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def shardable_cfg(quant):
    return ModelConfig.make(
        ModelType.GEMMA, dim=128, hidden_dim=256, n_layers=2, n_heads=8,
        head_dim=16, n_kv_heads=8, vocab_size=1024, seq_len=128,
        rms_norm_eps=1e-6, rope_theta=10000.0, quant=quant, group_size=16)


@pytest.mark.parametrize("quant", [QuantType.Q8_0, QuantType.Q4_0])
def test_tp_sharded_logits_match_replicated(quant):
    cfg = shardable_cfg(quant)
    weights = random_weights(cfg, seed=11)
    prompt = [3, 99, 511, 17]

    eng_ref = Engine(cfg, params_from_weights(cfg, weights),
                     cache_dtype=jnp.float32, min_attn_bucket=32,
                     prefill_chunk=8)
    ref_logits = np.asarray(eng_ref.prefill(prompt))

    mesh = make_mesh(tp=8, dp=1)
    params = params_from_weights(cfg, weights,
                                 shardings=tp_param_shardings(cfg, mesh))
    eng_tp = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                    prefill_chunk=8,
                    cache_sharding=cache_sharding(cfg, mesh))
    tp_logits = np.asarray(eng_tp.prefill(prompt))

    np.testing.assert_allclose(tp_logits, ref_logits, rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # heavy: excluded from the default fast run
def test_tp_greedy_generation_matches():
    cfg = shardable_cfg(QuantType.Q8_0)
    weights = random_weights(cfg, seed=5)
    gen = GenerationConfig(temperature=0.0, max_new_tokens=12)

    eng_ref = Engine(cfg, params_from_weights(cfg, weights),
                     cache_dtype=jnp.float32, min_attn_bucket=32,
                     prefill_chunk=8)
    want = eng_ref.generate([5, 7, 11], gen)

    mesh = make_mesh(tp=4, dp=2)
    params = params_from_weights(cfg, weights,
                                 shardings=tp_param_shardings(cfg, mesh))
    eng_tp = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                    prefill_chunk=8,
                    cache_sharding=cache_sharding(cfg, mesh))
    got = eng_tp.generate([5, 7, 11], gen)
    assert got == want


def test_fallback_replication_when_not_divisible():
    """tp that doesn't divide the dims must silently replicate, not crash."""
    from lmrs_tpu.io.synthetic import tiny_config

    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0)  # kv_heads=2
    mesh = make_mesh(tp=8, dp=1)
    sh = tp_param_shardings(cfg, mesh)
    weights = random_weights(cfg, seed=2)
    params = params_from_weights(cfg, weights, shardings=sh)
    eng = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                 prefill_chunk=8, cache_sharding=cache_sharding(cfg, mesh))
    out = eng.generate([1, 2, 3], GenerationConfig(temperature=0.0,
                                                   max_new_tokens=4))
    assert len(out) == 4


@pytest.mark.slow  # heavy: excluded from the default fast run
def test_dryrun_multichip_entry():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
