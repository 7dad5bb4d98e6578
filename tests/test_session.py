"""KV-session checkpoint/resume: a resumed conversation continues exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.params import params_from_weights
from lmrs_tpu.io.synthetic import random_weights, tiny_config
from lmrs_tpu.quant import QuantType
from lmrs_tpu.runtime.engine import Engine, GenerationConfig


def test_save_load_session_roundtrip(tmp_path):
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0)
    weights = random_weights(cfg, 6)
    params = params_from_weights(cfg, weights)
    gen = GenerationConfig(temperature=0.0, max_new_tokens=6)

    eng = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                 prefill_chunk=8)
    first = eng.generate([1, 2, 3], gen)
    path = str(tmp_path / "session.npz")
    eng.save_session(path)
    cont_a = eng.generate([9, 10], gen)

    eng2 = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                  prefill_chunk=8)
    eng2.load_session(path)
    # last sampled token hasn't been forwarded yet (same as the reference's
    # loop where `next` is fed on the following iteration)
    assert eng2.pos == len([1, 2, 3]) + len(first) - 1
    cont_b = eng2.generate([9, 10], gen)
    assert cont_a == cont_b


def test_load_session_rejects_wrong_model(tmp_path):
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0)
    params = params_from_weights(cfg, random_weights(cfg, 6))
    eng = Engine(cfg, params, cache_dtype=jnp.float32)
    path = str(tmp_path / "s.npz")
    eng.save_session(path)

    cfg2 = tiny_config(ModelType.GEMMA, QuantType.Q8_0)
    params2 = params_from_weights(cfg2, random_weights(cfg2, 6))
    eng2 = Engine(cfg2, params2, cache_dtype=jnp.float32)
    with pytest.raises(ValueError):
        eng2.load_session(path)


@pytest.mark.slow  # heavy: excluded from the default fast run
def test_engine_warmup_then_generate():
    """warmup() precompiles bucket programs and leaves the engine usable;
    a seq_len override past the reference's 8192 clamp also works."""
    import jax.numpy as jnp

    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.quant import QuantType
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig

    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, seq_len=96)
    params = params_from_weights(cfg, random_weights(cfg, seed=2))
    eng = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                 prefill_chunk=8, decode_chunk=4)
    eng.warmup()
    base = eng.generate([1, 5, 9], GenerationConfig(temperature=0.0,
                                                    max_new_tokens=6))

    eng2 = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                  prefill_chunk=8, decode_chunk=4)
    assert eng2.generate([1, 5, 9], GenerationConfig(
        temperature=0.0, max_new_tokens=6)) == base

    # context-length override beyond the file value: bigger cache + rope
    cfg_long = cfg.replace(seq_len=256)
    params_long = params_from_weights(cfg_long, random_weights(cfg, seed=2))
    eng3 = Engine(cfg_long, params_long, cache_dtype=jnp.float32,
                  min_attn_bucket=32, prefill_chunk=8, decode_chunk=4)
    assert eng3.generate([1, 5, 9], GenerationConfig(
        temperature=0.0, max_new_tokens=6)) == base


def test_load_session_restores_history(tmp_path):
    """The token history rides the session file: a resumed engine's
    speculative prompt-lookup drafts from the SAVED conversation, and an
    engine that served a different conversation first must not keep its
    stale history below the loaded pos."""
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0)
    params = params_from_weights(cfg, random_weights(cfg, 6))
    gen = GenerationConfig(temperature=0.0, max_new_tokens=6)

    eng = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                 prefill_chunk=8)
    eng.generate([1, 2, 3], gen)
    path = str(tmp_path / "session.npz")
    eng.save_session(path)
    saved_hist = eng._hist.copy()

    eng2 = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                  prefill_chunk=8)
    eng2.generate([7, 8, 9, 10, 11, 12], gen)   # a DIFFERENT conversation
    eng2.load_session(path)
    np.testing.assert_array_equal(eng2._hist, saved_hist)
