"""Regression tests for context-window edge cases (round-1 advisor findings).

The failure class: `jax.lax.dynamic_update_slice` CLAMPS out-of-range start
indices, so any cache write dispatched past seq_len silently shifts back
over real KV history instead of erroring.  Every path that writes the cache
must therefore keep pos + written_rows inside the allocated buffer.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.params import params_from_weights
from lmrs_tpu.io.synthetic import random_weights, tiny_config
from lmrs_tpu.quant import QuantType
from lmrs_tpu.runtime.engine import Engine, GenerationConfig
from lmrs_tpu.serve.scheduler import BatchScheduler


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, dim=64,
                      hidden_dim=128, n_layers=2, vocab_size=256,
                      group_size=32, seq_len=64)
    params = params_from_weights(cfg, random_weights(cfg, seed=3))
    return cfg, params


def test_nonstreaming_decode_respects_seq_len(model):
    """Engine.generate with NO stop tokens and NO callback (pure batch mode)
    must not dispatch decode chunks past seq_len: the dispatched-but-
    undrained chunks count against the window."""
    cfg, params = model
    eng = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=16,
                 prefill_chunk=8, decode_chunk=8)
    out = eng.generate([1, 2, 3],
                       GenerationConfig(temperature=0.0, max_new_tokens=500))
    assert eng.pos <= cfg.seq_len
    # 3 prompt + first token + chunks; every emitted token had a cache row
    assert 3 + len(out) <= cfg.seq_len + eng.decode_chunk
    # and the engine state stays consistent: every emitted token except the
    # last (sampled but its cache row not yet written) advanced pos
    assert eng.pos == 3 + len(out) - 1


def test_streaming_decode_respects_seq_len(model):
    cfg, params = model
    eng = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=16,
                 prefill_chunk=8, decode_chunk=8)
    seen = []
    out = eng.generate([1, 2, 3],
                       GenerationConfig(temperature=0.0, max_new_tokens=500),
                       on_token=seen.append)
    assert eng.pos <= cfg.seq_len
    assert out == seen


def test_engine_prefill_tail_pad_near_limit(model):
    """A prompt ending within a pad-chunk of seq_len must not clamp-shift
    the padded cache write (which would corrupt earlier history)."""
    cfg, params = model
    # reference output from a roomy engine
    long_prompt = list(np.random.default_rng(0).integers(1, 250, 61))
    eng_big = Engine(cfg.replace(seq_len=128), params,
                     cache_dtype=jnp.float32, min_attn_bucket=16,
                     prefill_chunk=8, decode_chunk=4)
    want = eng_big.generate(long_prompt, GenerationConfig(
        temperature=0.0, max_new_tokens=1))
    # tight engine with a NON-pow2 seq_len=62: the last chunk starts at
    # pos 56 with 5 real rows; an uncapped pow2 pad of 8 would write rows
    # 56..64 > 62, clamping the start back to 54 and corrupting history
    eng = Engine(cfg.replace(seq_len=62), params, cache_dtype=jnp.float32,
                 min_attn_bucket=16, prefill_chunk=8, decode_chunk=4)
    got = eng.generate(long_prompt, GenerationConfig(
        temperature=0.0, max_new_tokens=1))
    assert got == want


def test_scheduler_prefill_tail_pad_near_limit(model):
    """Same clamp hazard in BatchScheduler._run_prefill with a non-pow2
    max_ctx: prompt of 60 into S=62, last chunk pads past S."""
    cfg, params = model
    prompt = list(np.random.default_rng(1).integers(1, 250, 60))
    eng = Engine(cfg.replace(seq_len=128), params, cache_dtype=jnp.float32,
                 min_attn_bucket=16, prefill_chunk=8, decode_chunk=4)
    want = eng.generate(prompt, GenerationConfig(temperature=0.0,
                                                 max_new_tokens=1))
    sched = BatchScheduler(cfg, params, max_batch=2, max_ctx=62,
                           cache_dtype=jnp.float32, prefill_chunk=8,
                           decode_chunk=4, min_attn_bucket=16,
                           temperature=0.0)
    done = {}
    sched.submit(prompt, max_new_tokens=1,
                 on_done=lambda out: done.setdefault("out", out))
    sched.run()
    assert done["out"] == want


def test_admission_revalidates_context(model):
    """A leased slot's pos grows between submit and admission; the stale
    submit-time bound must be re-checked at admission and the request failed
    cleanly (NOT prefilled past S into clamped cache writes)."""
    cfg, params = model
    sched = BatchScheduler(cfg, params, max_batch=2, max_ctx=32,
                           cache_dtype=jnp.float32, prefill_chunk=8,
                           decode_chunk=4, min_attn_bucket=16,
                           temperature=0.0)
    lease = sched.new_conversation()
    r1 = sched.submit([1, 2, 3], max_new_tokens=20, lease=lease)
    # submitted while slot.pos == 0, so the submit-time check passes; after
    # turn 1 the slot sits at pos=23 and 23 + 10 + 1 > 32
    r2 = sched.submit(list(range(1, 11)), max_new_tokens=4, lease=lease)
    sched.run()
    assert len(r1.out) == 20 and r1.error is None
    assert r2.error is not None and "context overflow" in r2.error
    assert r2.out == []


def test_context_beyond_8192():
    """The reference clamps seq_len to 8192 (its KV cache is host-RAM f32,
    reference: src/transformer.rs:157-160); the TPU build must decode
    straight across that boundary.  Deterministic decode with pos > 8192 on
    a tiny model, prefilling most of the window."""
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, dim=32, hidden_dim=64,
                      n_layers=1, n_heads=2, head_dim=16, n_kv_heads=1,
                      vocab_size=128, group_size=16, seq_len=8448)
    params = params_from_weights(cfg, random_weights(cfg, seed=9))
    rng = np.random.default_rng(4)
    prompt = list(rng.integers(1, 120, 8200))

    outs = []
    for _ in range(2):
        eng = Engine(cfg, params, cache_dtype=jnp.float32,
                     min_attn_bucket=1024, prefill_chunk=512, decode_chunk=8)
        outs.append(eng.generate(prompt, GenerationConfig(
            temperature=0.0, max_new_tokens=16)))
        assert eng.pos > 8192
    assert outs[0] == outs[1]
    assert len(outs[0]) == 16


def test_lmrs_seq_len_cap_configurable(tmp_path):
    """read_lmrs honors max_seq_len instead of the reference's hard 8192."""
    from lmrs_tpu.io.lmrs import read_lmrs, write_lmrs

    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, seq_len=128)
    # header claims a long context; write_lmrs stores it verbatim
    cfg_long = cfg.replace(seq_len=131072)
    path = str(tmp_path / "long.lmrs")
    write_lmrs(path, cfg_long, random_weights(cfg_long, seed=0))
    assert read_lmrs(path).cfg.seq_len == 32768          # default cap
    assert read_lmrs(path, max_seq_len=4096).cfg.seq_len == 4096
    assert read_lmrs(path, max_seq_len=0).cfg.seq_len == 131072  # uncapped


def test_idle_lease_near_limit_keeps_history(model):
    """An idle leased conversation parked within decode_chunk of S must ride
    through other slots' decode chunks as an inactive lane WITHOUT its
    trailing KV rows being clamp-overwritten (slack rows absorb the dummy
    writes)."""
    cfg, params = model
    S = 32
    n_chunk = 4
    sched = BatchScheduler(cfg, params, max_batch=2, max_ctx=S,
                           cache_dtype=jnp.float32, prefill_chunk=8,
                           decode_chunk=n_chunk, min_attn_bucket=16,
                           temperature=0.0)
    lease = sched.new_conversation()
    # park the lease at pos close to S: 3 prompt + 27 tokens = pos 29 > S-4
    r1 = sched.submit([1, 2, 3], max_new_tokens=27, lease=lease)
    sched.run()
    pos_parked = sched.slots[lease.slot_idx].pos
    assert pos_parked > S - n_chunk
    k_before = np.asarray(sched.cache.k)[lease.slot_idx, :, :pos_parked]
    # run an unrelated request on the other slot; the idle lease is an
    # inactive lane in every decode chunk
    sched.submit([9, 8, 7], max_new_tokens=12)
    sched.run()
    k_after = np.asarray(sched.cache.k)[lease.slot_idx, :, :pos_parked]
    np.testing.assert_array_equal(k_before, k_after)
