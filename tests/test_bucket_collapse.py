"""Flash bucket collapse: one max-context program, token-exact decode.

When the config is flash-eligible, Engine._attn_bucket / BatchScheduler.
_bucket collapse every rung past LMRS_FLASH_MIN_BUCKET onto seq_len: the
kernel's live-block clamp keeps attention reads O(pos), so the extra pow-2
rungs only bought compile time (minutes each through the remote-compile
tunnel) and mid-conversation bucket-crossing stalls.  These tests prove the
collapsed single-program path is token-exact vs the pure-XLA bucket ladder
across former bucket boundaries.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.params import params_from_weights
from lmrs_tpu.io.synthetic import random_weights, tiny_config
from lmrs_tpu.quant import QuantType
from lmrs_tpu.runtime.engine import Engine, GenerationConfig

# heavyweight interpret-mode / mesh parity matrix: excluded from the
# default fast run (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow



def _mk_model():
    # head_dim 128 (lane-aligned) + fast impl => flash-eligible
    cfg = tiny_config(ModelType.GEMMA, QuantType.Q8_0, dim=128,
                      hidden_dim=256, n_layers=2, n_heads=2, n_kv_heads=2,
                      head_dim=128, vocab_size=256, group_size=32,
                      seq_len=1024, matmul_impl="fast")
    params = params_from_weights(cfg, random_weights(cfg, seed=11),
                                 stack_layers=True, fuse_qkv=True)
    return cfg, params


def _fresh_compile_caches():
    """Both engines share _compiled_fns(cfg) — drop it so the second run
    can't reuse the first's jit specializations for the same attn_len."""
    from lmrs_tpu.models.transformer import (_scan_exact_body,
                                             _scan_fast_body)
    from lmrs_tpu.runtime.engine import _compiled_fns

    _compiled_fns.cache_clear()
    _scan_fast_body.cache_clear()
    _scan_exact_body.cache_clear()


def test_bucket_collapse_token_parity(monkeypatch):
    cfg, params = _mk_model()
    prompt = list(np.random.default_rng(0).integers(3, 250, size=40))
    gen = GenerationConfig(temperature=0.0, max_new_tokens=48)

    # pure-XLA bucket ladder (threshold unreachable)
    monkeypatch.setenv("LMRS_FLASH_MIN_BUCKET", str(1 << 30))
    _fresh_compile_caches()
    eng = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=64,
                 prefill_chunk=16, decode_chunk=4)
    assert eng._attn_bucket(70) == 128          # ladder intact
    ref = eng.generate(prompt, gen)

    # collapsed flash path: every rung >= 128 becomes one seq_len program
    monkeypatch.setenv("LMRS_FLASH_MIN_BUCKET", "128")
    _fresh_compile_caches()
    eng2 = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=64,
                  prefill_chunk=16, decode_chunk=4)
    assert eng2._attn_bucket(70) == cfg.seq_len
    assert eng2._attn_bucket(500) == cfg.seq_len
    out = eng2.generate(prompt, gen)
    _fresh_compile_caches()

    assert out == ref


def test_ragged_seq_len_keeps_xla_path(monkeypatch):
    """A user --seq-len that isn't a 512 multiple must not collapse onto a
    flash program (the kernel's block plan asserts attn_len % 512 == 0) —
    generation must run, on the XLA path, without tripping the assert."""
    monkeypatch.setenv("LMRS_FLASH_MIN_BUCKET", "512")
    from lmrs_tpu.models.transformer import _flash_eligible

    cfg, params = _mk_model()
    cfg = cfg.replace(seq_len=576 + 64)  # 640: % 512 != 0
    assert not _flash_eligible(cfg, 1, cfg.seq_len)
    eng = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=64,
                 prefill_chunk=8, decode_chunk=4)
    # the top rung may legitimately clamp to the ragged seq_len — what
    # matters is that it runs the XLA path (no flash block-plan assert)
    out = eng.generate([3, 1, 4], GenerationConfig(temperature=0.0,
                                                   max_new_tokens=8))
    assert len(out) == 8


def test_large_prefill_chunk_disables_collapse(monkeypatch):
    """prefill_chunk > the kernel's 256-row limit would fall back to the
    XLA einsum over the whole collapsed bucket — the collapse must not
    fire for such engines."""
    monkeypatch.setenv("LMRS_FLASH_MIN_BUCKET", "512")
    cfg, params = _mk_model()
    cfg = cfg.replace(seq_len=2048)
    big = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=64,
                 prefill_chunk=512, decode_chunk=4)
    small = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=64,
                   prefill_chunk=128, decode_chunk=4)
    assert big._attn_bucket(600) == 1024        # no collapse: plain pow-2
    assert small._attn_bucket(600) == 2048      # collapsed onto seq_len


def test_int4_cache_bucket_collapse_by_geometry(monkeypatch):
    """int4 caches collapse buckets only where the flash kernel has a
    lane-aligned packing: hd-128 with EVEN kv heads now collapses (head-
    pair packing, round 4); an ODD kv-head count at hd 128 has no aligned
    packing, so its ladder must stay intact — collapsing would run dense
    XLA attention over the full seq_len every step."""
    monkeypatch.setenv("LMRS_FLASH_MIN_BUCKET", "128")
    cfg, params = _mk_model()   # cache_head_dim = 128, n_kv_heads = 2
    _fresh_compile_caches()
    eng4 = Engine(cfg, params, cache_dtype="int4", min_attn_bucket=64,
                  prefill_chunk=16, decode_chunk=4)
    assert eng4._attn_bucket(70) == cfg.seq_len   # pair packing: collapse
    # odd kv-head count: half packing, XLA path only, ladder intact
    cfg1 = tiny_config(ModelType.GEMMA, QuantType.Q8_0, dim=128,
                       hidden_dim=256, n_layers=2, n_heads=1, n_kv_heads=1,
                       head_dim=128, vocab_size=256, group_size=32,
                       seq_len=1024, matmul_impl="fast")
    params1 = params_from_weights(cfg1, random_weights(cfg1, seed=11),
                                  stack_layers=True, fuse_qkv=True)
    _fresh_compile_caches()
    eng1 = Engine(cfg1, params1, cache_dtype="int4", min_attn_bucket=64,
                  prefill_chunk=16, decode_chunk=4)
    assert eng1._attn_bucket(70) == 128          # ladder intact
    assert eng1._attn_bucket(200) == 256
    # the int8 cache (no lane constraint) still collapses
    _fresh_compile_caches()
    eng8 = Engine(cfg1, params1, cache_dtype=jnp.int8, min_attn_bucket=64,
                  prefill_chunk=16, decode_chunk=4)
    assert eng8._attn_bucket(200) == cfg1.seq_len
