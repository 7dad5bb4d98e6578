"""Perplexity harness sanity: quantized scoring matches f32 on a tiny model
(the BASELINE.md matched-perplexity criterion, measurable on synthetic
weights until real checkpoints are available)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from perplexity import _compare, score_tokens  # noqa: E402

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.params import params_from_weights
from lmrs_tpu.io.synthetic import random_weights, tiny_config
from lmrs_tpu.quant import QuantType


def test_compare_quant_matched():
    r = _compare("tiny-llama", n_tokens=128, gs=32, seed=0, impl="fast")
    f32 = r["NONE"]["nll_per_token"]
    assert np.isfinite(f32) and f32 > 0
    for name in ("Q8_0", "Q4_0"):
        assert abs(r[name]["nll_per_token"] - f32) < 0.05, (name, r)


def test_score_chunking_invariant():
    """Chunk size must not change the score (teacher-forced prefill is
    position-exact across chunk boundaries)."""
    cfg = tiny_config(ModelType.GEMMA, QuantType.Q8_0, dim=64,
                      hidden_dim=128, n_layers=2, vocab_size=256,
                      group_size=32, seq_len=128)
    params = params_from_weights(cfg, random_weights(cfg, seed=5))
    tokens = np.random.default_rng(2).integers(1, 250, size=100)
    a = score_tokens(cfg, params, tokens, chunk=16)
    b = score_tokens(cfg, params, tokens, chunk=64)
    assert a["tokens_scored"] == b["tokens_scored"] == 99
    assert abs(a["nll_per_token"] - b["nll_per_token"]) < 1e-4, (a, b)


def test_score_near_seq_len_boundary():
    """Scoring a stream whose tail chunk pads past seq_len must not
    clamp-shift the cache write (review finding: n=300=seq_len, chunk=128
    wrote rows 256..384 → clamped to 172..299, corrupting history)."""
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, dim=64,
                      hidden_dim=128, n_layers=2, vocab_size=256,
                      group_size=32, seq_len=300)
    params = params_from_weights(cfg, random_weights(cfg, seed=5))
    tokens = np.random.default_rng(3).integers(1, 250, size=300)
    a = score_tokens(cfg, params, tokens, chunk=128)
    # reference: seq_len with plenty of headroom (no clamping possible)
    cfg_big = cfg.replace(seq_len=512)
    params_big = params_from_weights(cfg_big, random_weights(cfg, seed=5))
    b = score_tokens(cfg_big, params_big, tokens, chunk=128)
    assert a["tokens_scored"] == b["tokens_scored"] == 299
    assert abs(a["nll_per_token"] - b["nll_per_token"]) < 1e-4, (a, b)
