"""Offline perplexity harness: f32 vs Q8_0 vs Q4_0 at matched group size.

BASELINE.md's north star requires "matched Q8_0/Q4_0 perplexity at the same
bit-width and group size".  This tool makes that measurable today (synthetic
weights in this zero-egress environment) and the moment a real checkpoint is
present (point --model at a converted .lmrs and --text at a corpus).

The reference has no perplexity tooling at all (SURVEY.md §4 — its only
quality signal is per-tensor quantization error at export,
reference: utils/quantization.py:27-29); this is new TPU-framework surface.

Usage:
  # real checkpoint + text
  python scripts/perplexity.py --model m.lmrs --tokenizer tok.bin --text corpus.txt

  # token ids from a .npy file
  python scripts/perplexity.py --model m.lmrs --tokens ids.npy

  # quantization-error study on a synthetic model (no files needed):
  python scripts/perplexity.py --compare tiny-llama --n-tokens 512
"""

from __future__ import annotations

import argparse
import math
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def score_tokens(cfg, params, tokens: np.ndarray, chunk: int = 128,
                 cache_dtype=jnp.float32) -> dict:
    """Sum of log p(t_i | t_<i) for i >= 1 via chunked teacher-forced
    prefill with all-position logits.  Returns nll/token and perplexity."""
    from lmrs_tpu.models.transformer import (embed_tokens, forward,
                                             init_kv_cache)

    tokens = np.asarray(tokens, np.int32)
    n = len(tokens)
    assert n >= 2, "need at least 2 tokens to score"
    assert n <= cfg.seq_len, f"{n} tokens > seq_len {cfg.seq_len}"

    @partial(jax.jit, static_argnames=("attn_len",),
             donate_argnames=("cache",))
    def step(params, cache, toks, pos, attn_len):
        x = embed_tokens(params, cfg, toks)
        logits, cache = forward(params, cfg, cache, x, pos, attn_len, "all")
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), cache

    cache = init_kv_cache(cfg, cache_dtype)
    total_nll = 0.0
    count = 0
    pos = 0
    while pos < n - 1:
        t_chunk = min(chunk, n - pos)
        # cap the padded cache write at seq_len: dynamic_update_slice CLAMPS
        # out-of-range starts, which would shift the chunk back over real KV
        # history (same hazard as engine.prefill_embeds)
        width = min(chunk, cfg.seq_len - pos)
        toks = tokens[pos:pos + t_chunk]
        if t_chunk < width:
            toks = np.pad(toks, (0, width - t_chunk))
        attn_len = min(
            max(chunk, 1 << (pos + width - 1).bit_length()), cfg.seq_len)
        logp, cache = step(params, cache, jnp.asarray(toks),
                           jnp.int32(pos), attn_len)
        logp = np.asarray(logp)  # (chunk, V)
        # row i predicts token pos+i+1
        n_score = min(t_chunk, n - 1 - pos)
        targets = tokens[pos + 1: pos + 1 + n_score]
        total_nll -= logp[np.arange(n_score), targets].sum()
        count += n_score
        pos += t_chunk
    nll = total_nll / count
    return {"nll_per_token": float(nll), "perplexity": float(math.exp(nll)),
            "tokens_scored": count}


def _load_model(path: str, impl: str):
    from lmrs_tpu.io.lmrs import read_lmrs
    from lmrs_tpu.io.params import params_from_lmrs

    f = read_lmrs(path)
    f.cfg = f.cfg.replace(matmul_impl=impl)
    return f.cfg, params_from_lmrs(f)


def _compare(preset: str, n_tokens: int, gs: int, seed: int, impl: str,
             cache_dtype=None):
    """Quantization-degradation study: one synthetic f32 model, quantized
    to Q8_0/Q4_0 at the same group size, scored on the same token stream.
    With --cache-dtype the study also isolates KV-cache storage error
    (e.g. int8 vs f32 at fixed weight quant)."""
    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.quant import QuantType

    mt = {"tiny-llama": ModelType.LLAMA, "tiny-gemma": ModelType.GEMMA,
          "tiny-phi": ModelType.PHI}[preset]
    seq = max(256, n_tokens)
    cfg32 = tiny_config(mt, QuantType.NONE, dim=128, hidden_dim=256,
                        n_layers=4, vocab_size=512, group_size=gs,
                        seq_len=seq)
    weights = random_weights(cfg32, seed=seed)
    rng = np.random.default_rng(seed + 1)
    tokens = rng.integers(1, cfg32.vocab_size - 1, size=n_tokens)

    results = {}
    for qt in (QuantType.NONE, QuantType.Q8_0, QuantType.Q4_0):
        cfg = cfg32.replace(quant=qt,
                            matmul_impl="exact" if qt == QuantType.NONE
                            else impl)
        # params_from_weights quantizes the SAME dense weights per cfg.quant
        # at the shared group size — the matched-gs comparison BASELINE.md
        # asks for
        params = params_from_weights(cfg, weights)
        r = score_tokens(cfg, params, tokens,
                         cache_dtype=cache_dtype or jnp.float32)
        results[qt.name] = r
        print(f"{qt.name:5s}: ppl {r['perplexity']:10.4f}  "
              f"nll/tok {r['nll_per_token']:.6f}", flush=True)
    f32 = results["NONE"]["nll_per_token"]
    for name in ("Q8_0", "Q4_0"):
        d = results[name]["nll_per_token"] - f32
        print(f"{name} nll delta vs f32: {d:+.6f} "
              f"({'matched' if abs(d) < 0.05 else 'DEGRADED'})")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help=".lmrs checkpoint")
    ap.add_argument("--tokenizer", help="tokenizer.bin (with --text)")
    ap.add_argument("--text", help="text file to score")
    ap.add_argument("--tokens", help=".npy int token-id file to score")
    ap.add_argument("--compare", metavar="PRESET",
                    help="synthetic study: tiny-llama|tiny-gemma|tiny-phi")
    ap.add_argument("--n-tokens", type=int, default=512)
    ap.add_argument("--gs", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--impl", default="fast", choices=["fast", "exact"])
    ap.add_argument("--cache-dtype", default="float32",
                    choices=["float32", "bfloat16", "int8", "int4"],
                    help="KV cache storage during scoring — measures the "
                         "quantized-cache accuracy cost in nll")
    args = ap.parse_args()

    from lmrs_tpu.runtime.engine import CACHE_DTYPES
    cache_dtype = CACHE_DTYPES[args.cache_dtype]
    if args.compare:
        _compare(args.compare, args.n_tokens, args.gs, args.seed, args.impl,
                 cache_dtype=cache_dtype)
        return

    if not args.model:
        ap.error("--model or --compare required")
    cfg, params = _load_model(args.model, args.impl)
    if args.tokens:
        tokens = np.load(args.tokens)
    elif args.text:
        from lmrs_tpu.tokenizer import Tokenizer

        tok = Tokenizer(args.tokenizer)
        text = open(args.text, encoding="utf-8").read()
        tokens = np.asarray([tok.bos_id] + tok.encode(text), np.int32)
    else:
        ap.error("--tokens or --text required with --model")
    r = score_tokens(cfg, params, tokens[: cfg.seq_len], chunk=args.chunk,
                     cache_dtype=cache_dtype)
    print(f"perplexity {r['perplexity']:.4f}  "
          f"nll/tok {r['nll_per_token']:.6f}  over {r['tokens_scored']} tok")


if __name__ == "__main__":
    main()
