"""forward_batched with t_q > 1 (the batched speculative-verify step):
per-slot multi-token windows must match the single-stream forward run on
each slot's cache independently."""

import jax.numpy as jnp
import numpy as np
import pytest

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.params import params_from_weights
from lmrs_tpu.io.synthetic import random_weights, tiny_config
from lmrs_tpu.models.transformer import (KVCache, embed_tokens, forward,
                                         forward_batched, init_kv_cache)
from lmrs_tpu.quant import QuantType

# heavyweight interpret-mode / mesh parity matrix: excluded from the
# default fast run (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow



@pytest.mark.parametrize("mt,cache_dtype", [
    (ModelType.LLAMA, jnp.float32),
    (ModelType.GEMMA, jnp.float32),   # softcaps + sliding window
    (ModelType.LLAMA, jnp.int8),
])
def test_batched_multi_matches_single(mt, cache_dtype):
    cfg = tiny_config(mt, QuantType.Q8_0, dim=64, hidden_dim=128,
                      n_layers=2, vocab_size=256, group_size=32,
                      seq_len=64)
    params = params_from_weights(cfg, random_weights(cfg, seed=2),
                                 stack_layers=True, fuse_qkv=True)
    B, T, ATTN = 2, 4, 32
    rng = np.random.default_rng(0)
    prefix = [list(rng.integers(3, 250, size=5)), list(rng.integers(3, 250, size=9))]
    chunk = [list(rng.integers(3, 250, size=T)) for _ in range(B)]

    # single-stream references: prefill the prefix, then the T-chunk with
    # all-position logits
    want_logits, want_caches = [], []
    for b in range(B):
        cache = init_kv_cache(cfg, cache_dtype)
        x = embed_tokens(params, cfg, jnp.asarray(prefix[b], jnp.int32))
        _, cache = forward(params, cfg, cache, x, jnp.int32(0), ATTN, None)
        x = embed_tokens(params, cfg, jnp.asarray(chunk[b], jnp.int32))
        lg, cache = forward(params, cfg, cache, x,
                            jnp.int32(len(prefix[b])), ATTN, "all")
        want_logits.append(np.asarray(lg))
        want_caches.append(cache)

    # batched: same prefixes in per-slot caches, then ONE t_q=T step
    def stack(field):
        vals = [getattr(c, field) for c in want_caches]
        return None if vals[0] is None else jnp.stack(vals)

    # rebuild the batched cache from freshly prefilled (not chunk-written)
    # single caches
    pre_caches = []
    for b in range(B):
        cache = init_kv_cache(cfg, cache_dtype)
        x = embed_tokens(params, cfg, jnp.asarray(prefix[b], jnp.int32))
        _, cache = forward(params, cfg, cache, x, jnp.int32(0), ATTN, None)
        pre_caches.append(cache)
    bcache = KVCache(
        k=jnp.stack([c.k for c in pre_caches]),
        v=jnp.stack([c.v for c in pre_caches]),
        k_scale=(None if pre_caches[0].k_scale is None
                 else jnp.stack([c.k_scale for c in pre_caches])),
        v_scale=(None if pre_caches[0].v_scale is None
                 else jnp.stack([c.v_scale for c in pre_caches])))

    toks = jnp.asarray(np.concatenate(chunk), jnp.int32)    # (B*T,)
    x = embed_tokens(params, cfg, toks)
    pos = jnp.asarray([len(p) for p in prefix], jnp.int32)
    logits, bcache2 = forward_batched(params, cfg, bcache, x, pos, ATTN,
                                      t_q=T)
    logits = np.asarray(logits).reshape(B, T, -1)

    for b in range(B):
        np.testing.assert_allclose(logits[b], want_logits[b],
                                   rtol=0, atol=2e-4)
        # written cache rows must match the single-stream chunk rows
        lo, hi = len(prefix[b]), len(prefix[b]) + T
        np.testing.assert_allclose(
            np.asarray(bcache2.k[b, :, lo:hi]).astype(np.float32),
            np.asarray(want_caches[b].k[:, lo:hi]).astype(np.float32),
            rtol=0, atol=1e-5)
