"""Speculative decoding by prompt lookup (self-drafting, greedy-exact).

The reference decodes strictly one token per forward (src/chat.rs:214,
src/transformer.rs:316-384).  On TPU a single-stream decode step is
weight-streaming bound: a T=k+1 forward costs nearly the same HBM traffic
as T=1 (the MXU reads every weight row either way, DESIGN.md §1), so
verifying k drafted tokens in one step multiplies tokens/step by the
acceptance rate at almost no extra cost.

Drafts come from PROMPT LOOKUP (n-gram continuation), not a second model:
the last bigram of the known token history is matched against its latest
earlier occurrence and the k tokens that followed it become the draft —
free on chat/code/RAG workloads where generations echo the context.  The
whole loop (lookup, T=k+1 verify forward, longest-prefix acceptance,
history/output append) runs DEVICE-SIDE inside one jitted lax.scan chunk:
no host round trip per step, fixed shapes throughout, variable acceptance
handled with masked writes into a (n_steps*(k+1),) output buffer.

Greedy parity is exact: every emitted token is an argmax of the same
logits plain decode would compute (accepted drafts ARE the argmax by
construction; the first non-matching position emits the argmax
correction).  Cache rows written past the accepted prefix hold
rejected-continuation garbage, but the causal mask (t_idx <= q_pos) hides
any row >= pos until a later step overwrites it — the same invariant the
engine's discarded-chunk stop-token path relies on.

Sampled (temperature > 0) generation speculates too, via REJECTION
SAMPLING (Leviathan et al. 2023, specialized to a deterministic draft):
the target distribution p is the exact processed sampler distribution
(temperature + nucleus truncation, ops.sampling.processed_probs); draft
token d_i is accepted with probability p_i(d_i); the first rejection
resamples from p_i with d_i zeroed (renormalized), and a fully accepted
draft earns a bonus sample from row k.  Every emitted token is
distributed EXACTLY as the plain sampled path's — verified by a χ² test
against the analytic distribution (tests/test_speculative_sampling.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from lmrs_tpu.config import ModelConfig
from lmrs_tpu.models.transformer import embed_tokens, forward


def lookup_draft(h: jax.Array, p: jax.Array, k: int, vmax: int) -> jax.Array:
    """Prompt-lookup draft: the k tokens following the LATEST earlier
    occurrence of the current (h[p-1], h[p]) bigram in the history.

    `h` is a (S,) int32 token history valid through index `p`; unknown
    rows hold -1, which never matches a real token, and drafts sliced
    from -1 regions are clamped to valid ids before the embed lookup
    (they just get rejected at verify).  Shared by the single-stream
    chunk below and the batched scheduler (vmapped per slot)."""
    S = h.shape[0]
    idx = jnp.arange(S - 1, dtype=jnp.int32)
    a, b = h[p - 1], h[p]
    m = (h[:-1] == a) & (h[1:] == b) & (idx < p - 1)
    j = jnp.max(jnp.where(m, idx, -1))          # latest match, -1 if none
    start = jnp.clip(j + 2, 0, S - k)
    return jnp.clip(jax.lax.dynamic_slice(h, (start,), (k,)), 0, vmax)


def rejection_accept(probs: jax.Array, draft: jax.Array, key: jax.Array):
    """Speculative rejection sampling against a POINT-MASS draft.

    probs: (k+1, V) target distributions (row i conditions on the first i
    draft tokens being emitted); draft: (k,) int32 proposal.  Returns
    (ok (k,) bool acceptance tests, emitted (k+1,) int32): the first
    argmin(ok ++ [False]) entries of `emitted` are accepted drafts and
    entry n_acc is the resample — a rejection draws from p with the draft
    token zeroed, a full acceptance draws the bonus token from row k.
    Each emitted token is distributed exactly as a direct draw from its
    row (accept d w.p. p(d); residual mass (1-p(d)) × p(x)/(1-p(d)) =
    p(x) for x != d)."""
    k = draft.shape[0]
    V = probs.shape[-1]
    ku, kr = jax.random.split(key)
    u = jax.random.uniform(ku, (k,))
    p_d = jnp.take_along_axis(probs[:k], draft[:, None], 1)[:, 0]
    ok = u < p_d
    n_acc = jnp.argmin(jnp.concatenate([ok, jnp.zeros((1,), bool)])
                       ).astype(jnp.int32)
    row = jax.lax.dynamic_index_in_dim(probs, n_acc, 0, keepdims=False)
    d_at = draft[jnp.clip(n_acc, 0, k - 1)]
    bonus = n_acc == k
    row = jnp.where((jnp.arange(V) == d_at) & ~bonus, 0.0, row)
    repl = jax.random.categorical(kr, jnp.log(row + 1e-30)).astype(jnp.int32)
    pad = jnp.concatenate([draft, draft[-1:]])
    emitted = jnp.where(jnp.arange(k + 1) == n_acc, repl, pad)
    return ok, emitted


@lru_cache(maxsize=None)
def make_spec_chunk(cfg: ModelConfig):
    """Jitted speculative decode chunk for single-device engines.

    spec_chunk(params, cache, h, pos, key, n_steps, k, attn_len,
               temperature, top_p) ->
        (out_buf (n_steps*(k+1),), n_out scalar, cache, h, new_pos)

    temperature == 0.0 (static) keeps the greedy-exact accept path (key
    is unused); temperature > 0 runs rejection sampling against the
    processed sampler distribution — see rejection_accept.

    `h` is the (seq_len,) int32 known-token history: valid through index
    `pos` inclusive (cache rows < pos are correct; the token AT pos is
    known but not yet cached).  Unknown positions hold -1 (multimodal
    embeds, resumed sessions) — -1 never matches a real token, and drafts
    sliced from -1 regions are clamped before the embed lookup (they just
    get rejected).  The caller must leave pos + n_steps*(k+1) + 1 within
    seq_len (dynamic_update_slice clamping would corrupt the tail).
    """

    @partial(jax.jit,
             static_argnames=("n_steps", "k", "attn_len", "temperature",
                              "top_p"),
             donate_argnames=("cache", "h"))
    def spec_chunk(params, cache, h, pos, key, n_steps: int, k: int,
                   attn_len: int, temperature: float = 0.0,
                   top_p: float = 0.9):
        from lmrs_tpu.ops.sampling import processed_probs

        vmax = cfg.vocab_size - 1

        def step(carry, _):
            cache, h, p, n_out, out, key = carry
            draft = lookup_draft(h, p, k, vmax)

            # ---- verify: ONE T=k+1 forward, logits for every row -------
            toks_in = jnp.concatenate([h[p][None], draft])
            x = embed_tokens(params, cfg, toks_in)
            logits, cache = forward(params, cfg, cache, x, p, attn_len,
                                    "all")
            if temperature == 0.0:
                # greedy-exact: longest prefix with draft[i] == argmax[i];
                # the reject row emits the argmax correction
                g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                ok = draft == g[:-1]
                emitted = g
            else:
                key, sub = jax.random.split(key)
                probs = processed_probs(logits, temperature, top_p)
                ok, emitted = rejection_accept(probs, draft, sub)
            okz = jnp.concatenate([ok, jnp.zeros((1,), bool)])
            n_acc = jnp.argmin(okz).astype(jnp.int32)   # first miss = count

            # emitted[0..n_acc] are used; writing ALL k+1 is safe — history
            # beyond the new pos is never read (lookup masks idx < p-1)
            # and buffer beyond the final n_out is never drained
            h = jax.lax.dynamic_update_slice(h, emitted, (p + 1,))
            out = jax.lax.dynamic_update_slice(out, emitted, (n_out,))
            return (cache, h, p + n_acc + 1, n_out + n_acc + 1, out,
                    key), n_acc

        out0 = jnp.zeros((n_steps * (k + 1),), jnp.int32)
        (cache, h, p, n_out, out, _), accs = jax.lax.scan(
            step, (cache, h, pos, jnp.int32(0), out0, key),
            length=n_steps)
        return out, n_out, cache, h, p, accs

    return spec_chunk


_MESH_SPEC = {}


def make_spec_chunk_mesh(cfg: ModelConfig, mesh, param_spec,
                         quant_cache: bool = False):
    """Speculative chunk for MESH engines: the same lookup/verify/accept
    scan, with the body under shard_map (the shard_map-transparent forward
    inserts the tp/cp collectives; logits are all_gathered over tp, so
    every shard computes identical argmaxes and the history/position
    updates stay replicated).  Shared across Engine instances like
    engine._mesh_fns_cached."""
    from lmrs_tpu.runtime.engine import mesh_memo_key

    key = mesh_memo_key(cfg, mesh, param_spec, quant_cache)
    if key in _MESH_SPEC:
        return _MESH_SPEC[key]

    from jax.sharding import PartitionSpec as P

    from lmrs_tpu.models.transformer import KVCache as KV
    from lmrs_tpu.parallel.tp import local_config
    from lmrs_tpu.runtime.engine import (_mesh_axes, _mesh_cache_spec,
                                         _mesh_scale_spec)

    tp, cp = _mesh_axes(mesh)
    cfg_l = local_config(cfg, tp, "tp" if tp > 1 else None,
                         "cp" if cp > 1 else None, cp=cp)
    cache_p = _mesh_cache_spec(mesh)
    scale_p = _mesh_scale_spec(mesh) if quant_cache else None
    cache_spec = KV(cache_p, cache_p, scale_p, scale_p)
    inner = make_spec_chunk(cfg_l)

    @partial(jax.jit,
             static_argnames=("n_steps", "k", "attn_len", "temperature",
                              "top_p"),
             donate_argnames=("cache", "h"))
    def spec_chunk(params, cache, h, pos, key, n_steps: int, k: int,
                   attn_len: int, temperature: float = 0.0,
                   top_p: float = 0.9):
        # cp: the row-exact cp_masked_write splits a straddling verify
        # window across shards, but each shard's anchored window needs
        # T = k+1 rows of local block (transformer.cp_masked_write)
        assert cp == 1 or k + 1 <= cfg.seq_len // cp, \
            f"speculative k={k} verify window exceeds the cp local block"
        attn = cfg.seq_len if cp > 1 else attn_len

        def body(params, cache, h, pos, key):
            # key rides replicated: tp all_gathers the logits, so every
            # shard draws identical accept/resample decisions
            return inner.__wrapped__(params, cache, h, pos, key, n_steps,
                                     k, attn, temperature, top_p)

        sm = jax.shard_map(
            body, mesh=mesh,
            in_specs=(param_spec, cache_spec, P(), P(), P()),
            out_specs=(P(), P(), cache_spec, P(), P(), P()),
            check_vma=False)
        return sm(params, cache, h, pos, key)

    _MESH_SPEC[key] = spec_chunk
    return spec_chunk
