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

Sampled (temperature > 0) generation keeps the plain chunked path:
correct speculative sampling needs distribution-level rejection sampling,
not token equality.
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


@lru_cache(maxsize=None)
def make_spec_chunk(cfg: ModelConfig):
    """Jitted speculative decode chunk for single-device engines.

    spec_chunk(params, cache, h, pos, n_steps, k, attn_len) ->
        (out_buf (n_steps*(k+1),), n_out scalar, cache, h, new_pos)

    `h` is the (seq_len,) int32 known-token history: valid through index
    `pos` inclusive (cache rows < pos are correct; the token AT pos is
    known but not yet cached).  Unknown positions hold -1 (multimodal
    embeds, resumed sessions) — -1 never matches a real token, and drafts
    sliced from -1 regions are clamped before the embed lookup (they just
    get rejected).  The caller must leave pos + n_steps*(k+1) + 1 within
    seq_len (dynamic_update_slice clamping would corrupt the tail).
    """

    @partial(jax.jit, static_argnames=("n_steps", "k", "attn_len"),
             donate_argnames=("cache", "h"))
    def spec_chunk(params, cache, h, pos, n_steps: int, k: int,
                   attn_len: int):
        vmax = cfg.vocab_size - 1

        def step(carry, _):
            cache, h, p, n_out, out = carry
            draft = lookup_draft(h, p, k, vmax)

            # ---- verify: ONE T=k+1 forward, logits for every row -------
            toks_in = jnp.concatenate([h[p][None], draft])
            x = embed_tokens(params, cfg, toks_in)
            logits, cache = forward(params, cfg, cache, x, p, attn_len,
                                    "all")
            g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (k+1,)

            # ---- longest accepted prefix: draft[i] == g[i] -------------
            ok = jnp.concatenate([draft == g[:-1],
                                  jnp.zeros((1,), bool)])
            n_acc = jnp.argmin(ok).astype(jnp.int32)    # first miss = count

            # g[0..n_acc] are emitted; writing ALL k+1 is safe — history
            # beyond the new pos is never read (lookup masks idx < p-1)
            # and buffer beyond the final n_out is never drained
            h = jax.lax.dynamic_update_slice(h, g, (p + 1,))
            out = jax.lax.dynamic_update_slice(out, g, (n_out,))
            return (cache, h, p + n_acc + 1, n_out + n_acc + 1, out), n_acc

        out0 = jnp.zeros((n_steps * (k + 1),), jnp.int32)
        (cache, h, p, n_out, out), accs = jax.lax.scan(
            step, (cache, h, pos, jnp.int32(0), out0), length=n_steps)
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

    @partial(jax.jit, static_argnames=("n_steps", "k", "attn_len"),
             donate_argnames=("cache", "h"))
    def spec_chunk(params, cache, h, pos, n_steps: int, k: int,
                   attn_len: int):
        # cp: the row-exact cp_masked_write splits a straddling verify
        # window across shards, but each shard's anchored window needs
        # T = k+1 rows of local block (transformer.cp_masked_write)
        assert cp == 1 or k + 1 <= cfg.seq_len // cp, \
            f"speculative k={k} verify window exceeds the cp local block"
        attn = cfg.seq_len if cp > 1 else attn_len

        def body(params, cache, h, pos):
            return inner.__wrapped__(params, cache, h, pos, n_steps, k,
                                     attn)

        sm = jax.shard_map(
            body, mesh=mesh,
            in_specs=(param_spec, cache_spec, P(), P()),
            out_specs=(P(), P(), cache_spec, P(), P(), P()),
            check_vma=False)
        return sm(params, cache, h, pos)

    _MESH_SPEC[key] = spec_chunk
    return spec_chunk
