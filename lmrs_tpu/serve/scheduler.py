"""Continuous-batching scheduler: multi-request serving over ONE model.

The reference's serving story is one model instance and one generation
stream per WebSocket connection (reference: src/bin/backend.rs:88-110) —
concurrency multiplies memory and divides throughput.  On TPU the decode
step is HBM-bandwidth-bound on the weights, so a batch of B requests costs
nearly the same per step as one: the scheduler keeps a slot-based batched
KV cache, admits requests between decode chunks (continuous batching),
emits tokens per slot, and evicts finished sequences.

Design:
* All matmuls run on stacked (B, D) activations (weights stream once per
  step) — see models.transformer.forward_batched; only attention and the
  cache update are vmapped per slot.
* Prefill is per-slot (prompts have ragged lengths): the slot's cache is
  sliced out, run through the normal chunked forward, and written back.
* Decode runs in fused chunks of `decode_chunk` steps (one dispatch per
  chunk); admission happens between chunks.  A freed slot's stale cache
  rows sit beyond the new sequence's `pos` and are causally masked.
* Sampling temperature/top_p are PER-REQUEST device arrays inside the
  jitted chunk (ops.sampling.sample_batched) — one compiled program serves
  any mix of greedy and sampled requests, like the reference's per-
  connection Sampler (reference: src/bin/backend.rs:139-153);
  max_new_tokens and stop tokens are per-request host state.
"""

from __future__ import annotations

import dataclasses
import itertools
import threading
import time
from functools import partial
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lmrs_tpu.config import ModelConfig
from lmrs_tpu.models.transformer import (KVCache, TransformerParams,
                                         embed_tokens, forward,
                                         forward_batched)
from lmrs_tpu.ops.sampling import (sample_argmax, sample_batched,
                                   sample_multinomial, sample_topp)


class PoolExhausted(RuntimeError):
    """The paged KV pool has no free pages for a required allocation."""


def paged_supported(cfg: ModelConfig, cp: int = 1,
                    cache_dtype=jnp.bfloat16) -> bool:
    """Whether the paged KV pool can serve this config — the product
    surfaces (serve.backend --batch, bench.py) default to paged when this
    holds (round-4 measured paging free at a fair pool: 368 vs 364 tok/s,
    RESULTS_r4.md §7) and fall back to the contiguous batched cache
    otherwise."""
    if cfg.matmul_impl != "fast" or cfg.cache_head_dim % 128 or cp > 1:
        return False
    if cache_dtype == "int4":
        from lmrs_tpu.models.transformer import q4_cache_supported

        return q4_cache_supported(cfg.n_kv_heads, cfg.cache_head_dim)
    return True


def auto_pool_tokens(max_batch: int, max_ctx: int, page_size: int = 512,
                     fill: float = 0.75) -> int:
    """Default pool sizing for paged-by-default serving: `fill` x the
    contiguous cache's B x max_ctx rows (live contexts rarely all run to
    max length; an under-filled pool degrades into admission backpressure,
    not OOM), rounded up to whole pages, never below one page per slot."""
    rows = int(fill * max_batch * max_ctx)
    rows = max(rows, max_batch * page_size)
    return -(-rows // page_size) * page_size


@dataclasses.dataclass
class Request:
    prompt: List[int]
    max_new_tokens: int = 256
    stop_tokens: frozenset = frozenset()
    on_token: Optional[Callable[[int], None]] = None
    on_done: Optional[Callable[[List[int]], None]] = None
    # per-request sampling parameters (None → the scheduler's defaults)
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    # filled by the scheduler
    id: int = -1
    out: List[int] = dataclasses.field(default_factory=list)
    submit_time: float = 0.0
    ttft: Optional[float] = None
    lease: Optional["Lease"] = None
    error: Optional[str] = None


@dataclasses.dataclass
class _Slot:
    req: Optional[Request] = None
    pos: int = 0
    lease: Optional["Lease"] = None
    # incremental admission state: a request whose prompt is being prefilled
    # one chunk per tick (so admission never stalls active decode streams)
    pending: Optional[Request] = None
    pending_x: Optional[object] = None   # prompt embeddings (N, D)
    pending_off: int = 0
    # token at each cached row (feeds the admission prefix cache); -1 marks
    # rows with no token (image embeddings).  Valid through min(len, pos).
    tokens: List[int] = dataclasses.field(default_factory=list)
    # paged mode: physical page ids backing this slot's virtual blocks
    # (leading entries become 0 placeholders once window-freed)
    pages: List[int] = dataclasses.field(default_factory=list)
    # paged + sliding window: count of leading pages already released
    # back to the pool (their rows fell wholly behind the window)
    win_freed: int = 0


@dataclasses.dataclass
class Lease:
    """Pins one cache slot to a conversation across turns: the KV prefix
    (system prompt, chat history, image embeddings) stays resident and each
    turn continues from `pos` — the batched equivalent of the reference's
    per-connection growing position (reference: src/bin/backend.rs:215)."""

    slot_idx: int
    released: bool = False


class BatchScheduler:
    """Slot-based continuous batching over a shared parameter set."""

    def __init__(self, cfg: ModelConfig, params: TransformerParams,
                 max_batch: int = 8, max_ctx: Optional[int] = None,
                 cache_dtype=jnp.bfloat16, prefill_chunk: int = 64,
                 decode_chunk: int = 8, min_attn_bucket: int = 256,
                 temperature: float = 0.0, top_p: float = 0.9,
                 seed: int = 0, prefix_cache_min: int = 32,
                 speculative_k: int = 0, mesh=None, param_spec=None,
                 page_size: int = 512,
                 pool_tokens: Optional[int] = None):
        if cache_dtype == "int4" and pool_tokens is None:
            raise ValueError("the batched int4 KV cache is paged-only "
                             "(pass pool_tokens=...); use int8 for the "
                             "contiguous batched cache")
        lw = params.layers if not isinstance(params.layers, (list, tuple)) \
            else params.layers[0]
        if getattr(getattr(lw, "wqkv", None), "kmajor", False):
            raise ValueError(
                "BatchScheduler needs ROW-major params: the K-major "
                "layout is the single-stream decode path (T=B batched "
                "steps run the stacked xe kernels) — build params "
                "without kernels.vpu_matvec.kmajor_params")
        # paged mode: the KV cache is a SHARED page pool + per-slot page
        # tables instead of a preallocated (B, L, S, ...) block — memory
        # is sum-of-contexts (pool_tokens rows), not B x max-context.
        # Attention always runs the paged flash kernel (page == block).
        self.paged = pool_tokens is not None
        if self.paged:
            if cfg.matmul_impl != "fast" or cfg.cache_head_dim % 128:
                raise ValueError("the paged cache needs the fast kernel "
                                 "path and cache_head_dim % 128 == 0 "
                                 f"(got {cfg.cache_head_dim})")
            if cache_dtype == "int4":
                from lmrs_tpu.models.transformer import q4_cache_supported

                if not q4_cache_supported(cfg.n_kv_heads,
                                          cfg.cache_head_dim):
                    raise ValueError(
                        "the int4 pool's in-kernel nibble unpack needs "
                        "cache_head_dim % 256 == 0 or (cache_head_dim % "
                        "128 == 0 with an even kv-head count); got "
                        f"hd={cfg.cache_head_dim}, kh={cfg.n_kv_heads}")
            # a query window must fit one page (the paged kernel's
            # t_q <= psz contract): the largest window is the padded
            # prefill chunk / the speculative verify width
            pad_max = max(8, 1 << (prefill_chunk - 1).bit_length())
            min_page = max(pad_max, speculative_k + 1)
            if page_size < min_page or page_size % 8:
                raise ValueError(
                    f"page_size {page_size} too small: needs a multiple "
                    f"of 8 that is >= the padded prefill chunk / "
                    f"speculative window ({min_page})")
        self.cfg = cfg
        self.params = params
        # mesh mode: continuous batching over a Megatron tensor-parallel
        # and/or context-parallel mesh — every jitted program's body runs
        # under shard_map with the LOCAL config (parallel.tp.local_config),
        # kv heads sharded on the "tp" axis exactly like
        # runtime.engine._make_mesh_fns.  With a "cp" axis the contiguous
        # cache's SEQUENCE axis is sharded too: per-slot writes are
        # row-exact masked RMWs on the owning shard (straddle-safe, see
        # models.transformer._layer_batched) and the batched flash kernel's
        # per-shard partials merge with the attention_cp online-softmax
        # reduction — aggregate context capacity scales with cp while the
        # batch keeps decoding as one program.
        self.mesh = mesh
        tp = cp = 1
        if mesh is not None:
            axes = dict(zip(mesh.axis_names, mesh.devices.shape))
            tp = axes.get("tp", 1)
            cp = axes.get("cp", 1)
            if cp > 1:
                if self.paged:
                    raise ValueError(
                        "--pool-tokens with --cp is not supported: pages "
                        "shard on kv-head lanes, not the sequence (use a "
                        "contiguous batched cache with --cp)")
                if cfg.matmul_impl != "fast" or cfg.cache_head_dim % 128:
                    raise ValueError(
                        "the batched cp path needs the fast kernel path "
                        "and cache_head_dim % 128 == 0 (got "
                        f"{cfg.matmul_impl}, {cfg.cache_head_dim})")
            if param_spec is None:
                raise ValueError("mesh scheduler needs param_spec (from "
                                 "parallel.tp.build_tp_params_stacked)")
            from lmrs_tpu.parallel.tp import local_config
            cfg_l = local_config(cfg, tp, "tp" if tp > 1 else None,
                                 "cp" if cp > 1 else None, cp)
        else:
            cfg_l = cfg
        self.cp = cp
        self._cfg_l = cfg_l
        self.B = max_batch
        self.S = min(max_ctx or cfg.seq_len, cfg.seq_len)
        self.prefill_chunk = prefill_chunk
        self.decode_chunk = decode_chunk
        self.min_attn_bucket = min(min_attn_bucket, self.S)
        self.temperature = temperature
        self.top_p = top_p
        # prompt-lookup speculative decoding for the batched step: greedy
        # slots accept by token equality, sampled slots by rejection
        # sampling — gated per slot inside the jitted chunk
        self.spec_k = speculative_k
        self.spec_proposed = 0
        self.spec_accepted = 0
        # device-resident (B, S+slack) token history for the batched spec
        # chunk: the chunk updates it in-program (one donated array, no
        # per-chunk host->device upload of O(B*S) bytes); host-side
        # divergences (admission, slot reuse, stop truncation) mark rows
        # dirty for a single-row re-upload before the next chunk
        self._h_dev = None
        self._h_dirty = set()
        # Slack rows past S: inactive lanes (idle leased conversations) ride
        # through the batched step and write dummy rows at their own pos;
        # with pos near S those writes would otherwise clamp inside
        # dynamic_update_slice and shift back over REAL trailing KV rows.
        # The slack region absorbs them — attention never reads past S
        # (attn buckets cap at S), so slack rows are always dead.
        # With speculation every step writes a (spec_k+1)-row window.
        self._slack = max(decode_chunk * (speculative_k + 1), 8)
        # shard_map partition specs (mesh mode): merged head-lanes on tp
        # (contiguous per-head blocks — the lane split IS the head split),
        # scale planes (B, L, KH, S) with kv heads on tp
        tpa = "tp" if tp > 1 else None
        cpa = "cp" if cp > 1 else None
        from jax.sharding import PartitionSpec as P
        # the SAME specs serve both layouts: contiguous (B, L, S, KH·hd)
        # and paged pool (L, P, psz, KH·hd) put merged head-lanes last
        # (the lane split IS the head split), and both scale layouts put
        # KH on axis 2.  With a cp axis the contiguous SEQUENCE axis
        # shards too (values axis 2, sequence-last scale planes axis 3);
        # cpa is always None for the paged pool (cp+paged rejected above).
        val_p = P(None, None, cpa, tpa)
        scl_p = (P(None, None, tpa, cpa)
                 if cache_dtype in (jnp.int8, "int4") else None)
        cache_pspec = KVCache(val_p, val_p, scl_p, scl_p)

        def _put(a, spec):
            if a is None or mesh is None:
                return a
            from jax.sharding import NamedSharding
            return jax.device_put(a, NamedSharding(mesh, spec))

        kv_m = cfg.n_kv_heads * cfg.cache_head_dim
        if self.paged:
            self.psz = page_size
            # virtual blocks cover S plus the in-chunk write overhang
            # (decode advances every lane n steps per chunk; prefill pads
            # chunks) — overhang entries stay 0 and land in the trash page
            self.maxp = -(-(self.S + self._slack
                            + max(prefill_chunk, decode_chunk))
                          // page_size)
            n_pages = max(1, -(-pool_tokens // page_size)) + 1  # +trash pg 0
            self.n_pages = n_pages
            packed4 = cache_dtype == "int4"
            store = jnp.int8 if packed4 else cache_dtype
            pool = (cfg.n_layers, n_pages, page_size,
                    kv_m // 2 if packed4 else kv_m)
            ks = vs = None
            if store == jnp.int8:
                sshape = (cfg.n_layers, n_pages, cfg.n_kv_heads, page_size)
                ks = _put(jnp.zeros(sshape, jnp.float32), scl_p)
                vs = _put(jnp.zeros(sshape, jnp.float32), scl_p)
            self.cache = KVCache(k=_put(jnp.zeros(pool, store), val_p),
                                 v=_put(jnp.zeros(pool, store), val_p),
                                 k_scale=ks, v_scale=vs)
            self._table = np.zeros((self.B, self.maxp), np.int32)
            self._table_dev = jnp.asarray(self._table)
            self._table_dirty = False
            self._free_pages = list(range(n_pages - 1, 0, -1))  # pop()
            # prefix forks SHARE full prefix pages read-only (slots only
            # ever write at vp >= their pos); a page returns to the free
            # list when its last holder releases it
            self._page_refs = np.zeros(n_pages, np.int32)
        else:
            if cp > 1:
                # sequence axis shards into cp contiguous blocks: each
                # shard's LOCAL row count s_loc must be flash-plannable
                # (s_loc % min(512, s_loc) == 0 — the batched cp branch
                # always runs the flash kernel over the full local block)
                # and at least as big as the largest single write window
                # (prefill chunks / speculative verify windows are
                # row-exact straddle-safe, but each requires T <= s_loc)
                s_loc = -(-(self.S + self._slack) // cp)
                if s_loc > 512:
                    s_loc = -(-s_loc // 512) * 512
                else:
                    s_loc = 1 << (s_loc - 1).bit_length()
                # _do_prefill pads each chunk to the next power of two
                # (see pad_max above), so guard on the PADDED window —
                # a raw prefill_chunk guard would admit e.g. chunk=1200
                # into s_loc=1536 and let the padded 2048-row window
                # clip negative in cp_masked_write
                win = max(8, 1 << (prefill_chunk - 1).bit_length(),
                          decode_chunk * (speculative_k + 1))
                if s_loc < win:
                    raise ValueError(
                        f"cp={cp} leaves {s_loc} local cache rows per "
                        f"shard < the largest write window {win}; lower "
                        "--cp / prefill_chunk or raise max_ctx")
                self._slack = s_loc * cp - self.S
            shape = (self.B, cfg.n_layers, self.S + self._slack, kv_m)
            ks = vs = None
            if cache_dtype == jnp.int8:
                # scale planes are sequence-LAST (models.transformer.KVCache)
                sshape = shape[:2] + (cfg.n_kv_heads, shape[2])
                ks = _put(jnp.zeros(sshape, jnp.float32), scl_p)
                vs = _put(jnp.zeros(sshape, jnp.float32), scl_p)
            self.cache = KVCache(
                k=_put(jnp.zeros(shape, cache_dtype), val_p),
                v=_put(jnp.zeros(shape, cache_dtype), val_p),
                k_scale=ks, v_scale=vs)
        self.slots = [_Slot() for _ in range(self.B)]
        self.waiting: List[Request] = []
        self._ids = itertools.count()
        self._lock = threading.Lock()
        self.key = jax.random.PRNGKey(seed)
        self.tokens_emitted = 0
        self.decode_seconds = 0.0
        # admission prefix cache: a fresh request whose prompt shares a
        # >= prefix_cache_min token prefix with a resident slot's history
        # (shared system prompts, forked conversations) COPIES those cache
        # rows device-side instead of recomputing the prefill — the
        # reference recomputes every connection's prompt from scratch
        # (src/bin/backend.rs:88-110).  0 disables.
        self.prefix_cache_min = prefix_cache_min
        self.prefix_hits = 0
        self.prefix_tokens_saved = 0

        def _slot_view(cache, slot):
            sl = (lambda a: None if a is None else
                  jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0)[0])
            return KVCache(sl(cache.k), sl(cache.v),
                           sl(cache.k_scale), sl(cache.v_scale))

        def _slot_store(cache, new, slot):
            st = (lambda a, n: a if n is None else
                  jax.lax.dynamic_update_slice_in_dim(a, n[None], slot, 0))
            return KVCache(st(cache.k, new.k), st(cache.v, new.v),
                           st(cache.k_scale, new.k_scale),
                           st(cache.v_scale, new.v_scale))

        def smap(body, in_specs, out_specs):
            """Identity on one device; shard_map over the tp mesh
            otherwise (the shard_map-transparent forward: cfg_l routes the
            psums/all_gathers inside models.transformer)."""
            if mesh is None:
                return body
            return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False)

        @partial(jax.jit, donate_argnames=("cache",))
        def _copy_prefix(cache, src, dst, n_rows):
            """Copy rows [0, n_rows) of slot src's cache into slot dst
            (one masked whole-slot pass, O(1) program size; n_rows is a
            traced scalar so one compile serves every prefix length).
            Mesh mode: runs per-shard on the local head block (the copy is
            elementwise along the sequence axis)."""
            def body(cache, src, dst, n_rows):
                def cp(a, seq_axis):
                    # seq_axis indexes the SLICED (slot-local) array: 1 for
                    # (L, S, kv_m) value planes, 2 for (L, KH, S) scales
                    if a is None:
                        return None
                    srow = jax.lax.dynamic_slice_in_dim(a, src, 1, 0)[0]
                    drow = jax.lax.dynamic_slice_in_dim(a, dst, 1, 0)[0]
                    shp = [1, 1, 1]
                    shp[seq_axis] = srow.shape[seq_axis]
                    # cp: this shard holds GLOBAL rows [r*s_loc, (r+1)*s_loc)
                    # — the n_rows cutoff compares global indices
                    # (self.cp, not the local `cp` closure this shadows)
                    off = (jax.lax.axis_index("cp")
                           * srow.shape[seq_axis] if self.cp > 1 else 0)
                    mask = (off + jnp.arange(srow.shape[seq_axis])
                            < n_rows).reshape(shp)
                    return jax.lax.dynamic_update_slice_in_dim(
                        a, jnp.where(mask, srow, drow)[None], dst, 0)
                return KVCache(cp(cache.k, 1), cp(cache.v, 1),
                               cp(cache.k_scale, 2), cp(cache.v_scale, 2))
            return smap(body, (cache_pspec, P(), P(), P()),
                        cache_pspec)(cache, src, dst, n_rows)

        self._copy_prefix = _copy_prefix

        @partial(jax.jit,
                 static_argnames=("attn_len",),
                 donate_argnames=("cache",))
        def _prefill_slot(params, cache, x, slot, pos, logit_idx, attn_len):
            # logits always computed: a want_logits variant doubles the
            # program count at ~100 s of remote compile each, vs <1 ms of
            # classifier matmul per chunk (VERDICT r3 #4)
            def body(params, cache, x, slot, pos, logit_idx):
                logits, new = forward(params, cfg_l,
                                      _slot_view(cache, slot), x,
                                      pos, attn_len, logit_idx)
                return logits, _slot_store(cache, new, slot)
            return smap(body,
                        (param_spec, cache_pspec, P(), P(), P(), P()),
                        (P(), cache_pspec))(params, cache, x, slot,
                                            pos, logit_idx)

        self._prefill_slot = _prefill_slot

        @partial(jax.jit,
                 static_argnames=("n_steps", "attn_len"),
                 donate_argnames=("cache",))
        def _decode_chunk_b(params, cache, tokens, pos, temps, top_ps, key,
                            n_steps, attn_len):
            def body(params, cache, tokens, pos, temps, top_ps, key):
                def step(carry, _):
                    toks, p, cache, key = carry
                    x = embed_tokens(params, cfg_l, toks)
                    logits, cache = forward_batched(
                        params, cfg_l, cache, x, p, attn_len)
                    key, sub = jax.random.split(key)
                    nxt = sample_batched(logits, temps, top_ps, sub)
                    return (nxt, p + 1, cache, key), nxt

                (toks, p, cache, key), all_toks = jax.lax.scan(
                    step, (tokens, pos, cache, key), length=n_steps)
                return all_toks, cache
            return smap(body,
                        (param_spec, cache_pspec, P(), P(), P(), P(), P()),
                        (P(), cache_pspec))(params, cache, tokens, pos,
                                            temps, top_ps, key)

        self._decode_chunk_b = _decode_chunk_b

        @partial(jax.jit,
                 static_argnames=("n_steps", "k", "attn_len", "paged"),
                 donate_argnames=("cache", "h"))
        def _spec_chunk_b(params, cache, h, tokens, pos, temps, top_ps,
                          key, table, n_steps, k, attn_len, paged=False):
            """Batched prompt-lookup speculative chunk: every step runs
            ONE t_q=k+1 verify forward for ALL slots; greedy slots accept
            their longest matching draft prefix, sampled slots accept by
            rejection sampling against the processed sampler distribution
            (runtime/speculative.py — distribution-exact per emitted
            token; the cache-garbage/causal-mask invariant covers rows
            past the accepted prefix).  All-greedy batches skip the
            (B*(k+1), V) prob machinery at runtime, like sample_batched.
            Returns per-slot token buffers + counts.  With `paged`, the
            verify windows write through the page table (the row-wise
            paged writes are straddle-safe); non-paged callers pass a
            dummy table."""
            def body(params, cache, h, tokens, pos, temps, top_ps, key,
                     table):
                from lmrs_tpu.ops.sampling import processed_probs
                from lmrs_tpu.runtime.speculative import (lookup_draft,
                                                          rejection_accept)

                B = tokens.shape[0]
                vmax = cfg.vocab_size - 1
                greedy = temps == 0.0

                def step(carry, _):
                    toks, p, cache, h, n_out, out, key = carry
                    draft = jax.vmap(
                        lambda hb, pb: lookup_draft(hb, pb, k, vmax))(
                        h, p)                                    # (B, k)
                    tin = jnp.concatenate([toks[:, None], draft], 1)
                    x = embed_tokens(params, cfg_l, tin.reshape(-1))
                    logits, cache = forward_batched(
                        params, cfg_l, cache, x, p, attn_len, t_q=k + 1,
                        table=table if paged else None)
                    logits = logits.reshape(B, k + 1, -1)
                    g = jnp.argmax(logits, -1).astype(jnp.int32)  # (B, k+1)
                    ok_g = draft == g[:, :-1]                     # (B, k)
                    key, sub = jax.random.split(key)

                    def _sampled(args):
                        logits, draft, temps, top_ps, sub = args
                        probs = jax.vmap(processed_probs)(
                            logits, temps, top_ps)        # (B, k+1, V)
                        ok_s, emit_s = jax.vmap(rejection_accept)(
                            probs, draft, jax.random.split(sub, B))
                        return (jnp.where(greedy[:, None], ok_g, ok_s),
                                jnp.where(greedy[:, None], g, emit_s))

                    ok, emit = jax.lax.cond(
                        jnp.any(temps > 0.0), _sampled,
                        lambda args: (ok_g, g),
                        (logits, draft, temps, top_ps, sub))
                    ok = jnp.concatenate([ok, jnp.zeros((B, 1), bool)], 1)
                    n_acc = jnp.argmin(ok, axis=1).astype(jnp.int32)
                    h = jax.vmap(lambda hb, eb, pb:
                                 jax.lax.dynamic_update_slice(hb, eb,
                                                              (pb + 1,)))(
                        h, emit, p)
                    out = jax.vmap(lambda ob, eb, nb:
                                   jax.lax.dynamic_update_slice(ob, eb,
                                                                (nb,)))(
                        out, emit, n_out)
                    nxt = jnp.take_along_axis(emit, n_acc[:, None], 1)[:, 0]
                    return (nxt, p + n_acc + 1, cache, h,
                            n_out + n_acc + 1, out, key), n_acc

                out0 = jnp.zeros((B, n_steps * (k + 1)), jnp.int32)
                n0 = jnp.zeros((B,), jnp.int32)
                (toks, p, cache, h, n_out, out, _), accs = jax.lax.scan(
                    step, (tokens, pos, cache, h, n0, out0, key),
                    length=n_steps)
                return out, n_out, cache, h, accs
            return smap(body,
                        (param_spec, cache_pspec, P(), P(), P(), P(), P(),
                         P(), P()),
                        (P(), P(), cache_pspec, P(), P()))(
                params, cache, h, tokens, pos, temps, top_ps, key, table)

        self._spec_chunk_b = _spec_chunk_b

        @partial(jax.jit, donate_argnames=("h",))
        def _h_row_set(h, i, row):
            return jax.lax.dynamic_update_slice(h, row[None],
                                                (i, jnp.int32(0)))

        self._h_row_set = _h_row_set

        def _embed_body(params, tokens):
            return embed_tokens(params, cfg_l, tokens)

        self._embed = jax.jit(smap(_embed_body, (param_spec, P()), P()))

        if self.paged:
            virt = self.maxp * self.psz   # static virtual sequence length

            @partial(jax.jit, donate_argnames=("cache",))
            def _prefill_paged(params, cache, x, table_row, pos,
                               logit_idx):
                """One prefill chunk through the paged pool: the chunk is
                a t_q-token window of ONE slot (forward_batched with a
                single lane — pages make per-slot cache views unnecessary).
                Returns (logits of the logit_idx row, cache) — always
                computed, see _prefill_slot."""
                def body(params, cache, x, table_row, pos, logit_idx):
                    logits, new = forward_batched(
                        params, cfg_l, cache, x, pos, virt, t_q=x.shape[0],
                        table=table_row)
                    row = jax.lax.dynamic_slice_in_dim(logits, logit_idx,
                                                       1, 0)
                    return row[0], new

                return smap(body,
                            (param_spec, cache_pspec, P(), P(), P(),
                             P()),
                            (P(), cache_pspec))(params, cache, x,
                                                table_row, pos,
                                                logit_idx)

            self._prefill_paged = _prefill_paged

            @partial(jax.jit, static_argnames=("n_steps",),
                     donate_argnames=("cache",))
            def _decode_chunk_paged(params, cache, table, tokens, pos,
                                    temps, top_ps, key, n_steps):
                def body(params, cache, table, tokens, pos, temps, top_ps,
                         key):
                    def step(carry, _):
                        toks, p, cache, key = carry
                        x = embed_tokens(params, cfg_l, toks)
                        logits, cache = forward_batched(
                            params, cfg_l, cache, x, p, virt, table=table)
                        key, sub = jax.random.split(key)
                        nxt = sample_batched(logits, temps, top_ps, sub)
                        return (nxt, p + 1, cache, key), nxt

                    (toks, p, cache, key), all_toks = jax.lax.scan(
                        step, (tokens, pos, cache, key), length=n_steps)
                    return all_toks, cache
                return smap(body,
                            (param_spec, cache_pspec, P(), P(), P(), P(),
                             P(), P()),
                            (P(), cache_pspec))(params, cache, table,
                                                tokens, pos, temps,
                                                top_ps, key)

            self._decode_chunk_paged = _decode_chunk_paged

            @partial(jax.jit, donate_argnames=("cache",))
            def _copy_page_partial(cache, src_pg, dst_pg, n_rows):
                """Copy rows [0, n_rows) of pool page src_pg into dst_pg
                (all layers; one masked pass per plane) — the boundary-
                page copy of a paged prefix fork.  Mesh mode: per-shard
                on the local head lanes (the copy is elementwise along
                the page-row axis)."""
                def body(cache, src_pg, dst_pg, n_rows):
                    def cp(a, seq_axis):
                        # pools (L, P, psz, kv_m): rows on axis 2;
                        # scale pools (L, P, KH, psz): rows on axis 3
                        if a is None:
                            return None
                        src = jax.lax.dynamic_slice_in_dim(a, src_pg, 1, 1)
                        dst = jax.lax.dynamic_slice_in_dim(a, dst_pg, 1, 1)
                        shp = [1, 1, 1, 1]
                        shp[seq_axis] = a.shape[seq_axis]
                        mask = (jnp.arange(a.shape[seq_axis])
                                < n_rows).reshape(shp)
                        return jax.lax.dynamic_update_slice_in_dim(
                            a, jnp.where(mask, src, dst), dst_pg, 1)
                    return KVCache(cp(cache.k, 2), cp(cache.v, 2),
                                   cp(cache.k_scale, 3),
                                   cp(cache.v_scale, 3))
                return smap(body, (cache_pspec, P(), P(), P()),
                            cache_pspec)(cache, src_pg, dst_pg, n_rows)

            self._copy_page_partial = _copy_page_partial

    # ------------------------------------------------------------------
    def submit(self, prompt: Sequence[int], max_new_tokens: int = 256,
               stop_tokens: Sequence[int] = (),
               on_token: Optional[Callable[[int], None]] = None,
               on_done: Optional[Callable[[List[int]], None]] = None,
               lease: Optional[Lease] = None,
               temperature: Optional[float] = None,
               top_p: Optional[float] = None,
               ) -> Request:
        base = 0 if lease is None else self.slots[lease.slot_idx].pos
        if base + len(prompt) + 1 > self.S:
            raise ValueError(f"prompt of {len(prompt)} at pos {base} exceeds"
                             f" max context {self.S}")
        req = Request(prompt=list(prompt), max_new_tokens=max_new_tokens,
                      stop_tokens=frozenset(int(t) for t in stop_tokens),
                      on_token=on_token, on_done=on_done,
                      id=next(self._ids), submit_time=time.perf_counter(),
                      temperature=(self.temperature if temperature is None
                                   else temperature),
                      top_p=self.top_p if top_p is None else top_p)
        req.lease = lease
        with self._lock:
            self.waiting.append(req)
        return req

    # -- conversation leases (multi-turn KV residency) -------------------
    def new_conversation(self) -> Optional[Lease]:
        """Reserve a free slot for a conversation; None if all leased."""
        with self._lock:
            for i, s in enumerate(self.slots):
                if s.lease is None and s.req is None and s.pending is None:
                    lease = Lease(slot_idx=i)
                    s.lease = lease
                    s.pos = 0
                    s.tokens = []
                    return lease
        return None

    def end_conversation(self, lease: Lease):
        lease.released = True
        slot = self.slots[lease.slot_idx]
        with self._lock:
            if slot.lease is lease:
                slot.lease = None
                if slot.req is None:
                    slot.pos = 0
                    if self.paged:
                        self._free_slot_pages(lease.slot_idx)

    def prefill_embeds(self, lease: Lease, embeds) -> None:
        """Feed precomputed embeddings (multimodal image prefix) into a
        leased conversation's cache without sampling."""
        slot = self.slots[lease.slot_idx]
        embeds = jnp.asarray(embeds)
        if slot.pos + embeds.shape[0] + 1 > self.S:
            raise ValueError(
                f"image prefix of {embeds.shape[0]} embeddings at pos "
                f"{slot.pos} exceeds max context {self.S}")
        pos0 = slot.pos
        slot.pos = self._run_prefill(lease.slot_idx, embeds,
                                     slot.pos, want_logits=False)[1]
        # keep list index == row position (a previous turn's final token
        # at index pos0 was never cached and is overwritten by the embeds)
        del slot.tokens[pos0:]
        slot.tokens.extend([-1] * embeds.shape[0])  # rows with no token

    @property
    def active(self) -> int:
        return sum(1 for s in self.slots if s.req is not None)

    def has_work(self) -> bool:
        return (self.active > 0 or bool(self.waiting)
                or any(s.pending is not None for s in self.slots))

    # -- paged-pool bookkeeping ----------------------------------------
    def _table_sync(self):
        if self._table_dirty:
            self._table_dev = jnp.asarray(self._table)
            self._table_dirty = False

    def free_pool_rows(self) -> int:
        return len(self._free_pages) * self.psz

    def _pending_reserve_pages(self, exclude: int = -1) -> int:
        """Pages the already-staged prefills will still claim: admission
        must not hand the same free pages to two prompts (the staged one
        would die with PoolExhausted mid-prefill instead of this one
        deferring)."""
        need = 0
        for j, s in enumerate(self.slots):
            if j == exclude or s.pending is None:
                continue
            rows = s.pos + (s.pending_x.shape[0] - s.pending_off) + 1
            need += max(0, min(-(-rows // self.psz) - len(s.pages),
                               self._max_live_pages(rows)))
        return need

    def _ensure_pages(self, slot_idx: int, rows: int) -> bool:
        """Grow the slot's page list to cover `rows` virtual rows; False
        if the pool is exhausted (already-allocated pages stay put)."""
        slot = self.slots[slot_idx]
        need = -(-rows // self.psz)
        while len(slot.pages) < need:
            if not self._free_pages:
                return False
            pg = self._free_pages.pop()
            self._page_refs[pg] = 1
            self._table[slot_idx, len(slot.pages)] = pg
            slot.pages.append(pg)
            self._table_dirty = True
        return True

    def _free_slot_pages(self, slot_idx: int):
        slot = self.slots[slot_idx]
        if slot.pages:
            for pg in slot.pages:
                if pg == 0:
                    continue  # window-freed placeholder (trash page)
                self._page_refs[pg] -= 1
                if self._page_refs[pg] == 0:
                    self._free_pages.append(pg)
            slot.pages = []
            slot.win_freed = 0
            self._table[slot_idx, :] = 0
            self._table_dirty = True

    def _release_window_pages(self):
        """Free pages every row of which fell behind the sliding window:
        the paged flash kernel's per-slot start block is
        (pos - window) // psz (kernels/flash_attention.flash_decode_paged),
        so pages below it are never read again — pos only grows.  Without
        this a Gemma slot at 32k pins ~8x the pages its 4096 window can
        reach (VERDICT r3 weak #6).  Shared prefix pages only return to
        the pool when their LAST holder's window passes them (refcounts)."""
        w = self.cfg.sliding_window
        if w is None or not self.paged:
            return
        for i, s in enumerate(self.slots):
            dead = min(max(0, s.pos - w) // self.psz, len(s.pages))
            for j in range(s.win_freed, dead):
                pg = s.pages[j]
                if pg:
                    self._page_refs[pg] -= 1
                    if self._page_refs[pg] == 0:
                        self._free_pages.append(pg)
                    s.pages[j] = 0
                    self._table[i, j] = 0
                    self._table_dirty = True
            s.win_freed = max(s.win_freed, dead)

    def _max_live_pages(self, rows: int) -> int:
        """Upper bound on pages a slot holds AT ONCE while growing to
        `rows` virtual rows: with a sliding window, leading pages free as
        pos advances, so admission only needs the window's worth of pool
        (plus the in-flight chunk), not the whole prompt's."""
        total = -(-rows // self.psz)
        w = self.cfg.sliding_window
        if w is None or not self.paged:
            return total
        live = -(-(w + max(self.prefill_chunk, self._slack))
                 // self.psz) + 1
        return min(total, live)

    def _fork_prefix_paged(self, donor_idx: int, dst_idx: int,
                           n_rows: int) -> bool:
        """Admission prefix cache, paged: the dst slot SHARES the donor's
        full prefix pages (read-only — every slot writes only at
        vp >= its pos, which for both sides is >= n_rows) and copies just
        the partial boundary page.  Zero-copy for page-aligned prefixes;
        False if a needed boundary page can't be allocated."""
        donor = self.slots[donor_idx]
        slot = self.slots[dst_idx]
        n_full = n_rows // self.psz
        r = n_rows % self.psz
        if r and not self._free_pages:
            return False
        assert not slot.pages, "prefix fork targets an empty slot"
        for j in range(n_full):
            pg = donor.pages[j]
            self._page_refs[pg] += 1
            self._table[dst_idx, j] = pg
            slot.pages.append(pg)
        if r:
            pg = self._free_pages.pop()
            self._page_refs[pg] = 1
            self._table[dst_idx, n_full] = pg
            slot.pages.append(pg)
            self.cache = self._copy_page_partial(
                self.cache, jnp.int32(donor.pages[n_full]),
                jnp.int32(pg), jnp.int32(r))
        self._table_dirty = True
        return True

    def _prefill_call(self, slot_idx: int, xt, pos: int, logit_idx: int,
                      attn_len: int, real_rows: int):
        """One prefill chunk into slot slot_idx (paged or contiguous);
        returns (logits, cache).  Raises PoolExhausted when the
        paged pool can't cover the chunk's REAL rows — pad-overhang
        writes land in unallocated table entries (the trash page), so
        padding never costs a page."""
        if self.paged:
            if not self._ensure_pages(slot_idx, pos + real_rows):
                raise PoolExhausted(
                    f"slot {slot_idx}: no free pages for prefill rows "
                    f"through {pos + real_rows}")
            self._table_sync()
            trow = jax.lax.dynamic_slice_in_dim(self._table_dev,
                                                slot_idx, 1, 0)
            return self._prefill_paged(
                self.params, self.cache, xt, trow,
                jnp.asarray([pos], jnp.int32), jnp.int32(logit_idx))
        return self._prefill_slot(
            self.params, self.cache, xt, jnp.int32(slot_idx),
            jnp.int32(pos), jnp.int32(logit_idx), attn_len=attn_len)

    # ------------------------------------------------------------------
    def _bucket(self, needed: int) -> int:
        if self.cp > 1:
            # the cp branches attend over the full local shard regardless
            # of attn_len (models.transformer cp paths ignore the bucket)
            # — pin one bucket so jit compiles exactly one program per
            # chunk shape instead of one per rung
            return self.S
        b = self.min_attn_bucket
        while b < needed and b < self.S:
            b *= 2
        b = min(b, self.S)
        # flash-eligible rungs collapse onto one max-context program (the
        # kernel's per-slot live clamp keeps each slot's reads O(its pos);
        # see Engine._attn_bucket)
        from lmrs_tpu.models.transformer import _flash_eligible

        if (_flash_eligible(self.cfg, 1, b)
                and _flash_eligible(self.cfg, self.prefill_chunk, self.S)):
            return self.S
        return b

    def _admit(self):
        with self._lock:
            pending = list(self.waiting)
        for req in pending:
            if req.lease is not None:
                slot_idx = req.lease.slot_idx
                slot = self.slots[slot_idx]
                if slot.req is not None or slot.pending is not None:
                    continue  # previous turn still decoding/prefilling
            else:
                free = [i for i, s in enumerate(self.slots)
                        if s.req is None and s.lease is None
                        and s.pending is None]
                if not free:
                    continue
                slot_idx = free[0]
                slot = self.slots[slot_idx]
                slot.pos = 0
                slot.tokens = []
            if self.paged:
                need_rows = slot.pos + len(req.prompt) + 1
                # with a sliding window leading pages recycle mid-prefill
                # (_release_window_pages), so admission needs only the max
                # SIMULTANEOUS page footprint, not the whole prompt's
                need = self._max_live_pages(need_rows) * self.psz
                # free pages minus what already-staged prefills will still
                # claim (two prompts must not race for the same pages)
                avail = (len(self._free_pages)
                         - self._pending_reserve_pages(exclude=slot_idx))
                have = len(slot.pages) * self.psz + avail * self.psz
                if need > have:
                    # not enough pool right now: leave the request waiting
                    # (pages free as other slots finish).  If nothing is
                    # running or pending, nothing will free by itself —
                    # fail rather than spin (idle leases may hold the
                    # pool; releasing them is the caller's move).
                    if (self.active > 0
                            or any(s.pending is not None
                                   for s in self.slots)):
                        continue
                    with self._lock:
                        if req not in self.waiting:
                            continue
                        self.waiting.remove(req)
                    held = sum(len(s.pages) for j, s in
                               enumerate(self.slots) if j != slot_idx)
                    if held:
                        req.error = (
                            f"prompt needs {need} kv-pool rows but only "
                            f"{have} are available ({held} pages held by "
                            "idle conversations — end_conversation frees "
                            "them)")
                    else:
                        req.error = ("prompt needs more kv-pool rows than "
                                     f"the whole pool has ({need} > "
                                     f"{have})")
                    if req.on_done is not None:
                        req.on_done(req.out)
                    continue
            with self._lock:
                if req not in self.waiting:
                    continue
                self.waiting.remove(req)
            # Re-validate the context bound NOW: on a leased slot, pos may
            # have grown since submit() (a previous turn was still
            # decoding), so the submit-time check undershoots.  Failing the
            # request here beats running prefill past S and corrupting the
            # conversation's cache.
            if slot.pos + len(req.prompt) + 1 > self.S:
                req.error = (f"context overflow at admission: pos={slot.pos}"
                             f" + prompt {len(req.prompt)} exceeds {self.S}")
                if req.on_done is not None:
                    req.on_done(req.out)
                continue
            # stage for incremental prefill — one chunk per tick, so active
            # slots keep decoding while this prompt streams in
            slot.pending = req
            slot.pending_x = self._embed(
                self.params,
                jnp.asarray(np.asarray(req.prompt, np.int32)))
            slot.pending_off = 0
            # admission prefix cache: fork a resident slot's shared prefix
            # rows instead of recomputing them
            if slot.pos == 0 and self.prefix_cache_min:
                n_cp, donor = self._best_prefix(req.prompt, slot_idx)
                if n_cp >= self.prefix_cache_min:
                    if self.paged:
                        if not self._fork_prefix_paged(donor, slot_idx,
                                                       n_cp):
                            # no boundary page free: full prefill instead
                            continue
                    else:
                        self.cache = self._copy_prefix(
                            self.cache, jnp.int32(donor),
                            jnp.int32(slot_idx), jnp.int32(n_cp))
                    slot.pos = n_cp
                    slot.pending_off = n_cp
                    slot.tokens = list(req.prompt[:n_cp])
                    self.prefix_hits += 1
                    self.prefix_tokens_saved += n_cp

    def _best_prefix(self, prompt: Sequence[int], exclude: int):
        """(longest shared token prefix, donor slot) across resident
        slots.  Capped at len(prompt)-1 so the tail prefill still produces
        the first-token logits; mid-prefill donors are skipped (their rows
        beyond pending_off aren't committed)."""
        best, donor = 0, -1
        for i, s in enumerate(self.slots):
            if i == exclude or s.pending is not None:
                continue
            if s.req is None and s.lease is None:
                continue  # free slot: rows are dead
            if s.win_freed:
                continue  # leading pages returned to the pool: prefix gone
            limit = min(len(s.tokens), s.pos, len(prompt) - 1)
            n = 0
            while n < limit and s.tokens[n] == prompt[n]:
                n += 1
            if n > best:
                best, donor = n, i
        return best, donor

    def _run_prefill(self, slot_idx: int, x, pos: int,
                     want_logits: bool = True):
        """Chunked prefill of embeddings into a slot's cache starting at
        pos; returns (last-token logits or None, new pos)."""
        logits = None
        n = x.shape[0]
        off = 0
        while off < n:
            chunk = min(self.prefill_chunk, n - off)
            pad = max(8, 1 << (chunk - 1).bit_length())
            # pad rows are written to the cache at pos; keep the write
            # inside [0, S + slack) so dynamic_update_slice never clamps
            # (a clamped start would misalign the whole chunk and overwrite
            # real KV history)
            pad = min(pad, self.S + self._slack - pos)
            xt = x[off:off + chunk]
            if xt.shape[0] < pad:
                xt = jnp.pad(xt, ((0, pad - xt.shape[0]), (0, 0)))
            attn_len = self._bucket(pos + pad)
            logits, self.cache = self._prefill_call(
                slot_idx, xt, pos, chunk - 1, attn_len, chunk)
            pos += chunk
            off += chunk
        if not want_logits:
            logits = None
        # the slot's host history changed under the device-resident spec
        # history — re-upload this row before the next speculative chunk
        self._h_dirty.add(slot_idx)
        return logits, pos

    def _advance_prefills(self):
        """Run AT MOST ONE prefill chunk for every slot with a pending
        admission, then (if its prompt is complete) activate the request.
        Chunk-at-a-time admission bounds how long active slots go between
        decode chunks — a 512-token prompt no longer freezes every
        concurrent stream for its whole prefill."""
        for slot_idx, slot in enumerate(self.slots):
            req = slot.pending
            if req is None:
                continue
            x = slot.pending_x
            n = x.shape[0]
            off = slot.pending_off
            chunk = min(self.prefill_chunk, n - off)
            pad = max(8, 1 << (chunk - 1).bit_length())
            pad = min(pad, self.S + self._slack - slot.pos)
            xt = x[off:off + chunk]
            if xt.shape[0] < pad:
                xt = jnp.pad(xt, ((0, pad - xt.shape[0]), (0, 0)))
            attn_len = self._bucket(slot.pos + pad)
            last = off + chunk >= n
            try:
                logits, self.cache = self._prefill_call(
                    slot_idx, xt, slot.pos, chunk - 1, attn_len, chunk)
            except PoolExhausted:
                req.error = "kv page pool exhausted mid-prefill"
                slot.pending = None
                slot.pending_x = None
                if slot.lease is None:
                    self._free_slot_pages(slot_idx)
                    slot.pos = 0
                    slot.tokens = []
                if req.on_done is not None:
                    req.on_done(req.out)
                continue
            start_pos = slot.pos
            slot.pos += chunk
            # keep list index == row position: a lease continuation's first
            # prompt token overwrites the previous turn's final (never-
            # written) row, so truncate before extending
            del slot.tokens[start_pos:]
            slot.tokens.extend(req.prompt[off:off + chunk])
            slot.pending_off = off + chunk
            # long windowed prompts recycle their own dead pages while
            # still prefilling (pool sized O(window), not O(prompt))
            self._release_window_pages()
            if not last:
                continue
            # prompt complete: sample the first token with the REQUEST's
            # parameters, activate
            self.key, sub = jax.random.split(self.key)
            if req.temperature == 0.0:
                first = int(sample_argmax(logits))
            elif req.top_p <= 0.0 or req.top_p >= 1.0:
                first = int(sample_multinomial(logits, req.temperature,
                                               sub))
            else:
                first = int(sample_topp(logits, req.temperature,
                                        req.top_p, sub))
            req.ttft = time.perf_counter() - req.submit_time
            slot.pending = None
            slot.pending_x = None
            slot.req = req
            self._emit(slot_idx, slot, [first])

    def _emit(self, slot_idx: int, slot: _Slot, toks: List[int]) -> int:
        """Append tokens to the slot's request, stopping at stop tokens or
        the budget.  Returns how many were consumed."""
        req = slot.req
        for i, t in enumerate(toks):
            req.out.append(t)
            slot.tokens.append(t)
            self.tokens_emitted += 1
            if req.on_token is not None:
                req.on_token(t)
            if t in req.stop_tokens or len(req.out) >= req.max_new_tokens:
                self._finish(slot_idx, slot)
                return i + 1
        return len(toks)

    def _finish(self, slot_idx: int, slot: _Slot):
        req = slot.req
        slot.req = None
        self._h_dirty.add(slot_idx)
        if slot.lease is None or slot.lease.released:
            slot.lease = None
            slot.pos = 0
            slot.tokens = []
            if self.paged:
                self._free_slot_pages(slot_idx)
        # leased slots keep pos: the conversation's KV prefix stays resident
        if req.on_done is not None:
            req.on_done(req.out)

    # ------------------------------------------------------------------
    def step(self):
        """One scheduler tick: admit waiting requests (staging them for
        incremental prefill), advance each pending prefill by one chunk,
        then run one decode chunk for all active slots."""
        self._release_window_pages()
        self._admit()
        self._advance_prefills()
        active = [(i, s) for i, s in enumerate(self.slots)
                  if s.req is not None]
        if not active:
            return
        n = self.decode_chunk
        # context guard: slots at their limit finish now (with speculation
        # every step may write a (k+1)-row verify window)
        row_budget = n * (self.spec_k + 1) if self.spec_k else n
        for i, s in list(active):
            if s.pos + row_budget >= self.S:
                self._finish(i, s)
            elif self.paged and not self._ensure_pages(i,
                                                       s.pos + row_budget):
                # pool exhausted: finish the request now (backpressure) —
                # its pages free for the survivors
                s.req.error = "kv page pool exhausted"
                self._finish(i, s)
        active = [(i, s) for i, s in enumerate(self.slots)
                  if s.req is not None]
        if not active:
            return

        tokens = np.zeros((self.B,), np.int32)
        # Inactive lanes still run through the batched step and WRITE cache
        # rows at their pos: point them at their own slot.pos so the garbage
        # lands in the causally-dead region beyond that slot's history
        # (pos=0 would clobber an idle leased conversation's KV prefix).
        pos = np.asarray([s.pos for s in self.slots], np.int32)
        temps = np.zeros((self.B,), np.float32)   # inactive lanes: greedy
        top_ps = np.full((self.B,), 0.9, np.float32)
        for i, s in active:
            tokens[i] = s.req.out[-1]
            pos[i] = s.pos
            temps[i] = s.req.temperature
            top_ps[i] = s.req.top_p
        self.key, sub = jax.random.split(self.key)
        if self.spec_k:
            self._step_speculative(active, tokens, pos, temps, top_ps,
                                   sub, n)
            return
        t0 = time.perf_counter()
        if self.paged:
            self._table_sync()
            toks, self.cache = self._decode_chunk_paged(
                self.params, self.cache, self._table_dev,
                jnp.asarray(tokens), jnp.asarray(pos), jnp.asarray(temps),
                jnp.asarray(top_ps), sub, n_steps=n)
        else:
            attn_len = self._bucket(int(pos.max()) + n)
            toks, self.cache = self._decode_chunk_b(
                self.params, self.cache,
                jnp.asarray(tokens), jnp.asarray(pos), jnp.asarray(temps),
                jnp.asarray(top_ps), sub, n_steps=n, attn_len=attn_len)
        arr = np.asarray(toks)  # (n, B)
        self.decode_seconds += time.perf_counter() - t0
        for i, s in active:
            pos_before = s.pos
            used = self._emit(i, s, [int(t) for t in arr[:, i]])
            # advance only past consumed tokens: on a mid-chunk stop the
            # overshoot rows sit beyond pos and stay causally masked (a
            # leased conversation's next turn must not see them as history)
            if s.req is not None or s.lease is not None:
                s.pos = pos_before + used

    def _step_speculative(self, active, tokens, pos, temps, top_ps, sub,
                          n: int):
        """One speculative decode chunk (see _spec_chunk_b): greedy
        slots emit 1..k+1 tokens per step, sampled slots exactly 1."""
        k = self.spec_k
        Sh = self.S + self._slack
        if self._h_dev is None:
            h = np.full((self.B, Sh), -1, np.int32)
            for i, s in enumerate(self.slots):
                t = s.tokens[:Sh]
                h[i, :len(t)] = t
            self._h_dev = jnp.asarray(h)
            self._h_dirty.clear()
        elif self._h_dirty:
            # re-upload only rows whose host history diverged (admission,
            # slot reuse, truncation) — O(rows * Sh), not O(B * Sh)
            for i in sorted(self._h_dirty):
                row = np.full((Sh,), -1, np.int32)
                t = self.slots[i].tokens[:Sh]
                row[:len(t)] = t
                self._h_dev = self._h_row_set(self._h_dev, jnp.int32(i),
                                              jnp.asarray(row))
            self._h_dirty.clear()
        if self.paged:
            self._table_sync()
            table = self._table_dev
            attn_len = self.maxp * self.psz
        else:
            table = jnp.zeros((1, 1), jnp.int32)   # unused dummy
            attn_len = self._bucket(min(int(pos.max()) + n * (k + 1) + 1,
                                        self.S))
        t0 = time.perf_counter()
        out_buf, n_out, self.cache, self._h_dev, accs = self._spec_chunk_b(
            self.params, self.cache, self._h_dev,
            jnp.asarray(tokens), jnp.asarray(pos), jnp.asarray(temps),
            jnp.asarray(top_ps), sub, table, n_steps=n, k=k,
            attn_len=attn_len, paged=self.paged)
        arr = np.asarray(out_buf)            # (B, n*(k+1))
        counts = np.asarray(n_out)           # (B,)
        accs_np = np.asarray(accs)           # (n, B)
        self.decode_seconds += time.perf_counter() - t0
        for i, s in active:
            # greedy AND sampled slots speculate (token-equality vs
            # rejection-sampling acceptance — both count)
            self.spec_proposed += n * k
            self.spec_accepted += int(accs_np[:, i].sum())
            pos_before = s.pos
            used = self._emit(i, s, [int(t) for t in arr[i, :counts[i]]])
            if used != int(counts[i]):
                self._h_dirty.add(i)
            if s.req is not None or s.lease is not None:
                s.pos = pos_before + used

    def warmup(self):
        """Precompile every program serving can reach — per-slot prefill,
        the (speculative) decode chunk at
        every attention bucket, paged or contiguous — so the first
        connection never hits a remote-compile stall mid-request
        (minutes through the axon tunnel; see Engine.warmup).  Cache rows
        written here are causally dead; call before taking traffic."""
        x = jnp.zeros((self.prefill_chunk, self.cfg.dim), jnp.float32)
        toks = jnp.zeros((self.B,), jnp.int32)
        pos = jnp.zeros((self.B,), jnp.int32)
        temps = jnp.zeros((self.B,), jnp.float32)
        top_ps = jnp.full((self.B,), 0.9, jnp.float32)
        key = jax.random.PRNGKey(0)
        n = self.decode_chunk
        h0 = jnp.full((self.B, self.S + self._slack), -1, jnp.int32)

        def spec_or_decode(attn_len):
            if self.spec_k:
                table = (self._table_dev if self.paged
                         else jnp.zeros((1, 1), jnp.int32))
                out = self._spec_chunk_b(
                    self.params, self.cache, h0, toks, pos, temps, top_ps,
                    key, table, n_steps=n, k=self.spec_k,
                    attn_len=attn_len, paged=self.paged)
                self.cache = out[2]
            elif self.paged:
                _, self.cache = self._decode_chunk_paged(
                    self.params, self.cache, self._table_dev, toks, pos,
                    temps, top_ps, key, n_steps=n)
            else:
                _, self.cache = self._decode_chunk_b(
                    self.params, self.cache, toks, pos, temps, top_ps,
                    key, n_steps=n, attn_len=attn_len)

        if self.paged:
            if not self._ensure_pages(0, self.prefill_chunk):
                return  # pool smaller than one chunk: nothing to warm
            self._table_sync()
            _, self.cache = self._prefill_call(
                0, x, 0, self.prefill_chunk - 1, 0, self.prefill_chunk)
            spec_or_decode(self.maxp * self.psz)
            self._free_slot_pages(0)
            return
        seen = set()
        first_prefill_bucket = self._bucket(self.prefill_chunk)
        b = self._bucket(1)
        while True:
            if b not in seen:
                seen.add(b)
                if b >= first_prefill_bucket:
                    # a full prefill chunk's bucket is always >= the
                    # chunk; smaller buckets only ever run decode
                    _, self.cache = self._prefill_call(
                        0, x, 0, self.prefill_chunk - 1, b,
                        self.prefill_chunk)
                spec_or_decode(b)
            if b >= self.S:
                break
            b = self._bucket(b + 1)

    def run(self, poll: Optional[Callable[[], bool]] = None):
        """Drive until no work remains (poll() False stops early)."""
        while self.has_work():
            self.step()
            if poll is not None and not poll():
                return


class SchedulerThread:
    """Daemon thread driving a BatchScheduler continuously.

    All device-state mutation (prefill, decode, cache) happens on this one
    thread; other threads interact through `submit` and `call` (a job queue
    drained between decode chunks), so the scheduler itself needs no device
    locking.
    """

    def __init__(self, sched: BatchScheduler):
        self.sched = sched
        self._jobs: List[Callable[[], None]] = []
        self._cv = threading.Condition()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, *args, **kw) -> Request:
        req = self.sched.submit(*args, **kw)
        with self._cv:
            self._cv.notify()
        return req

    def call(self, fn: Callable[[], object]):
        """Run fn on the scheduler thread between chunks; returns its
        result (blocking)."""
        done = threading.Event()
        box = {}

        def job():
            try:
                box["result"] = fn()
            except Exception as e:  # surface to caller
                box["error"] = e
            done.set()

        with self._cv:
            self._jobs.append(job)
            self._cv.notify()
        done.wait()
        if "error" in box:
            raise box["error"]
        return box.get("result")

    def shutdown(self):
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._thread.join(timeout=5)

    def _loop(self):
        while True:
            with self._cv:
                while (not self._stop and not self._jobs
                       and not self.sched.has_work()):
                    self._cv.wait()
                if self._stop:
                    return
                jobs, self._jobs = self._jobs, []
            for j in jobs:
                j()
            if self.sched.has_work():
                self.sched.step()
