"""AOT precompilation of the serving programs, overlapped with model load.

Cold start on a remote-attached TPU is dominated by two serial costs:
streaming multi-GB weights from disk to HBM (~2-3 min for gemma-2-9b) and
compiling the big jitted programs (~100 s each through the axon tunnel).
Compilation only needs SHAPES — so this module lowers and compiles the
exact program set an Engine run will execute, on a background thread,
from jax.ShapeDtypeStruct trees, while the weights stream in parallel.

The compiled executables land in the persistent compilation cache
(runtime.compile_cache, verified working across processes on the axon
backend: 6.2 s first compile -> 0.05 s in a second process), so the later
real call deserializes from disk instead of recompiling.  The reference
has no analogue (its "compile" is cargo build; its load is one mmap,
reference: src/transformer.rs:134-145).
"""

from __future__ import annotations

import threading
from typing import List, Optional

import jax
import jax.numpy as jnp

from lmrs_tpu.config import ModelConfig, ModelType
from lmrs_tpu.quant import QTensor, QuantType


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def _qt_sds(cfg: ModelConfig, out_f: int, in_f: int,
            stacked: bool, kmajor: bool = False) -> QTensor:
    """ShapeDtypeStruct QTensor matching io.params._qtensor's runtime
    layout (packed Q4 bytes are uint8 after the device repack; Q8 int8).
    kmajor mirrors kernels.vpu_matvec.to_kmajor's tiled layout."""
    if kmajor and cfg.quant != QuantType.NONE:
        from lmrs_tpu.kernels.vpu_matvec import kmajor_o_shape

        L = cfg.n_layers if stacked else 1
        o_t, o_pad = kmajor_o_shape(out_f)
        n_o = o_pad // o_t
        kb = in_f // 2 if cfg.quant == QuantType.Q4_0 else in_f
        dt = jnp.uint8 if cfg.quant == QuantType.Q4_0 else jnp.int8
        return QTensor(_sds((L, n_o, kb, o_t), dt),
                       _sds((L, n_o, in_f // cfg.group_size, o_t),
                            jnp.float32),
                       cfg.quant, cfg.group_size, out_f, in_f, kmajor=True)
    lead = (cfg.n_layers,) if stacked else ()
    if cfg.quant == QuantType.NONE:
        return QTensor(_sds(lead + (out_f, in_f), jnp.float32), None,
                       QuantType.NONE, cfg.group_size, out_f, in_f)
    if cfg.quant == QuantType.Q4_0:
        q = _sds(lead + (out_f, in_f // 2), jnp.uint8)
    else:
        q = _sds(lead + (out_f, in_f), jnp.int8)
    s = _sds(lead + (out_f, in_f // cfg.group_size), jnp.float32)
    return QTensor(q, s, cfg.quant, cfg.group_size, out_f, in_f)


def params_shapes(cfg: ModelConfig, kmajor: bool = False):
    """TransformerParams ShapeDtypeStruct tree for the scan-fast layout
    (stack_layers=True, fuse_qkv=True — the serving default built by
    io.params.params_from_lmrs / bench.py's "scan" layout); kmajor=True
    mirrors the K-major decode layout (kernels.vpu_matvec.kmajor_params)."""
    from lmrs_tpu.models.transformer import LayerWeights, TransformerParams

    L, D, H = cfg.n_layers, cfg.dim, cfg.hidden_dim
    A, KV, V = cfg.att_dim, cfg.kv_dim, cfg.vocab_size
    gemma = cfg.model_type == ModelType.GEMMA
    norm = _sds((L, D), jnp.float32)
    layers = LayerWeights(
        att_norm=norm, wq=None, wk=None, wv=None,
        wo=_qt_sds(cfg, D, A, True, kmajor),
        post_att_norm=norm,
        pre_ffn_norm=norm if gemma else None,
        w1=None, w2=_qt_sds(cfg, D, H, True, kmajor), w3=None,
        post_ffn_norm=norm if gemma else None,
        wqkv=_qt_sds(cfg, A + 2 * KV, D, True, kmajor),
        w13=_qt_sds(cfg, 2 * H, D, True, kmajor),
    )
    lm_head = (_qt_sds(cfg, V, D, False, kmajor)
               if cfg.model_type == ModelType.PHI else None)
    half = cfg.head_dim // 2
    return TransformerParams(
        embed=_qt_sds(cfg, V, D, False, kmajor),
        layers=layers,
        final_norm=_sds((D,), jnp.float32),
        lm_head=lm_head,
        rope_cos=_sds((cfg.seq_len, half), jnp.float32),
        rope_sin=_sds((cfg.seq_len, half), jnp.float32),
    )


def cache_shapes(cfg: ModelConfig, cache_dtype):
    from lmrs_tpu.models.transformer import init_kv_cache

    return jax.eval_shape(lambda: init_kv_cache(cfg, cache_dtype))


def single_stream_plan(cfg: ModelConfig, prompt_len: int, max_new: int,
                       min_attn_bucket: int, prefill_chunk: int,
                       decode_chunk: int, cache_dtype):
    """(prefill_jobs, decode_buckets): the exact (chunk_len, attn_len)
    prefill programs and decode-chunk attn buckets one Engine.generate of
    `prompt_len` + `max_new` tokens executes (mirrors Engine.prefill_embeds
    and Engine.generate's dispatch loop)."""
    from lmrs_tpu.runtime.engine import _next_pow2, attn_bucket

    bucket = lambda needed: attn_bucket(cfg, needed, min_attn_bucket,
                                        prefill_chunk, cache_dtype)
    prefill_jobs = set()
    attn_all = bucket(prompt_len)
    off = 0
    while off < prompt_len:
        chunk = min(prefill_chunk,
                    _next_pow2(prompt_len - off, 8, prefill_chunk))
        prefill_jobs.add((chunk, attn_all))
        off += chunk
    decode_buckets = set()
    # mirror generate()'s dispatch loop: the first sampled token comes from
    # prefill logits (emitted=1); each chunk dispatches at pos_before and
    # needs bucket(pos_before + n); dispatch stops when the budget or the
    # context would be exceeded
    emitted, p = 1, prompt_len
    while emitted < max_new and p + decode_chunk < cfg.seq_len:
        decode_buckets.add(bucket(p + decode_chunk))
        p += decode_chunk
        emitted += decode_chunk
    return sorted(prefill_jobs), sorted(decode_buckets)


def prewarm_kernels(cfg: ModelConfig, cache_dtype, prefill_chunk: int = 256,
                    log=None):
    """Execute every Mosaic kernel specialization the serving programs
    contain, standalone on zero-filled buffers.

    On the axon backend the client persistent cache removes XLA
    recompiles, but Mosaic custom-call kernels are (re)built server-side
    at FIRST EXECUTION in every process (measured: the full bench warmup
    stayed ~200 s with every program a verified persistent-cache hit,
    while a later program sharing the same kernels starts in seconds).
    The kernel builds are cached per process and keyed by the kernel, not
    the enclosing program — so executing each specialization here, on
    buffers that need no model weights, moves that cost onto the load
    overlap.  Each scratch tensor is freed before the next (peak extra
    HBM ~2.2 GB for gemma-9b)."""
    import time

    import numpy as np

    from lmrs_tpu.ops.matmul import qmatmul

    if cfg.quant == QuantType.NONE or cfg.matmul_impl != "fast":
        return
    D, H = cfg.dim, cfg.hidden_dim
    A, KV, V, L = cfg.att_dim, cfg.kv_dim, cfg.vocab_size, cfg.n_layers
    gs = cfg.group_size

    def zqt(o, n, stacked=True):
        lead = (L,) if stacked else ()
        if cfg.quant == QuantType.Q4_0:
            q = jnp.zeros(lead + (o, n // 2), jnp.uint8)
        else:
            q = jnp.zeros(lead + (o, n), jnp.int8)
        s = jnp.zeros(lead + (o, n // gs), jnp.float32)
        return QTensor(q, s, cfg.quant, gs, o, n)

    t0 = time.time()
    shapes = [(A + 2 * KV, D), (D, A), (2 * H, D), (D, H)]
    for t in sorted({1, prefill_chunk}):
        for o, n in shapes:
            qt = zqt(o, n)
            x = jnp.zeros((t, n), jnp.float32)
            f = jax.jit(lambda x, qt: qmatmul(x, qt, "fast",
                                              layer_idx=jnp.int32(0)))
            float(jnp.sum(f(x, qt)))
            del qt, x
    cls = zqt(V, D, stacked=False)
    f = jax.jit(lambda x, qt: qmatmul(x, qt, "fast"))
    float(jnp.sum(f(jnp.zeros((1, D), jnp.float32), cls)))
    del cls
    if log:
        log(f"prewarmed xe kernels in {time.time() - t0:.0f}s")

    # the flash kernels (decode T=1 and prefill-chunk specializations)
    from lmrs_tpu.models.transformer import _flash_eligible

    if not _flash_eligible(cfg, 1, cfg.seq_len):
        return
    t0 = time.time()
    from lmrs_tpu.kernels.flash_attention import flash_decode_stacked

    hd = cfg.cache_head_dim
    kv_m = cfg.n_kv_heads * hd
    store = jnp.int8 if cache_dtype in (jnp.int8, "int4") else cache_dtype
    packed4 = cache_dtype == "int4"
    k = jnp.zeros((L, cfg.seq_len, kv_m // 2 if packed4 else kv_m), store)
    v = jnp.zeros_like(k)
    ks = vs = None
    if store == jnp.int8:
        ks = jnp.zeros((L, cfg.n_kv_heads, cfg.seq_len), jnp.float32)
        vs = jnp.zeros_like(ks)
    for t in sorted({1, prefill_chunk}):
        if not _flash_eligible(cfg, t, cfg.seq_len):
            continue
        q = jnp.zeros((t, cfg.n_heads, hd), jnp.float32)
        f = jax.jit(lambda q, k, v, ks, vs: flash_decode_stacked(
            q, k, v, jnp.int32(0), jnp.int32(2 * t),
            n_kv=cfg.n_kv_heads, attn_len=cfg.seq_len,
            scale=cfg.attn_scale, softcap=cfg.attn_logit_softcap,
            window=cfg.sliding_window, k_scale=ks, v_scale=vs,
            packed4=packed4))
        float(jnp.sum(f(q, k, v, ks, vs)))
        del q
    del k, v, ks, vs
    if log:
        log(f"prewarmed flash kernels in {time.time() - t0:.0f}s")


def precompile_single_stream(
    cfg: ModelConfig,
    cache_dtype,
    prompt_len: int,
    max_new: int,
    *,
    min_attn_bucket: int = 256,
    prefill_chunk: int = 256,
    decode_chunk: int = 8,
    temperature: float = 0.0,
    top_p: float = 0.9,
    log=None,
    kmajor: bool = False,
) -> threading.Thread:
    """Start a daemon thread AOT-compiling every program a single-stream
    Engine.generate(prompt_len, max_new) run will execute (scan-fast
    layout).  Returns the thread; join() it before first use — by then
    the real calls hit the persistent cache instead of compiling."""
    from lmrs_tpu.runtime.compile_cache import enable_compilation_cache
    from lmrs_tpu.runtime.engine import _compiled_fns

    enable_compilation_cache()
    p_sh = params_shapes(cfg, kmajor=kmajor)
    c_sh = cache_shapes(cfg, cache_dtype)
    prefill_jobs, decode_buckets = single_stream_plan(
        cfg, prompt_len, max_new, min_attn_bucket, prefill_chunk,
        decode_chunk, cache_dtype)
    embed, step, dchunk = _compiled_fns(cfg)
    i32 = _sds((), jnp.int32)
    key = jax.eval_shape(lambda: jax.random.PRNGKey(0))

    def work():
        import time
        # NOTE: prewarm_kernels is deliberately NOT called here — its
        # client-side tracing starves the (1-core) host loader and its
        # executions serialize against the load's device transfers
        # (measured: load 45 s -> 885 s with it in this thread).  It
        # remains an opt-in for multi-core hosts; engine/scheduler
        # warmup() covers the same kernel builds once params are loaded.
        for chunk, attn in prefill_jobs:
            t0 = time.time()
            step.lower(p_sh, c_sh, _sds((chunk, cfg.dim), jnp.float32),
                       i32, i32, attn_len=attn).compile()
            if log:
                log(f"precompiled prefill({chunk}, attn={attn}) "
                    f"in {time.time() - t0:.0f}s")
        for b in decode_buckets:
            t0 = time.time()
            dchunk.lower(p_sh, c_sh, i32, i32, key,
                         n_steps=decode_chunk, attn_len=b,
                         temperature=temperature, top_p=top_p).compile()
            if log:
                log(f"precompiled decode_chunk(attn={b}) "
                    f"in {time.time() - t0:.0f}s")

    th = threading.Thread(target=work, daemon=True)
    th.start()
    return th
