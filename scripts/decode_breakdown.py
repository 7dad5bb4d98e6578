"""Round-5 decode-time breakdown at gemma2-9b shapes (T=1, K-major).

The K-major VPU matvec probe priced the matmul stream at 1083 G values/s
(120 tok/s ceiling), but the engine measured 64.3 tok/s (15.6 ms/tok).
This script times the production components SEPARATELY on-chip to locate
the missing ~7 ms:

  mm_chain   42-layer scan of the four layer matmuls via qmatmul_kmajor
             (the production dispatch incl. activation prep + layer
             scalar-prefetch) — per-token matmul time at the model's real
             group size (128, not the probe's 256)
  cls        the tied-classifier matvec (256000 x 3584)
  attn       42-layer scan of flash_decode_stacked at attn_len=8192,
             pos~1100, bf16 cache (live-clamp block skipping active)
  glue       residual = engine ms/tok (pass via --engine-ms) minus the above

MEASUREMENT RULES (learned the hard way, results_r5/timing_cache_note.md):
1. this platform CACHES repeat executions whose input values are unchanged —
   a timed chain must thread a per-call-varying seed through every
   computation (acc = 1e-6*sum(y), seeded from the call counter) or repeat
   calls return in ~0 s and the "measurement" is the cache, not the chip.
2. `jax.block_until_ready` is NOT a reliable completion barrier through the
   remote-execution tunnel (validated /tmp/timing_probe5.py: 6 chained
   data-dependent 8192^3 matmuls "complete" in 0.3 ms under
   block_until_ready but 66 ms under host fetch).  Time by HOST-FETCHING
   the scalar result (float(np.asarray(...))), and difference a LONG chain
   against a SHORT chain of the same program so the fetch/dispatch constant
   cancels.

Sweeps LMRS_VM_OTILE (512/1024/2048) for mm_chain, and group size 128 vs
256 to price the probe's gs gap.

Usage: python scripts/decode_breakdown.py [--quick] [--engine-ms=15.57]
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_SHORT, N_LONG = 2, 8   # chain lengths; per-token = (t_long - t_short) / 6

# gemma2-9b layer shapes: wqkv, wo, w13, w2
LAYER_SHAPES = [(8192, 3584), (3584, 4096), (28672, 3584), (3584, 14336)]
L = 42
VOCAB, DIM = 256000, 3584
KVROW = 8 * 256

_seed_counter = [0]


def _next_seed():
    _seed_counter[0] += 1
    return jnp.int32(_seed_counter[0])


def _fetch(x):
    return float(np.asarray(x))


def _measure(prog, *args):
    """Median of 3 length-delta samples, each timed by HOST FETCH of the
    scalar result; every call gets a FRESH seed so the platform's
    value-keyed execution cache cannot serve repeats (prog must take
    (seed, n, *args) with static n)."""
    for n in (N_SHORT, N_LONG):       # compile + first-execution warm
        _fetch(prog(_next_seed(), n, *args))
    samples = []
    for _ in range(3):
        t0 = time.time()
        _fetch(prog(_next_seed(), N_SHORT, *args))
        t1 = time.time()
        _fetch(prog(_next_seed(), N_LONG, *args))
        t2 = time.time()
        samples.append(((t2 - t1) - (t1 - t0)) / (N_LONG - N_SHORT))
    return float(np.median(samples))


def _rand_kmajor(rng, o, n, gs, o_tile, layers):
    """Random packed-Q4 K-major stacked QTensor (bytes are arbitrary —
    timing only; value distribution is irrelevant to the stream rate)."""
    from lmrs_tpu.kernels.vpu_matvec import to_kmajor
    from lmrs_tpu.quant import QTensor, QuantType

    q = jnp.asarray(rng.integers(0, 255, (layers, o, n // 2), np.uint8))
    s = jnp.asarray(rng.normal(0, 0.01, (layers, o, n // gs))
                    .astype(np.float32))
    qt = QTensor(q, s, QuantType.Q4_0, gs, o, n)
    km = to_kmajor(qt, o_tile=o_tile)
    jax.block_until_ready((km.q, km.s))
    return km


def mm_chain_prog():
    """One 'token' = scan over 42 layers x 4 matmuls.  Every matmul input
    carries a value-varying term (1e-6 * previous sum, seeded per call)
    so no subcomputation repeats a previous call's input values."""
    from lmrs_tpu.kernels.vpu_matvec import qmatmul_kmajor

    @partial(jax.jit, static_argnames=("n",))
    def prog(seed, n, ws, xs):
        def tok(c, _):
            def layer(cl, l):
                acc = cl
                for w, x in zip(ws, xs):
                    y = qmatmul_kmajor(x + acc, w, l)
                    acc = 1e-6 * jnp.sum(y)
                return acc, None
            acc, _ = jax.lax.scan(layer, c, jnp.arange(L, dtype=jnp.int32))
            return acc, None
        c, _ = jax.lax.scan(tok, seed.astype(jnp.float32) * 1e-4, length=n)
        return c
    return prog


def main():
    quick = "--quick" in sys.argv
    engine_ms = None
    for a in sys.argv[1:]:
        if a.startswith("--engine-ms="):
            engine_ms = float(a.split("=")[1])
    rng = np.random.default_rng(0)
    dev = jax.devices()
    print(f"== decode_breakdown dev={dev}", flush=True)
    vals_layers = sum(o * n for o, n in LAYER_SHAPES) * L

    results = {}

    # ---- mm_chain at gs=128 across o-tile sizes (default first)
    for o_tile in ([512] if quick else [512, 1024, 2048]):
        ws = [_rand_kmajor(rng, o, n, 128, o_tile, L)
              for o, n in LAYER_SHAPES]
        xs = [jnp.asarray(rng.normal(0, 1, (1, n)).astype(np.float32))
              for _, n in LAYER_SHAPES]
        dt = _measure(mm_chain_prog(), ws, xs)
        gv = vals_layers / dt / 1e9
        results[f"mm_gs128_ot{o_tile}"] = dt
        print(json.dumps({"path": f"mm_chain gs=128 o_tile={o_tile}",
                          "ms_per_tok": round(dt * 1e3, 2),
                          "gvals_per_s": round(gv, 1)}), flush=True)
        del ws
    # ---- gs=256 comparison (the probe's setting)
    if not quick:
        ws = [_rand_kmajor(rng, o, n, 256, 512, L) for o, n in LAYER_SHAPES]
        xs = [jnp.asarray(rng.normal(0, 1, (1, n)).astype(np.float32))
              for _, n in LAYER_SHAPES]
        dt = _measure(mm_chain_prog(), ws, xs)
        results["mm_gs256_ot512"] = dt
        print(json.dumps({"path": "mm_chain gs=256 o_tile=512",
                          "ms_per_tok": round(dt * 1e3, 2),
                          "gvals_per_s": round(vals_layers / dt / 1e9, 1)}),
              flush=True)
        del ws

    # ---- classifier
    from lmrs_tpu.kernels.vpu_matvec import qmatmul_kmajor
    cls_w = _rand_kmajor(rng, VOCAB, DIM, 128, 512, 1)
    xc = jnp.asarray(rng.normal(0, 1, (1, DIM)).astype(np.float32))

    @partial(jax.jit, static_argnames=("n",))
    def cls_prog(seed, n, w, x):
        def tok(c, _):
            y = qmatmul_kmajor(x + c, w, 0)
            return 1e-6 * jnp.sum(y), None
        c, _ = jax.lax.scan(tok, seed.astype(jnp.float32) * 1e-4, length=n)
        return c

    dt = _measure(cls_prog, cls_w, xc)
    results["cls"] = dt
    print(json.dumps({"path": "classifier 256000x3584",
                      "ms_per_tok": round(dt * 1e3, 2),
                      "gvals_per_s": round(VOCAB * DIM / dt / 1e9, 1)}),
          flush=True)
    del cls_w

    # ---- attention chain (bf16 stacked cache, bucket 8192, pos ~1100)
    from lmrs_tpu.kernels.flash_attention import flash_decode_stacked
    S = 8192
    kc = jnp.asarray(rng.normal(0, 1, (L, S, KVROW)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    vc = jnp.asarray(rng.normal(0, 1, (L, S, KVROW)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    q = jnp.asarray(rng.normal(0, 1, (1, 16, 256)).astype(np.float32))
    pos = jnp.int32(1104)

    @partial(jax.jit, static_argnames=("n",))
    def attn_prog(seed, n, q, kc, vc):
        def tok(c, _):
            def layer(cl, l):
                o = flash_decode_stacked(
                    q + cl, kc, vc, l, pos, n_kv=8, attn_len=S,
                    scale=1 / 16.0, softcap=50.0)
                return 1e-6 * jnp.sum(o), None
            cl, _ = jax.lax.scan(layer, c, jnp.arange(L, dtype=jnp.int32))
            return cl, None
        c, _ = jax.lax.scan(tok, seed.astype(jnp.float32) * 1e-4, length=n)
        return c

    dt = _measure(attn_prog, q, kc, vc)
    results["attn"] = dt
    print(json.dumps({"path": "flash_decode x42 (pos=1104, bucket 8192)",
                      "ms_per_tok": round(dt * 1e3, 2)}), flush=True)

    known = results.get("mm_gs128_ot512", 0) + results["cls"] + results["attn"]
    summary = {"mm_ms": round(results.get("mm_gs128_ot512", 0) * 1e3, 2),
               "cls_ms": round(results["cls"] * 1e3, 2),
               "attn_ms": round(results["attn"] * 1e3, 2),
               "sum_ms": round(known * 1e3, 2)}
    if engine_ms:
        summary["engine_ms"] = engine_ms
        summary["glue_ms"] = round(engine_ms - known * 1e3, 2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
