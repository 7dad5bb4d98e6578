"""Data-parallel scaling measurement: aggregate decode tok/s vs dp width.

BASELINE.md's north star asks for ≥85% scaling efficiency across chips and
hosts.  On real hardware this script measures it directly; in this
environment it runs on the virtual CPU mesh (numbers are NOT TPU
throughput, but the sharding/collective structure is the real one and the
efficiency ratio exposes replication bugs — e.g. a dp axis that secretly
serializes).

Usage:
  JAX_PLATFORMS=cpu JAX_NUM_CPU_DEVICES=8 python scripts/scaling_probe.py [dp_list]
  (on a pod: python scripts/scaling_probe.py 1,2,4 — tp fills the rest)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    dp_list = [int(v) for v in
               (sys.argv[1] if len(sys.argv) > 1 else "1,2,4").split(",")]

    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.models.transformer import (KVCache, embed_tokens, forward,
                                             init_kv_cache)
    from lmrs_tpu.parallel.sharding import make_mesh, tp_param_shardings
    from lmrs_tpu.quant import QuantType

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}", flush=True)

    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, dim=256,
                      hidden_dim=512, n_layers=4, n_heads=8, head_dim=32,
                      n_kv_heads=4, vocab_size=1024, seq_len=256,
                      group_size=32)
    weights = random_weights(cfg, seed=0)

    S, STEPS, ATTN = 256, 32, 64
    results = {}
    for dp in dp_list:
        if dp > n_dev:
            continue
        tp = n_dev // dp
        mesh = make_mesh(tp=tp, dp=dp, devices=jax.devices()[: dp * tp])
        params = params_from_weights(cfg, weights,
                                     shardings=tp_param_shardings(cfg, mesh))
        batch = dp  # one stream per dp replica
        c0 = init_kv_cache(cfg, jnp.float32)
        cache = KVCache(
            k=jax.device_put(jnp.broadcast_to(c0.k, (batch,) + c0.k.shape),
                             NamedSharding(mesh, P("dp"))),
            v=jax.device_put(jnp.broadcast_to(c0.v, (batch,) + c0.v.shape),
                             NamedSharding(mesh, P("dp"))))

        def one(params, cache, tok, pos):
            x = embed_tokens(params, cfg, tok[None])
            logits, cache = forward(params, cfg, cache, x, pos, ATTN,
                                    jnp.int32(0))
            return jnp.argmax(logits).astype(jnp.int32), cache

        @jax.jit
        def decode_n(params, cache, toks, pos):
            def step(carry, _):
                toks, cache, p = carry
                toks, cache = jax.vmap(one, in_axes=(None, 0, 0, None))(
                    params, cache, toks, p)
                return (toks, cache, p + 1), None

            (toks, cache, _), _ = jax.lax.scan(
                step, (toks, cache, pos), length=STEPS)
            return toks, cache

        toks = jax.device_put(jnp.ones((batch,), jnp.int32),
                              NamedSharding(mesh, P("dp")))
        out, cache = decode_n(params, cache, toks, jnp.int32(1))
        jax.block_until_ready(out)  # compile
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out, cache = decode_n(params, cache, out, jnp.int32(1))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        agg = batch * STEPS / dt
        results[dp] = agg
        print(f"dp={dp} tp={tp}: {agg:8.1f} aggregate tok/s "
              f"({STEPS} steps x {batch} streams in {dt * 1000:.0f} ms)",
              flush=True)

    base_dp = dp_list[0]
    if base_dp in results:
        for dp, agg in results.items():
            eff = agg / (results[base_dp] * dp / base_dp) * 100
            print(f"dp={dp}: scaling efficiency {eff:.0f}% vs dp={base_dp}")


if __name__ == "__main__":
    main()
