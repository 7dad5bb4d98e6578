"""Data-parallel scaling measurement: aggregate decode tok/s vs dp width,
through the SERVING configuration (the scheduler's batched decode step).

BASELINE.md's north star asks for ≥85% scaling efficiency across chips and
hosts.  On real hardware this script measures it directly; in this
environment it runs on the virtual CPU mesh (numbers are NOT TPU
throughput, but the sharding/collective structure is the real one and the
efficiency ratio exposes replication bugs — e.g. a dp axis that secretly
serializes).

What runs per replica is models.transformer.forward_batched — the exact
step serve/scheduler.py dispatches — with the batch axis sharded over dp.
On TPU the fast (Pallas scan-fast) layout is used; on the CPU mesh the
exact XLA path stands in (the Pallas kernels only exist compiled for TPU;
interpret mode would measure the interpreter, not the sharding).

Usage:
  JAX_PLATFORMS=cpu JAX_NUM_CPU_DEVICES=8 python scripts/scaling_probe.py [dp_list]
  (on a pod: python scripts/scaling_probe.py 1,2,4,8)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main():
    dp_list = [int(v) for v in
               (sys.argv[1] if len(sys.argv) > 1 else "1,2,4").split(",")]

    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.models.transformer import (KVCache, embed_tokens,
                                             forward_batched)
    from lmrs_tpu.ops.sampling import sample_batched
    from lmrs_tpu.quant import QuantType

    n_dev = len(jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    impl = "fast" if on_tpu else "exact"
    print(f"devices: {n_dev} x {jax.devices()[0].platform} (impl={impl})",
          flush=True)

    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, dim=256,
                      hidden_dim=512, n_layers=4, n_heads=8, head_dim=32,
                      n_kv_heads=4, vocab_size=1024, seq_len=256,
                      group_size=32, matmul_impl=impl)
    weights = random_weights(cfg, seed=0)
    params = params_from_weights(cfg, weights, stack_layers=True,
                                 fuse_qkv=(impl == "fast"))

    STEPS, ATTN = 32, 64
    per_replica = 4  # serving batch per dp replica
    results = {}
    for dp in dp_list:
        if dp > n_dev:
            continue
        mesh = Mesh(np.asarray(jax.devices()[:dp]), ("dp",))
        batch = dp * per_replica
        shape = (batch, cfg.n_layers, cfg.seq_len,
                 cfg.n_kv_heads * cfg.cache_head_dim)
        csh = NamedSharding(mesh, P("dp"))
        cache = KVCache(k=jax.device_put(jnp.zeros(shape, jnp.float32), csh),
                        v=jax.device_put(jnp.zeros(shape, jnp.float32), csh))
        temps = jax.device_put(jnp.zeros((batch,), jnp.float32),
                               NamedSharding(mesh, P("dp")))
        top_ps = jax.device_put(jnp.full((batch,), 0.9, jnp.float32),
                                NamedSharding(mesh, P("dp")))

        @jax.jit
        def decode_n(params, cache, toks, pos, key):
            def step(carry, _):
                toks, cache, p, key = carry
                x = embed_tokens(params, cfg, toks)
                logits, cache = forward_batched(params, cfg, cache, x, p,
                                                ATTN)
                key, sub = jax.random.split(key)
                nxt = sample_batched(logits, temps, top_ps, sub)
                return (nxt, cache, p + 1, key), None

            (toks, cache, _, _), _ = jax.lax.scan(
                step, (toks, cache, pos, key), length=STEPS)
            return toks, cache

        toks = jax.device_put(jnp.ones((batch,), jnp.int32),
                              NamedSharding(mesh, P("dp")))
        pos = jax.device_put(jnp.ones((batch,), jnp.int32),
                             NamedSharding(mesh, P("dp")))
        key = jax.random.PRNGKey(0)
        out, cache = decode_n(params, cache, toks, pos, key)
        jax.block_until_ready(out)  # compile
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out, cache = decode_n(params, cache, out, pos, key)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        agg = batch * STEPS / dt
        results[dp] = agg
        print(f"dp={dp} (B={batch}): {agg:8.1f} aggregate tok/s "
              f"({STEPS} steps x {batch} streams in {dt * 1000:.0f} ms)",
              flush=True)

    base_dp = dp_list[0]
    if base_dp in results:
        for dp, agg in results.items():
            eff = agg / (results[base_dp] * dp / base_dp) * 100
            print(f"dp={dp}: scaling efficiency {eff:.0f}% vs dp={base_dp}")


if __name__ == "__main__":
    main()
