"""Worker for the 2-process jax.distributed test (run by test_multihost.py).

Each process owns 4 virtual CPU devices; together they form a (dp=2, tp=4)
global mesh — process boundaries stand in for hosts, so the psum/all-gather
traffic crosses the distributed runtime exactly like DCN would.
"""

import os
import sys

if __name__ == "__main__":
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from lmrs_tpu.parallel.distributed import (global_mesh,
                                               initialize_multihost)

    initialize_multihost(coordinator=coord, num_processes=n_proc,
                         process_id=pid)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    mesh = global_mesh(tp=4)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {"dp": 2, "tp": 4}

    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.params import params_from_weights
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.models.transformer import (embed_tokens, forward,
                                             init_kv_cache)
    from lmrs_tpu.parallel.sharding import cache_sharding, tp_param_shardings
    from lmrs_tpu.quant import QuantType

    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, dim=64,
                      hidden_dim=128, n_layers=2, n_heads=8, head_dim=16,
                      n_kv_heads=4, vocab_size=512, seq_len=64,
                      group_size=16)
    params = params_from_weights(cfg, random_weights(cfg, seed=11),
                                 shardings=tp_param_shardings(cfg, mesh))
    cache = init_kv_cache(cfg, jnp.float32,
                          sharding=cache_sharding(cfg, mesh))

    tokens = jnp.asarray([1, 7, 42, 9], jnp.int32)

    @jax.jit
    def step(params, cache, tokens):
        x = embed_tokens(params, cfg, tokens)
        logits, cache = forward(params, cfg, cache, x, jnp.int32(0), 32,
                                jnp.int32(3))
        return jnp.argmax(logits), cache

    tok, cache = step(params, cache, tokens)
    out = int(jax.device_get(tok))
    print(f"WORKER_RESULT {pid} {out}", flush=True)
