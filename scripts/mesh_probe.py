"""Multi-chip decode throughput through the mesh ENGINE (tp / cp / tpcp).

Measures tok/s for each requested mesh shape via the product surface —
`parallel.tp.make_mesh_engine` → `Engine.generate` — the exact path the
`--tp/--cp` flags of bench.py / cli.chat / serve.backend build.  On a TPU
pod this is the real multi-chip serving measurement (BASELINE.md north
star: >=85% scaling efficiency); on the virtual CPU mesh the wall-clock is
NOT TPU throughput (the Pallas kernels run in interpret mode there) but
the run validates that every mesh shape executes end-to-end through the
engine and shows gross structural pathologies (a shape that serializes or
recompiles per step shows up as a far-out-of-family number).

The reference has no multi-chip surface to compare against (SURVEY.md §2);
the baseline here is the tp=1 cp=1 single-device engine on the same model.

Usage:
  JAX_PLATFORMS=cpu JAX_NUM_CPU_DEVICES=8 python scripts/mesh_probe.py \
      [1x1,4x1,1x4,2x2]            # tpxcp list
  LMRS_PROBE_LMRS=/path/model.lmrs python scripts/mesh_probe.py 4x1,8x1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.lmrs import read_lmrs, write_lmrs
    from lmrs_tpu.io.params import params_from_lmrs
    from lmrs_tpu.io.synthetic import random_weights, tiny_config
    from lmrs_tpu.parallel.tp import make_mesh_engine
    from lmrs_tpu.quant import QuantType
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig

    shapes = [tuple(int(v) for v in s.split("x")) for s in
              (sys.argv[1] if len(sys.argv) > 1 else "1x1,4x1,1x4,2x2")
              .split(",")]
    n_dev = len(jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    print(f"devices: {n_dev} x {jax.devices()[0].platform}"
          + ("" if on_tpu else "  [CPU mesh: wall-clock is interpret-mode,"
             " NOT TPU throughput]"), flush=True)

    path = os.environ.get("LMRS_PROBE_LMRS")
    if path is None:
        # tiny but structurally full model (GQA, fused qkv/gate-up, Q8)
        cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, dim=256,
                          hidden_dim=512, n_layers=4, n_heads=8,
                          head_dim=32, n_kv_heads=4, vocab_size=1024,
                          seq_len=256, group_size=32, matmul_impl="fast")
        path = "/tmp/mesh_probe.lmrs"
        if not os.path.exists(path):
            write_lmrs(path, cfg, random_weights(cfg, seed=0))
    f = read_lmrs(path)

    N_NEW, PROMPT = 48, [1, 5, 9, 2]
    gen = GenerationConfig(temperature=0.0, max_new_tokens=N_NEW)
    results = {}
    base_out = None
    for tp, cp in shapes:
        if tp * cp > n_dev:
            print(f"tp={tp} cp={cp}: skipped (needs {tp * cp} devices)")
            continue
        if tp > 1 and f.cfg.n_kv_heads % tp:
            print(f"tp={tp} cp={cp}: skipped (kv heads % tp)")
            continue
        if tp == 1 and cp == 1:
            eng = Engine(f.cfg, params_from_lmrs(f), decode_chunk=8,
                         prefill_chunk=8, min_attn_bucket=32)
        else:
            eng = make_mesh_engine(f, tp=tp, cp=cp, decode_chunk=8,
                                   prefill_chunk=8, min_attn_bucket=32)
        out = eng.generate(PROMPT, gen)          # compile + first run
        if base_out is None:
            base_out = out
        elif out != base_out:
            # greedy parity across mesh shapes is tested in
            # tests/test_engine_mesh.py; flag loudly if a shape drifts
            print(f"tp={tp} cp={cp}: TOKEN MISMATCH vs baseline", flush=True)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            eng.reset()
            eng.generate(PROMPT, gen)
        dt = (time.perf_counter() - t0) / reps
        tok_s = N_NEW / dt
        results[(tp, cp)] = tok_s
        print(f"tp={tp} cp={cp}: {tok_s:8.1f} tok/s single-stream "
              f"({N_NEW} tokens in {dt * 1000:.0f} ms)", flush=True)

    if (1, 1) in results and on_tpu:
        for (tp, cp), ts in results.items():
            if tp * cp > 1:
                print(f"tp={tp} cp={cp}: latency speedup "
                      f"{ts / results[(1, 1)]:.2f}x vs single chip")

    # ---- batched scheduler over the tp mesh (--batch --tp surface) ------
    from lmrs_tpu.parallel.tp import make_mesh_scheduler
    from lmrs_tpu.serve.scheduler import BatchScheduler

    B = int(os.environ.get("LMRS_PROBE_BATCH", "4"))
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(3, f.cfg.vocab_size - 1, size=4))
               for _ in range(B)]

    def run_sched(sched):
        done = []
        for p in prompts:
            sched.submit(p, max_new_tokens=N_NEW,
                         on_done=lambda o: done.append(o))
        t0 = time.perf_counter()
        sched.run()
        return done, time.perf_counter() - t0

    for tp in sorted({tp for tp, cp in shapes if cp == 1}):
        if tp * 1 > n_dev or (tp > 1 and f.cfg.n_kv_heads % tp):
            continue
        kw = dict(max_batch=B, max_ctx=f.cfg.seq_len, decode_chunk=8,
                  prefill_chunk=8, min_attn_bucket=32, temperature=0.0)
        if tp == 1:
            sched = BatchScheduler(f.cfg, params_from_lmrs(
                f, stack_layers=True, fuse_qkv=True), **kw)
        else:
            sched = make_mesh_scheduler(f, tp=tp, **kw)
        run_sched(sched)                     # compile
        outs, dt = run_sched(sched)
        total = sum(len(o) for o in outs)
        print(f"batched B={B} tp={tp}: {total / dt:8.1f} tok/s aggregate "
              f"({total} tokens in {dt * 1000:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
