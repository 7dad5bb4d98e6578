"""Continuous batching over a tensor-parallel mesh: the BatchScheduler's
mesh mode (shard_map bodies, kv heads on the tp axis) must be token-exact
vs the single-device scheduler and the single-stream engine — B concurrent
requests AND each step's matmuls sharded across chips, a combination the
reference cannot express at all (one process per model instance,
reference: src/bin/backend.rs:88-110)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.params import params_from_weights, _quantize_dense
from lmrs_tpu.io.synthetic import random_weights, tiny_config
from lmrs_tpu.parallel.tp import build_tp_params_stacked
from lmrs_tpu.quant import QuantType
from lmrs_tpu.runtime.engine import Engine, GenerationConfig
from lmrs_tpu.serve.scheduler import BatchScheduler

# heavyweight interpret-mode / mesh parity matrix: excluded from the
# default fast run (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow


KW = dict(dim=64, hidden_dim=128, n_layers=2, n_heads=8, head_dim=16,
          n_kv_heads=4, vocab_size=512, seq_len=64, group_size=16,
          matmul_impl="fast")
PROMPTS = [[1, 5, 9], [2, 4], [7, 3, 11, 13]]
N_NEW = 10


def _quantized_tensors(cfg, weights):
    out = {}
    for name, w in weights.items():
        base = name.split("@")[0]
        if base in ("embed", "wq", "wk", "wv", "wo", "w1", "w2", "w3",
                    "lm_head"):
            out[name] = _quantize_dense(cfg, w)
        else:
            out[name] = (w.astype(np.float32), None)
    return out


def _mesh_sched(cfg, weights, tp=2, **kw):
    mesh = Mesh(np.asarray(jax.devices()[:tp]), ("tp",))
    tp_params, spec = build_tp_params_stacked(
        cfg, _quantized_tensors(cfg, weights), mesh)
    return BatchScheduler(cfg, tp_params, mesh=mesh, param_spec=spec,
                          max_ctx=64, cache_dtype=kw.pop("cache_dtype",
                                                         jnp.float32),
                          prefill_chunk=8, decode_chunk=4,
                          min_attn_bucket=32, **kw)


def _run(sched, prompts=PROMPTS, **submit_kw):
    done = {}
    for i, p in enumerate(prompts):
        sched.submit(p, max_new_tokens=N_NEW,
                     on_done=lambda out, i=i: done.setdefault(i, out),
                     **submit_kw)
    sched.run()
    return [done[i] for i in range(len(prompts))]


@pytest.mark.parametrize("mt,qt", [
    (ModelType.GEMMA, QuantType.Q4_0),
    (ModelType.LLAMA, QuantType.Q8_0),
])
def test_mesh_scheduler_matches_single_device(mt, qt):
    cfg = tiny_config(mt, qt, **KW)
    weights = random_weights(cfg, seed=7)
    params = params_from_weights(cfg, weights, stack_layers=True,
                                 fuse_qkv=True)
    want = _run(BatchScheduler(cfg, params, max_batch=4, max_ctx=64,
                               cache_dtype=jnp.float32, prefill_chunk=8,
                               decode_chunk=4, min_attn_bucket=32,
                               temperature=0.0))
    got = _run(_mesh_sched(cfg, weights, tp=2, max_batch=4,
                           temperature=0.0))
    assert got == want, (got, want)


def test_mesh_scheduler_int8_cache():
    """int8 KV cache on the tp mesh: scale planes shard on the head axis
    (B, L, KH/tp, S) and quantization happens per shard-local head."""
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, **KW)
    weights = random_weights(cfg, seed=11)
    params = params_from_weights(cfg, weights, stack_layers=True,
                                 fuse_qkv=True)
    want = _run(BatchScheduler(cfg, params, max_batch=4, max_ctx=64,
                               cache_dtype=jnp.int8, prefill_chunk=8,
                               decode_chunk=4, min_attn_bucket=32,
                               temperature=0.0))
    got = _run(_mesh_sched(cfg, weights, tp=2, max_batch=4,
                           cache_dtype=jnp.int8, temperature=0.0))
    assert got == want, (got, want)


def test_mesh_scheduler_mixed_sampling_greedy_exact():
    """Greedy requests in a batch that also carries sampled requests must
    stay token-exact vs the single-stream engine (per-slot gating inside
    the jitted chunk survives the shard_map wrap)."""
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, **KW)
    weights = random_weights(cfg, seed=13)
    params = params_from_weights(cfg, weights, stack_layers=True,
                                 fuse_qkv=True)
    eng = Engine(cfg, params, cache_dtype=jnp.float32, min_attn_bucket=32,
                 prefill_chunk=8, decode_chunk=4)
    want = eng.generate(PROMPTS[0], GenerationConfig(temperature=0.0,
                                                     max_new_tokens=N_NEW))

    sched = _mesh_sched(cfg, weights, tp=2, max_batch=4, temperature=0.0)
    done = {}
    sched.submit(PROMPTS[0], max_new_tokens=N_NEW, temperature=0.0,
                 on_done=lambda out: done.setdefault("greedy", out))
    sched.submit(PROMPTS[1], max_new_tokens=N_NEW, temperature=0.9,
                 top_p=0.8,
                 on_done=lambda out: done.setdefault("sampled", out))
    sched.run()
    assert done["greedy"] == want, (done["greedy"], want)
    assert len(done["sampled"]) == N_NEW


def test_mesh_scheduler_speculative():
    """Prompt-lookup speculation through the mesh: greedy-exact."""
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, **KW)
    weights = random_weights(cfg, seed=17)
    params = params_from_weights(cfg, weights, stack_layers=True,
                                 fuse_qkv=True)
    want = _run(BatchScheduler(cfg, params, max_batch=4, max_ctx=64,
                               cache_dtype=jnp.float32, prefill_chunk=8,
                               decode_chunk=4, min_attn_bucket=32,
                               temperature=0.0))
    got = _run(_mesh_sched(cfg, weights, tp=2, max_batch=4,
                           temperature=0.0, speculative_k=3))
    assert got == want, (got, want)


def test_mesh_scheduler_prefix_cache():
    """The admission prefix cache's device-side row copy runs per shard;
    forked prompts must still be token-exact.  A leased first request
    keeps its rows resident so the second request's shared prefix forks
    (same shape as test_scheduler.test_prefix_cache_token_exact)."""
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, **KW)
    weights = random_weights(cfg, seed=19)
    shared = list(np.random.default_rng(5).integers(1, 250, size=16))
    p_a = shared + [3, 9]
    p_b = shared + [11, 4]

    def run(sched):
        done = {}
        lease = sched.new_conversation()  # keeps A's rows resident
        sched.submit(p_a, max_new_tokens=6, lease=lease,
                     on_done=lambda o: done.setdefault("a", o))
        sched.run()
        sched.submit(p_b, max_new_tokens=8,
                     on_done=lambda o: done.setdefault("b", o))
        sched.run()
        return done

    params = params_from_weights(cfg, weights, stack_layers=True,
                                 fuse_qkv=True)
    want = run(BatchScheduler(cfg, params, max_batch=4, max_ctx=64,
                              cache_dtype=jnp.float32, prefill_chunk=8,
                              decode_chunk=4, min_attn_bucket=32,
                              temperature=0.0, prefix_cache_min=8))
    sched = _mesh_sched(cfg, weights, tp=2, max_batch=4, temperature=0.0,
                        prefix_cache_min=8)
    got = run(sched)
    assert got == want, (got, want)
    assert sched.prefix_hits == 1
    assert sched.prefix_tokens_saved == len(shared)


# ---------------------------------------------------------------------------
# --batch --cp: the batched contiguous cache's SEQUENCE axis sharded over a
# cp mesh axis — straddle-safe row-exact per-slot writes + the batched flash
# kernel's cross-shard online-softmax (LSE) merge.  Needs a flash-capable
# config (fast impl, 128-lane head dim); max_ctx=96 over cp=2 puts the shard
# boundary at row 64, so the long prompt's decode CROSSES it.
# ---------------------------------------------------------------------------
CP_KW = dict(dim=128, hidden_dim=256, n_layers=2, n_heads=2, head_dim=128,
             n_kv_heads=2, vocab_size=256, seq_len=256, group_size=32,
             matmul_impl="fast")
CP_PROMPTS = [list(np.random.default_rng(3).integers(3, 250, size=70)),
              [2, 4], [7, 3, 11, 13]]
CP_SCHED = dict(max_batch=4, max_ctx=96, prefill_chunk=8, decode_chunk=4,
                min_attn_bucket=32, temperature=0.0)


def _cp_sched(cfg, weights, tp=1, cp=2, **kw):
    from jax.sharding import PartitionSpec as P

    if tp > 1:
        shape = (tp, cp) if cp > 1 else (tp,)
        names = ("tp", "cp") if cp > 1 else ("tp",)
        mesh = Mesh(np.asarray(jax.devices()[:tp * cp]).reshape(*shape),
                    names)
        params, spec = build_tp_params_stacked(
            cfg, _quantized_tensors(cfg, weights), mesh)
    else:
        mesh = Mesh(np.asarray(jax.devices()[:cp]), ("cp",))
        params = params_from_weights(cfg, weights, stack_layers=True,
                                     fuse_qkv=True)
        spec = jax.tree.map(lambda a: P(), params)
    return BatchScheduler(cfg, params, mesh=mesh, param_spec=spec,
                          cache_dtype=kw.pop("cache_dtype", jnp.float32),
                          **{**CP_SCHED, **kw})


def _cp_want(cfg, weights, **kw):
    params = params_from_weights(cfg, weights, stack_layers=True,
                                 fuse_qkv=True)
    return _run(BatchScheduler(
        cfg, params, cache_dtype=kw.pop("cache_dtype", jnp.float32),
        **{**CP_SCHED, **kw}), CP_PROMPTS)


@pytest.mark.parametrize("tp,cp", [(1, 2), (2, 2)])
def test_cp_scheduler_token_parity(tp, cp):
    """Batched decode across a cp-sharded cache — including a slot whose
    context straddles the shard boundary — token-exact vs single-device."""
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, **CP_KW)
    weights = random_weights(cfg, seed=11)
    want = _cp_want(cfg, weights)
    got = _run(_cp_sched(cfg, weights, tp=tp, cp=cp), CP_PROMPTS)
    assert got == want, (got, want)


def test_cp_scheduler_gemma_window():
    """Gemma deltas (softcap + a sliding window SMALLER than the context)
    through the cp-batched path: the flash start-block skip computes
    shard-local block indices from global window rows, and shards wholly
    behind the window contribute w=0 in the LSE merge."""
    cfg = tiny_config(ModelType.GEMMA, QuantType.Q8_0, sliding_window=48,
                      **CP_KW)
    weights = random_weights(cfg, seed=11)
    want = _cp_want(cfg, weights)
    got = _run(_cp_sched(cfg, weights), CP_PROMPTS)
    assert got == want, (got, want)


def test_cp_scheduler_int8_cache():
    """int8 KV on the cp mesh: sequence-last scale planes shard on cp."""
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, **CP_KW)
    weights = random_weights(cfg, seed=11)
    want = _cp_want(cfg, weights, cache_dtype=jnp.int8)
    got = _run(_cp_sched(cfg, weights, cache_dtype=jnp.int8), CP_PROMPTS)
    assert got == want, (got, want)


def test_cp_scheduler_speculative():
    """Batched prompt-lookup speculation over cp: multi-token verify
    windows straddle the shard boundary (row-exact split writes)."""
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, **CP_KW)
    weights = random_weights(cfg, seed=11)
    want = _cp_want(cfg, weights)
    got = _run(_cp_sched(cfg, weights, speculative_k=3), CP_PROMPTS)
    assert got == want, (got, want)


def test_cp_scheduler_prefix_cache():
    """The admission prefix-cache row copy masks on GLOBAL row indices
    under cp (each shard owns rows [r*s_loc, (r+1)*s_loc))."""
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, **CP_KW)
    weights = random_weights(cfg, seed=11)
    shared = list(np.random.default_rng(5).integers(3, 250, size=16))
    p_a = shared + [3, 9]
    p_b = shared + [11, 4]

    def run(sched):
        done = {}
        lease = sched.new_conversation()
        sched.submit(p_a, max_new_tokens=6, lease=lease,
                     on_done=lambda o: done.setdefault("a", o))
        sched.run()
        sched.submit(p_b, max_new_tokens=8,
                     on_done=lambda o: done.setdefault("b", o))
        sched.run()
        return done

    params = params_from_weights(cfg, weights, stack_layers=True,
                                 fuse_qkv=True)
    want = run(BatchScheduler(cfg, params, cache_dtype=jnp.float32,
                              prefix_cache_min=8, **CP_SCHED))
    sched = _cp_sched(cfg, weights, prefix_cache_min=8)
    got = run(sched)
    assert got == want, (got, want)
    assert sched.prefix_hits == 1
    assert sched.prefix_tokens_saved == len(shared)


def test_cp_scheduler_rejects_paged():
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, **CP_KW)
    weights = random_weights(cfg, seed=11)
    params = params_from_weights(cfg, weights, stack_layers=True,
                                 fuse_qkv=True)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("cp",))
    with pytest.raises(ValueError, match="pool-tokens"):
        BatchScheduler(cfg, params, mesh=mesh,
                       param_spec=jax.tree.map(lambda a: None, params),
                       pool_tokens=256, **CP_SCHED)


def test_mesh_scheduler_prefill_embeds():
    """A float embedding prefix (multimodal image path) into a mesh
    scheduler's leased slot: token-exact vs the single-device scheduler."""
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, **KW)
    weights = random_weights(cfg, seed=29)
    embeds = np.random.default_rng(1).normal(
        size=(6, cfg.dim)).astype(np.float32)

    def run(sched):
        done = {}
        lease = sched.new_conversation()
        sched.prefill_embeds(lease, embeds)
        sched.submit(PROMPTS[0], max_new_tokens=8, lease=lease,
                     on_done=lambda o: done.setdefault("x", o))
        sched.run()
        return done["x"]

    params = params_from_weights(cfg, weights, stack_layers=True,
                                 fuse_qkv=True)
    want = run(BatchScheduler(cfg, params, max_batch=4, max_ctx=64,
                              cache_dtype=jnp.float32, prefill_chunk=8,
                              decode_chunk=4, min_attn_bucket=32,
                              temperature=0.0))
    got = run(_mesh_sched(cfg, weights, tp=2, max_batch=4,
                          temperature=0.0))
    assert got == want, (got, want)
