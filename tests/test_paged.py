"""Paged KV cache: the batched scheduler over a shared page pool.

Pool memory is sum-of-contexts (pool_tokens rows) instead of
B x max-context; per-slot page tables are scalar-prefetched into the
batched flash kernel, whose body is unchanged (a page IS a sequence
block).  The reference preallocates nothing because it has no batched
serving at all (one model instance per connection,
src/bin/backend.rs:88-110); the contiguous batched cache this replaces
is serve/scheduler.py's own round-2 design.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.params import params_from_weights
from lmrs_tpu.io.synthetic import random_weights, tiny_config
from lmrs_tpu.quant import QuantType
from lmrs_tpu.serve.scheduler import BatchScheduler

# heavyweight interpret-mode / mesh parity matrix: excluded from the
# default fast run (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow


KW = dict(dim=128, hidden_dim=256, n_layers=2, n_heads=2, n_kv_heads=2,
          head_dim=128, vocab_size=256, group_size=32, seq_len=256,
          matmul_impl="fast")
PROMPTS = [[1, 5, 9], [2, 4], [7, 3, 11, 13]]
N_NEW = 10


@pytest.fixture(autouse=True)
def _flash_everywhere(monkeypatch):
    """The paged path ALWAYS runs the (bf16) flash kernel; parity
    baselines must use the same attention numerics, so drop the flash
    threshold to cover every bucket the contiguous reference touches
    (greedy argmaxes on random-weight tiny models flip on bf16-vs-XLA
    skew otherwise — same device-numerics caveat as .claude/skills/
    verify/SKILL.md notes for CPU vs TPU)."""
    monkeypatch.setenv("LMRS_FLASH_MIN_BUCKET", "32")


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config(ModelType.GEMMA, QuantType.Q8_0, **KW)
    params = params_from_weights(cfg, random_weights(cfg, seed=3),
                                 stack_layers=True, fuse_qkv=True)
    return cfg, params


def _sched(cfg, params, paged, **kw):
    base = dict(max_batch=4, max_ctx=128, cache_dtype=jnp.float32,
                prefill_chunk=8, decode_chunk=4, min_attn_bucket=32,
                temperature=0.0)
    base.update(kw)
    if paged:
        base.setdefault("page_size", 64)
        base.setdefault("pool_tokens", 4 * 128)
    return BatchScheduler(cfg, params, **base)


def _run(sched, prompts=PROMPTS, n_new=N_NEW):
    done = {}
    for i, p in enumerate(prompts):
        sched.submit(p, max_new_tokens=n_new,
                     on_done=lambda o, i=i: done.setdefault(i, o))
    sched.run()
    return [done.get(i) for i in range(len(prompts))]


def test_paged_matches_contiguous(model):
    cfg, params = model
    want = _run(_sched(cfg, params, paged=False))
    sched = _sched(cfg, params, paged=True)
    got = _run(sched)
    assert got == want, (got, want)
    # all pages recycled once every request finished
    assert all(not s.pages for s in sched.slots)
    assert len(sched._free_pages) == sched.n_pages - 1
    assert not sched._table.any()


def test_paged_int8_cache(model):
    cfg, params = model
    want = _run(_sched(cfg, params, paged=False, cache_dtype=jnp.int8))
    got = _run(_sched(cfg, params, paged=True, cache_dtype=jnp.int8))
    assert got == want, (got, want)


def test_paged_staggered_admission(model):
    """A request admitted mid-flight reuses freed pages and must produce
    the same tokens as it does alone."""
    cfg, params = model
    alone = _run(_sched(cfg, params, paged=True), prompts=[PROMPTS[2]])

    sched = _sched(cfg, params, paged=True, max_batch=2)
    done = {}
    sched.submit(PROMPTS[0], max_new_tokens=N_NEW,
                 on_done=lambda o: done.setdefault(0, o))
    sched.submit(PROMPTS[1], max_new_tokens=N_NEW,
                 on_done=lambda o: done.setdefault(1, o))
    # third request waits for a slot, then lands on recycled pages
    sched.submit(PROMPTS[2], max_new_tokens=N_NEW,
                 on_done=lambda o: done.setdefault(2, o))
    sched.run()
    assert done[2] == alone[0], (done[2], alone[0])


def test_paged_pool_smaller_than_dense(model):
    """The capacity win: 4 slots x 128 max-ctx would preallocate 512 rows
    contiguously; a 256-row pool serves all 4 short requests because
    their ACTUAL contexts fit."""
    cfg, params = model
    prompts = [[i + 1, i + 5] for i in range(4)]
    sched = _sched(cfg, params, paged=True, pool_tokens=256)
    assert (sched.n_pages - 1) * sched.psz == 256
    got = _run(sched, prompts=prompts, n_new=8)
    assert all(len(o) == 8 for o in got), got


def test_paged_backpressure(model):
    """When the pool runs dry mid-decode the youngest-checked slot
    finishes with an error and frees its pages; survivors complete."""
    cfg, params = model
    # pool of 2 usable pages (128 rows); two requests each wanting ~80
    # rows of context cannot BOTH grow past their first page
    sched = _sched(cfg, params, paged=True, page_size=64, pool_tokens=128,
                   max_batch=2)
    done = {}
    reqs = [sched.submit(list(np.arange(2 + i, 50 + i) % 200),
                         max_new_tokens=40,
                         on_done=lambda o, i=i: done.setdefault(i, o))
            for i in range(2)]
    sched.run()
    assert sorted(done.keys()) == [0, 1]
    errs = [r.error for r in reqs]
    outs = [len(done[i]) for i in range(2)]
    # at least one finished early with the pool error, and at least one
    # ran to completion on the freed pages
    assert any(e and "pool exhausted" in e for e in errs), errs
    assert any(n == 40 for n in outs), (outs, errs)
    assert len(sched._free_pages) == sched.n_pages - 1


def test_paged_lease_multiturn(model):
    """Leased conversations keep their pages across turns; end_conversation
    returns them to the pool."""
    cfg, params = model
    sched = _sched(cfg, params, paged=True)
    lease = sched.new_conversation()
    done = {}
    sched.submit([1, 5, 9], max_new_tokens=6, lease=lease,
                 on_done=lambda o: done.setdefault("a", o))
    sched.run()
    held = list(sched.slots[lease.slot_idx].pages)
    assert held, "leased slot must keep its pages between turns"
    sched.submit([8, 2], max_new_tokens=6, lease=lease,
                 on_done=lambda o: done.setdefault("b", o))
    sched.run()
    assert sched.slots[lease.slot_idx].pages[: len(held)] == held
    sched.end_conversation(lease)
    assert not sched.slots[lease.slot_idx].pages
    assert len(sched._free_pages) == sched.n_pages - 1

    # parity: the same two turns on a contiguous-cache scheduler
    ref = _sched(cfg, params, paged=False)
    rl = ref.new_conversation()
    rdone = {}
    ref.submit([1, 5, 9], max_new_tokens=6, lease=rl,
               on_done=lambda o: rdone.setdefault("a", o))
    ref.run()
    ref.submit([8, 2], max_new_tokens=6, lease=rl,
               on_done=lambda o: rdone.setdefault("b", o))
    ref.run()
    assert done == rdone, (done, rdone)


def test_paged_oversized_prompt_errors(model):
    """A prompt larger than the whole (idle) pool fails cleanly instead
    of deadlocking the admission loop."""
    cfg, params = model
    sched = _sched(cfg, params, paged=True, page_size=64,
                   pool_tokens=128, max_ctx=256)
    done = {}
    req = sched.submit(list(np.arange(1, 201) % 200), max_new_tokens=4,
                       on_done=lambda o: done.setdefault("x", o))
    sched.run()
    assert req.error and "pool" in req.error, req.error
    assert "x" in done


def test_paged_rejects_unsupported(model):
    cfg, params = model
    bad = cfg.replace(matmul_impl="exact")
    with pytest.raises(ValueError, match="fast kernel"):
        BatchScheduler(bad, params, pool_tokens=256)


def test_paged_speculative(model):
    """Prompt-lookup speculation over the paged pool: the t_q=k+1 verify
    windows write through the page table (row-wise, straddle-safe) and
    greedy outputs stay token-exact vs the contiguous spec scheduler."""
    cfg, params = model
    want = _run(_sched(cfg, params, paged=False, speculative_k=3))
    sched = _sched(cfg, params, paged=True, speculative_k=3)
    got = _run(sched)
    assert got == want, (got, want)
    assert len(sched._free_pages) == sched.n_pages - 1


def test_paged_speculative_sampled_slots(model):
    """Sampled (rejection-sampling) slots ride the paged spec chunk too:
    a mixed greedy+sampled batch over the pool keeps the greedy slot
    token-exact vs the contiguous spec scheduler, the sampled slot fills
    its budget, and pages recycle on finish."""
    cfg, params = model

    def run(paged):
        sched = _sched(cfg, params, paged=paged, speculative_k=3, seed=9)
        done = {}
        sched.submit([5, 9, 5, 9, 5], max_new_tokens=N_NEW,
                     on_done=lambda o: done.setdefault("g", o))
        sched.submit([2, 4, 8], max_new_tokens=N_NEW, temperature=0.9,
                     top_p=0.8, on_done=lambda o: done.setdefault("s", o))
        sched.run()
        return done, sched

    want, _ = run(paged=False)
    got, sched = run(paged=True)
    assert got["g"] == want["g"], (got["g"], want["g"])
    assert len(got["s"]) == N_NEW
    assert sched.spec_proposed > 0
    assert len(sched._free_pages) == sched.n_pages - 1


def test_paged_prefix_fork(model):
    """Paged prefix cache: full prefix pages are SHARED (refcounted,
    read-only), only the partial boundary page is copied; forked prompts
    stay token-exact vs the contiguous scheduler's row-copy fork."""
    cfg, params = model
    shared = list(np.random.default_rng(5).integers(1, 250, size=70))
    p_a = shared + [3, 9]
    p_b = shared + [11, 4]

    def run(sched):
        done = {}
        lease = sched.new_conversation()   # keeps A's rows resident
        sched.submit(p_a, max_new_tokens=6, lease=lease,
                     on_done=lambda o: done.setdefault("a", o))
        sched.run()
        sched.submit(p_b, max_new_tokens=8,
                     on_done=lambda o: done.setdefault("b", o))
        sched.run()
        return done, lease

    want, _ = run(_sched(cfg, params, paged=False, prefix_cache_min=16))
    sched = _sched(cfg, params, paged=True, page_size=64,
                   pool_tokens=8 * 64, prefix_cache_min=16)
    got, lease = run(sched)
    assert got == want, (got, want)
    assert sched.prefix_hits == 1
    assert sched.prefix_tokens_saved == len(shared)
    # 70 shared rows = 1 full shared page + 1 copied boundary page; the
    # forked request already finished, releasing its hold — the donor's
    # lease still owns the page
    donor = sched.slots[lease.slot_idx]
    assert sched._page_refs[donor.pages[0]] == 1
    sched.end_conversation(lease)
    assert len(sched._free_pages) == sched.n_pages - 1
    assert not sched._page_refs[1:].any()


def test_paged_prefix_fork_page_aligned(model):
    """A page-aligned prefix forks with ZERO copying (pure sharing)."""
    cfg, params = model
    shared = list(np.random.default_rng(6).integers(1, 250, size=64))

    sched = _sched(cfg, params, paged=True, page_size=64,
                   pool_tokens=8 * 64, prefix_cache_min=16)
    done = {}
    lease = sched.new_conversation()
    sched.submit(shared + [7], max_new_tokens=4, lease=lease,
                 on_done=lambda o: done.setdefault("a", o))
    sched.run()
    donor_pages = list(sched.slots[lease.slot_idx].pages)
    sched.submit(shared + [13, 2], max_new_tokens=4,
                 on_done=lambda o: done.setdefault("b", o))
    sched.run()
    assert sched.prefix_hits == 1
    assert sched.prefix_tokens_saved == 64
    # during the fork the first donor page was shared; by completion the
    # forked slot released it — donor still holds it
    assert sched._page_refs[donor_pages[0]] == 1
    assert len(done["b"]) == 4


def test_paged_pad_overhang_costs_no_page(model):
    """Prefill pads chunks to pow-2, but pad rows land in the trash page:
    a turn whose REAL rows fit the slot's held page must not demand a
    second page (review finding: padded _ensure_pages killed exactly-
    fitting turns with PoolExhausted)."""
    cfg, params = model
    # pool of exactly 2 pages; two leases each permanently hold one
    sched = _sched(cfg, params, paged=True, page_size=64, pool_tokens=128,
                   max_batch=2)
    la = sched.new_conversation()
    lb = sched.new_conversation()
    done = {}
    sched.submit(list(np.arange(1, 53) % 200), max_new_tokens=5, lease=la,
                 on_done=lambda o: done.setdefault("a", o))
    sched.submit([1, 2, 3], max_new_tokens=4, lease=lb,
                 on_done=lambda o: done.setdefault("b", o))
    sched.run()
    assert len(done["a"]) == 5, done
    # lease A sits at pos 56; free pages = 0.  A 4-token turn (padded to
    # 8 rows, crossing nothing real) must still run: rows 56..60 fit A's
    # page, the pad overhang is trash-paged
    sched.submit([9, 8, 7, 6], max_new_tokens=1, lease=la,
                 on_done=lambda o: done.setdefault("a2", o))
    sched.run()
    assert "a2" in done and len(done["a2"]) == 1, done


def test_paged_admission_reserves_staged_prefills(model):
    """Two prompts submitted together must not race for the same free
    pages: the second defers until the first finishes (review finding:
    both were staged and the FIRST died with PoolExhausted)."""
    cfg, params = model
    sched = _sched(cfg, params, paged=True, page_size=64, pool_tokens=128,
                   max_batch=2, max_ctx=128)
    done = {}
    reqs = [sched.submit(list(np.arange(2 + i, 102 + i) % 200),
                         max_new_tokens=4,
                         on_done=lambda o, i=i: done.setdefault(i, o))
            for i in range(2)]
    sched.run()
    assert sorted(done.keys()) == [0, 1]
    assert all(r.error is None for r in reqs), [r.error for r in reqs]
    assert all(len(done[i]) == 4 for i in range(2)), done


def test_paged_rejects_small_page_size(model):
    cfg, params = model
    with pytest.raises(ValueError, match="page_size"):
        BatchScheduler(cfg, params, pool_tokens=256, page_size=32,
                       prefill_chunk=64)


def test_paged_int4_pool_matches_engine(model):
    """int4 paged pool (nibble-packed pages, half the lanes): greedy
    tokens match the single-stream engine's int4 cache (the same
    quantize-rows + in-kernel unpack math, paged vs stacked kernel)."""
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig

    cfg = tiny_config(ModelType.GEMMA, QuantType.Q8_0, dim=128,
                      hidden_dim=256, n_layers=2, n_heads=2, n_kv_heads=2,
                      head_dim=256, vocab_size=256, group_size=32,
                      seq_len=256, matmul_impl="fast")
    params = params_from_weights(cfg, random_weights(cfg, seed=9),
                                 stack_layers=True, fuse_qkv=True)
    prompt = [1, 5, 9, 2]
    eng = Engine(cfg, params, cache_dtype="int4", min_attn_bucket=32,
                 prefill_chunk=8, decode_chunk=4)
    want = eng.generate(prompt, GenerationConfig(temperature=0.0,
                                                 max_new_tokens=N_NEW))

    sched = BatchScheduler(cfg, params, max_batch=2, max_ctx=128,
                           cache_dtype="int4", prefill_chunk=8,
                           decode_chunk=4, min_attn_bucket=32,
                           temperature=0.0, page_size=64,
                           pool_tokens=256)
    done = {}
    sched.submit(prompt, max_new_tokens=N_NEW,
                 on_done=lambda o: done.setdefault("x", o))
    sched.run()
    assert done["x"] == want, (done["x"], want)
    # int4 pool really is half the lanes
    kv_m = cfg.n_kv_heads * cfg.cache_head_dim
    assert sched.cache.k.shape[-1] == kv_m // 2


def test_paged_int4_pair_hd128_matches_engine(model):
    """hd-128 int4 pool (head-PAIR nibble packing, VERDICT r3 next #8):
    llama/phi head geometry is now eligible for the int4 paged pool —
    greedy tokens match the single-stream int4 engine (same pair
    quantization, stacked vs paged kernel)."""
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig

    cfg, params = model   # cache_head_dim = 128, n_kv_heads = 2 (even)
    prompt = [1, 5, 9, 2]
    eng = Engine(cfg, params, cache_dtype="int4", min_attn_bucket=32,
                 prefill_chunk=8, decode_chunk=4)
    want = eng.generate(prompt, GenerationConfig(temperature=0.0,
                                                 max_new_tokens=N_NEW))
    assert len(want) == N_NEW

    sched = BatchScheduler(cfg, params, max_batch=2, max_ctx=128,
                           cache_dtype="int4", prefill_chunk=8,
                           decode_chunk=4, min_attn_bucket=32,
                           temperature=0.0, page_size=64,
                           pool_tokens=256)
    done = {}
    sched.submit(prompt, max_new_tokens=N_NEW,
                 on_done=lambda o: done.setdefault("x", o))
    sched.run()
    assert done["x"] == want, (done["x"], want)
    kv_m = cfg.n_kv_heads * cfg.cache_head_dim
    assert sched.cache.k.shape[-1] == kv_m // 2


def test_paged_int4_rejects_odd_narrow_heads():
    """An odd kv-head count at hd 128 has no lane-aligned int4 packing —
    the pool must reject it loudly."""
    kw = dict(KW, n_heads=1, n_kv_heads=1)
    cfg = tiny_config(ModelType.GEMMA, QuantType.Q8_0, **kw)
    params = params_from_weights(cfg, random_weights(cfg, seed=3),
                                 stack_layers=True, fuse_qkv=True)
    with pytest.raises(ValueError, match="kv-head"):
        BatchScheduler(cfg, params, cache_dtype="int4", pool_tokens=256)


def test_paged_tp_mesh(model):
    """Paged pool x tensor parallelism: the pool's merged head-lane axis
    shards on tp exactly like the contiguous cache (local pools hold the
    local heads' lanes of the SAME page ids; the table replicates).
    Token-exact vs the single-device paged scheduler."""
    import jax
    from jax.sharding import Mesh
    from lmrs_tpu.io.params import _quantize_dense
    from lmrs_tpu.parallel.tp import build_tp_params_stacked

    cfg, params = model
    weights = random_weights(cfg, seed=3)   # same seed as `model`
    want = _run(_sched(cfg, params, paged=True))

    tensors = {}
    for name, w in weights.items():
        base = name.split("@")[0]
        if base in ("embed", "wq", "wk", "wv", "wo", "w1", "w2", "w3",
                    "lm_head"):
            tensors[name] = _quantize_dense(cfg, w)
        else:
            tensors[name] = (w.astype(np.float32), None)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("tp",))
    tp_params, spec = build_tp_params_stacked(cfg, tensors, mesh)
    sched = BatchScheduler(cfg, tp_params, mesh=mesh, param_spec=spec,
                           max_batch=4, max_ctx=128,
                           cache_dtype=jnp.float32, prefill_chunk=8,
                           decode_chunk=4, min_attn_bucket=32,
                           temperature=0.0, page_size=64,
                           pool_tokens=4 * 128)
    got = _run(sched)
    assert got == want, (got, want)
    assert len(sched._free_pages) == sched.n_pages - 1


def test_paged_warmup_state_neutral(model):
    """Paged warmup precompiles, returns its scratch pages, and leaves
    token streams unchanged."""
    cfg, params = model
    want = _run(_sched(cfg, params, paged=True))
    sched = _sched(cfg, params, paged=True, speculative_k=2)
    sched.warmup()
    assert len(sched._free_pages) == sched.n_pages - 1
    sched2 = _sched(cfg, params, paged=True)
    sched2.warmup()
    got = _run(sched2)
    assert got == want, (got, want)


def test_paged_window_page_recycling():
    """Sliding-window page release (VERDICT r3 weak #6): a windowed slot
    decoding past several windows keeps pool occupancy O(window) — pages
    wholly behind the window return to the pool mid-stream — and the pool
    can be SMALLER than the context, with token-exact output vs the
    contiguous cache."""
    kw = dict(KW, sliding_window=32, seq_len=256)
    cfg = tiny_config(ModelType.GEMMA, QuantType.Q8_0, **kw)
    params = params_from_weights(cfg, random_weights(cfg, seed=3),
                                 stack_layers=True, fuse_qkv=True)
    n_new = 150
    want = _run(_sched(cfg, params, paged=False, max_ctx=256),
                prompts=[PROMPTS[0]], n_new=n_new)[0]
    assert len(want) == n_new

    # 6 usable pages x 16 rows = 96 pool rows << the ~153-row context:
    # without window freeing this request dies with PoolExhausted
    sched = _sched(cfg, params, paged=True, max_ctx=256, page_size=16,
                   pool_tokens=96)
    done = {}
    req = sched.submit(PROMPTS[0], max_new_tokens=n_new,
                       on_done=lambda o: done.setdefault("x", o))
    max_held = 0
    while sched.has_work():
        sched.step()
        held = sum(1 for s in sched.slots for p in s.pages if p)
        max_held = max(max_held, held)
    assert req.error is None, req.error
    assert done["x"] == want, (done["x"][:10], want[:10])
    # occupancy bound: window (32) + in-flight chunk rows, in 16-row pages
    assert max_held <= sched._max_live_pages(256), max_held
    # everything returned once the request finished
    assert len(sched._free_pages) == sched.n_pages - 1
    assert not sched._table.any()


def test_window_freed_slot_not_prefix_donor():
    """A slot whose leading pages were window-freed must not donate a
    prefix fork (the rows are gone from the pool)."""
    kw = dict(KW, sliding_window=32, seq_len=256)
    cfg = tiny_config(ModelType.GEMMA, QuantType.Q8_0, **kw)
    params = params_from_weights(cfg, random_weights(cfg, seed=3),
                                 stack_layers=True, fuse_qkv=True)
    prompt = list(np.arange(1, 41) % 200)
    alone = _run(_sched(cfg, params, paged=True, max_ctx=256, page_size=16,
                        pool_tokens=240, prefix_cache_min=8),
                 prompts=[prompt], n_new=60)[0]

    sched = _sched(cfg, params, paged=True, max_ctx=256, page_size=16,
                   pool_tokens=240, prefix_cache_min=8, max_batch=2)
    lease = sched.new_conversation()
    done = {}
    sched.submit(prompt, max_new_tokens=60, lease=lease,
                 on_done=lambda o: done.setdefault("a", o))
    sched.run()
    donor = sched.slots[lease.slot_idx]
    assert donor.win_freed > 0, "donor should have window-freed pages"
    # same-prompt follower: would fork the donor's prefix if it could
    sched.submit(prompt, max_new_tokens=60,
                 on_done=lambda o: done.setdefault("b", o))
    sched.run()
    assert sched.prefix_hits == 0
    assert done["b"] == alone, (done["b"][:10], alone[:10])
