"""dp-replica serving: the ReplicaRouter over per-replica schedulers.

The reference's serving concurrency is one model per connection on one
CPU (src/bin/backend.rs:88-110); the router multiplies the batched
scheduler across disjoint device groups.  Greedy outputs must be
replica-independent (same params everywhere), so routing is invisible in
the tokens.
"""

import os
import tempfile

import jax
import numpy as np
import pytest

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.lmrs import read_lmrs, write_lmrs
from lmrs_tpu.io.synthetic import random_weights, tiny_config
from lmrs_tpu.quant import QuantType
from lmrs_tpu.serve.replicas import ReplicaRouter

# heavyweight interpret-mode / mesh parity matrix: excluded from the
# default fast run (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow


KW = dict(dim=128, hidden_dim=256, n_layers=2, n_heads=2, n_kv_heads=2,
          head_dim=128, vocab_size=256, group_size=32, seq_len=128,
          matmul_impl="fast")
PROMPTS = [[1, 5, 9], [2, 4], [7, 3, 11, 13], [9, 9], [4, 1, 6], [12, 8]]
SCHED_KW = dict(max_batch=2, max_ctx=64, prefill_chunk=8, decode_chunk=4,
                min_attn_bucket=32, temperature=0.0)


@pytest.fixture(scope="module")
def lmrs_file():
    cfg = tiny_config(ModelType.GEMMA, QuantType.Q8_0, **KW)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.lmrs")
        write_lmrs(path, cfg, random_weights(cfg, seed=3))
        f = read_lmrs(path)
        # the .lmrs header carries no runtime knobs (bench.py does the same)
        f.cfg = f.cfg.replace(matmul_impl="fast")
        yield f


def _run(router, prompts=PROMPTS, n_new=8):
    done = {}
    for i, p in enumerate(prompts):
        router.submit(p, max_new_tokens=n_new,
                      on_done=lambda o, i=i: done.setdefault(i, o))
    router.run()
    return [done.get(i) for i in range(len(prompts))]


def test_router_matches_single_replica(lmrs_file):
    want = _run(ReplicaRouter(lmrs_file, dp=1, **SCHED_KW))
    assert all(len(o) == 8 for o in want)
    got = _run(ReplicaRouter(lmrs_file, dp=4, **SCHED_KW))
    assert got == want, (got, want)


def test_router_spreads_load(lmrs_file):
    router = ReplicaRouter(lmrs_file, dp=2, **SCHED_KW)
    for p in PROMPTS:
        router.submit(p, max_new_tokens=4)
    loads = [router._load(r) for r in router.replicas]
    assert loads == [3, 3], loads
    router.run()
    assert router.tokens_emitted == 4 * len(PROMPTS)
    emitted = [r.tokens_emitted for r in router.replicas]
    assert all(e > 0 for e in emitted), emitted


def test_router_dp_over_tp(lmrs_file):
    """dp=2 replicas, each a tp=2 Megatron mesh — 4 devices total."""
    want = _run(ReplicaRouter(lmrs_file, dp=1, **SCHED_KW),
                prompts=PROMPTS[:4])
    got = _run(ReplicaRouter(lmrs_file, dp=2, tp=2, **SCHED_KW),
               prompts=PROMPTS[:4])
    assert got == want, (got, want)


def test_router_leases_pin_replica(lmrs_file):
    router = ReplicaRouter(lmrs_file, dp=2, **SCHED_KW)
    lease = router.new_conversation()
    done = {}
    router.submit(PROMPTS[0], lease=lease, max_new_tokens=4,
                  on_done=lambda o: done.setdefault("a", o))
    router.run()
    slot = router.replicas[lease.replica].slots[lease.lease.slot_idx]
    pos_after_first = slot.pos
    assert pos_after_first > 0
    router.submit(PROMPTS[1], lease=lease, max_new_tokens=4,
                  on_done=lambda o: done.setdefault("b", o))
    router.run()
    assert slot.pos > pos_after_first  # same slot continued
    router.end_conversation(lease)
    assert slot.lease is None

    # parity vs a single scheduler's two-turn lease
    ref = ReplicaRouter(lmrs_file, dp=1, **SCHED_KW)
    rl = ref.new_conversation()
    rdone = {}
    ref.submit(PROMPTS[0], lease=rl, max_new_tokens=4,
               on_done=lambda o: rdone.setdefault("a", o))
    ref.run()
    ref.submit(PROMPTS[1], lease=rl, max_new_tokens=4,
               on_done=lambda o: rdone.setdefault("b", o))
    ref.run()
    assert done == rdone, (done, rdone)


def test_router_paged_replicas(lmrs_file):
    """The paged pool composes per replica (each has its own pool)."""
    want = _run(ReplicaRouter(lmrs_file, dp=1, **SCHED_KW))
    got = _run(ReplicaRouter(lmrs_file, dp=2, page_size=32,
                             pool_tokens=128, **SCHED_KW))
    assert got == want, (got, want)


def test_router_device_budget(lmrs_file):
    with pytest.raises(ValueError, match="needs"):
        ReplicaRouter(lmrs_file, dp=len(jax.devices()) + 1, **SCHED_KW)


def test_router_run_threaded_interleaves(lmrs_file):
    """run_threaded (the bench --dp driver) steps replicas on concurrent
    threads: step events from different replicas interleave in wall order
    (the aggregate decode_seconds = max() metric assumes exactly this),
    and the tokens match the single-threaded router."""
    import threading

    want = _run(ReplicaRouter(lmrs_file, dp=2, **SCHED_KW))

    router = ReplicaRouter(lmrs_file, dp=2, **SCHED_KW)
    events = []
    lock = threading.Lock()
    for idx, rep in enumerate(router.replicas):
        orig = rep.step

        def step(orig=orig, idx=idx):
            with lock:
                events.append(idx)
            return orig()
        rep.step = step

    done = {}
    for i, p in enumerate(PROMPTS):
        router.submit(p, max_new_tokens=8,
                      on_done=lambda o, i=i: done.setdefault(i, o))
    router.run_threaded()
    got = [done.get(i) for i in range(len(PROMPTS))]
    assert got == want

    # both replicas stepped, and their events interleave (at least one
    # 0->1->0 or 1->0->1 transition pair — a serialized drain would be
    # 000...111 with exactly one transition)
    assert set(events) == {0, 1}, events
    transitions = sum(1 for a, b in zip(events, events[1:]) if a != b)
    assert transitions >= 2, events
