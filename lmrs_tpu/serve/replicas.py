"""Data-parallel serving: N scheduler replicas behind one router.

The reference's whole concurrency story is one model instance per
WebSocket connection on one CPU (reference: src/bin/backend.rs:88-110).
The TPU-native multiplied form: `dp` independent continuous-batching
schedulers (serve.scheduler.BatchScheduler), each owning a disjoint
device group of `tp` chips with its own replicated/sharded parameter
copy, behind a least-loaded router.  Aggregate throughput scales with
dp because the replicas share NOTHING device-side — no collective, no
lock, no cross-replica traffic; ICI stays dedicated to each replica's
tensor parallelism.

Every scheduler feature composes unchanged per replica (paged pool,
speculation, leases, prefix cache, int8/int4 caches) — the router's only
job is placement: requests go to the least-loaded replica, conversations
pin to the replica holding their KV.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import numpy as np

from lmrs_tpu.serve.scheduler import BatchScheduler, Lease, Request


@dataclasses.dataclass
class RouterLease:
    """A conversation lease pinned to one replica (its KV lives there)."""

    replica: int
    lease: Lease


class ReplicaRouter:
    """dp BatchScheduler replicas over disjoint `tp`-chip device groups."""

    def __init__(self, f, dp: int, tp: int = 1, devices=None, **sched_kw):
        """f: a parsed .lmrs file (io.lmrs.read_lmrs).  Builds dp
        schedulers, replica i on devices[i*tp:(i+1)*tp] as a ("tp",) mesh
        (tp=1 is a one-device mesh — same code path, placement pinned).
        Parameters are assembled per replica (each group holds its own
        copy — dp multiplies HBM, that's the point)."""
        import jax
        from jax.sharding import Mesh

        from lmrs_tpu.parallel.tp import build_tp_params_stacked

        if dp < 1:
            raise ValueError(f"dp must be >= 1, got {dp}")
        devices = list(devices if devices is not None else jax.devices())
        need = dp * tp
        if len(devices) < need:
            raise ValueError(f"dp={dp} x tp={tp} needs {need} devices, "
                             f"have {len(devices)}")
        self.cfg = f.cfg
        self.replicas: List[BatchScheduler] = []
        for i in range(dp):
            group = devices[i * tp:(i + 1) * tp]
            mesh = Mesh(np.asarray(group), ("tp",))
            params, spec = build_tp_params_stacked(f.cfg, f.tensors, mesh)
            self.replicas.append(
                BatchScheduler(f.cfg, params, mesh=mesh, param_spec=spec,
                               **sched_kw))

    # -- routing ---------------------------------------------------------
    def _load(self, r: BatchScheduler) -> int:
        return (r.active + len(r.waiting)
                + sum(1 for s in r.slots if s.pending is not None))

    def _pick(self) -> int:
        return min(range(len(self.replicas)),
                   key=lambda i: self._load(self.replicas[i]))

    def submit(self, prompt: Sequence[int],
               lease: Optional[RouterLease] = None, **kw) -> Request:
        """Route to the lease's replica, else the least-loaded one."""
        if lease is not None:
            return self.replicas[lease.replica].submit(
                prompt, lease=lease.lease, **kw)
        return self.replicas[self._pick()].submit(prompt, **kw)

    def new_conversation(self) -> Optional[RouterLease]:
        """Lease a slot on the least-loaded replica that has one free."""
        for i in sorted(range(len(self.replicas)),
                        key=lambda i: self._load(self.replicas[i])):
            lease = self.replicas[i].new_conversation()
            if lease is not None:
                return RouterLease(replica=i, lease=lease)
        return None

    def end_conversation(self, lease: RouterLease):
        self.replicas[lease.replica].end_conversation(lease.lease)

    def prefill_embeds(self, lease: RouterLease, embeds):
        self.replicas[lease.replica].prefill_embeds(lease.lease, embeds)

    # -- driving ---------------------------------------------------------
    def has_work(self) -> bool:
        return any(r.has_work() for r in self.replicas)

    def step(self):
        """One tick of every replica with work.  Device work dispatches
        asynchronously, so replica i+1's chunk overlaps replica i's
        in-flight execution on its own device group; only the per-replica
        token fetches serialize on this thread (serve.backend runs one
        SchedulerThread per replica instead)."""
        for r in self.replicas:
            if r.has_work():
                r.step()

    def run(self, poll: Optional[Callable[[], bool]] = None):
        while self.has_work():
            self.step()
            if poll is not None and not poll():
                return

    def run_threaded(self):
        """Drain all replicas with ONE STEPPING THREAD PER REPLICA (what
        serve.backend's SchedulerThreads do for live traffic) — replica
        host work (token fetches, sampling-state updates) overlaps across
        replicas instead of serializing on a single round-robin thread.
        This is the bench driving mode: it makes the aggregate
        `decode_seconds = max(per-replica)` metric's overlap assumption
        REAL rather than dependent on async dispatch alone."""
        import threading

        def drain(r: BatchScheduler):
            while r.has_work():
                r.step()

        threads = [threading.Thread(target=drain, args=(r,), daemon=True)
                   for r in self.replicas if r.has_work()]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    def warmup(self):
        for r in self.replicas:
            r.warmup()

    # -- aggregate metrics -----------------------------------------------
    @property
    def tokens_emitted(self) -> int:
        return sum(r.tokens_emitted for r in self.replicas)

    @property
    def decode_seconds(self) -> float:
        # tokens / max(per-replica decode time): assumes replicas decode
        # CONCURRENTLY.  True under run_threaded() / serve.backend's
        # per-replica SchedulerThreads (each replica has its own stepping
        # thread + device group); under single-threaded step()/run() only
        # async dispatch provides overlap, so prefer the threaded drivers
        # when this metric matters.
        return max((r.decode_seconds for r in self.replicas), default=0.0)

    @property
    def spec_proposed(self) -> int:
        return sum(r.spec_proposed for r in self.replicas)

    @property
    def spec_accepted(self) -> int:
        return sum(r.spec_accepted for r in self.replicas)


def make_replica_router(f, dp: int, tp: int = 1, devices=None, **sched_kw):
    """Product-surface entry (the --dp flag of serve.backend / bench.py):
    a parsed .lmrs file -> a dp x tp ReplicaRouter."""
    return ReplicaRouter(f, dp=dp, tp=tp, devices=devices, **sched_kw)
