"""Multi-host initialization and mesh construction.

The reference is strictly single-process (SURVEY.md §2); multi-host TPU
serving uses `jax.distributed` + a global mesh whose "dp" axis spans hosts
(each host serves independent request streams; weights are replicated or
tp-sharded within each host's slice, so collectives ride ICI and only
control traffic crosses DCN).

Typical pod-slice launch (same command on every host):

    python -m lmrs_tpu.serve.backend --model m.lmrs ... \
        --coordinator <host0>:8476 --num-hosts N --host-id $ID
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Bring up the jax.distributed runtime.

    On Cloud TPU pods with default metadata this is argument-free; for
    manual clusters pass coordinator_address/num/id explicitly.  No-op when
    already initialized or when running single-process.
    """
    if num_processes in (None, 1) and coordinator is None:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def global_mesh(tp: Optional[int] = None) -> Mesh:
    """(dp, tp) mesh over ALL processes' devices: tp within each host's
    chips (ICI), dp = hosts x per-host replicas (DCN-friendly)."""
    devices = jax.devices()
    local = jax.local_device_count()
    tp = tp or local
    assert local % tp == 0, f"tp={tp} must divide local devices {local}"
    dp = len(devices) // tp
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
