"""Persistent XLA/Mosaic compilation cache.

The decode path compiles one program per (attn bucket × chunk kind); on a
remote-attached TPU a cold warmup costs minutes (round-1 bench: 268 s).
The reference has nothing comparable (its "compile" is cargo build); for a
serving framework every process restart repaying full compilation is an
operational bug.  JAX's persistent cache keys on (HLO, jaxlib version,
flags), so a second process on the same machine warms up from disk.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("LMRS_TPU_COMPILE_CACHE",
                              "/tmp/lmrs_tpu_compile_cache")
_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache directory.  Set LMRS_TPU_COMPILE_CACHE=0 to disable.
    """
    global _enabled
    d = cache_dir or _DEFAULT_DIR
    if d in ("0", "off", "none"):
        return d
    if _enabled:
        return d
    import jax

    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # cache every program that takes noticeable compile time, not only the
    # >1s default — decode-step specializations are many and medium-sized
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # log WHY a program missed the cache (warmup on the axon tunnel costs
    # minutes per big program; silent misses are undebuggable)
    # cache-miss explanations are DEBUG diagnostics (they spam every
    # first-trace with "TRACING CACHE MISS ..."); opt in when hunting a
    # retrace bug, off for serving/bench output hygiene
    if os.environ.get("LMRS_EXPLAIN_CACHE") == "1":
        jax.config.update("jax_explain_cache_misses", True)
    _enabled = True
    return d
