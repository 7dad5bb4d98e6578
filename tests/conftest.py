"""Test harness config: force an 8-device virtual CPU mesh.

This container's sitecustomize (axon TPU tunnel) imports jax at interpreter
startup, which locks the platform and CPU device count before pytest code can
run.  When that has happened — or the right env isn't set — re-exec pytest
once with a clean environment: JAX_PLATFORMS=cpu and 8 virtual CPU devices.
"""

import os
import sys

_GUARD = "_LMRS_TPU_TEST_REEXEC"


def _needs_reexec() -> bool:
    if os.environ.get(_GUARD) == "1":
        return False
    if os.environ.get("LMRS_TPU_TEST_NO_REEXEC") == "1":
        return False
    if os.environ.get("JAX_PLATFORMS") != "cpu":
        return True
    if "jax" in sys.modules:
        import jax

        return len(jax.devices()) < 8 or jax.devices()[0].platform != "cpu"
    return os.environ.get("JAX_NUM_CPU_DEVICES") != "8"


if _needs_reexec():
    # pytest's fd-level capture has already swapped fd 1/2 for anonymous
    # tmpfiles by the time this conftest loads; exec'ing now sends the
    # re-exec'd run's entire report into the void (observed: 0-byte logs
    # from `pytest > log`).  Restore the real fds first — this process is
    # about to be replaced, so stopping global capture has no other effect.
    try:
        import gc

        from _pytest.capture import CaptureManager

        for _o in gc.get_objects():
            if isinstance(_o, CaptureManager):
                _o.stop_global_capturing()
                break
    except Exception:
        pass
    env = dict(os.environ)
    env[_GUARD] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "8"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = ""  # drop the axon sitecustomize
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The production default runs the flash kernel from bucket 256 up (measured
# faster at every position on the chip — models/transformer._flash_eligible).
# On the CPU test mesh the kernel runs in INTERPRET mode (orders slower) and
# with different numerics than the einsum, so the suite pins the einsum path
# by default; flash-specific tests (test_flash_attention, test_paged,
# test_bucket_collapse, ...) override per-test via monkeypatch/fixtures.
os.environ.setdefault("LMRS_FLASH_MIN_BUCKET", str(1 << 30))
