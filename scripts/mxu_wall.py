"""The decode-speed wall: measured MXU weight-streaming rate on the chip.

DESIGN.md §1 prices single-stream decode at the "MXU weight-load wall" —
the rate at which the systolic array can consume weight VALUES during
T=1 matvecs (it loads weight rows, so int8/Q4 storage does not multiply
it the way HBM bandwidth math would suggest).  This script makes that
number a committed measurement instead of a prose claim (VERDICT r3
weak #4 / next #7): it streams gemma-9b-shaped matrices through

  * the packed-Q4 xe kernel      (the serving default's hot path)
  * the int8 xe kernel           (Q8_0 / q4-as-int8 layouts)
  * a plain XLA bf16 matvec      (the no-quantization reference point)

with delta timing (one host fetch per run; the axon tunnel's RTT and
early-returning block_until_ready make per-call timing useless).

Usage: python scripts/mxu_wall.py [T=1]
Prints one JSON line per variant: {"path", "o", "n", "gvals_per_s", ...}
and a projected gemma-9b Q4 decode ceiling.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


# gemma-2-9b's two big per-layer shapes: FFN in/out and the fused w13
SHAPES = [(14336 * 2, 3584), (3584, 14336)]
N_CHAIN = 24          # matmuls per device program
R = 4                 # delta: (1+R)-program run minus 1-program run


def _chain(matmul, o):
    """One jitted program running N_CHAIN dependent matmuls (the scalar
    feedback keeps them sequential without shape games)."""

    @jax.jit
    def prog(qt, x):
        def body(x, _):
            y = matmul(x, qt)
            return x + 1e-20 * jnp.sum(y), None

        x, _ = jax.lax.scan(body, x, length=N_CHAIN)
        return x

    return prog


def _measure(prog, qt, x):
    y = prog(qt, x)
    float(jnp.sum(y))            # compile + settle (real fetch)

    def run(r):
        t0 = time.time()
        z = x
        for _ in range(r):
            z = prog(qt, z)
        float(jnp.sum(z))
        return time.time() - t0

    t1 = run(1)
    tm = run(1 + R)
    return (tm - t1) / (R * N_CHAIN)


def main():
    from lmrs_tpu.ops.matmul import qmatmul
    from lmrs_tpu.quant import (QTensor, QuantType, q4_file_to_runtime_np,
                                quantize_q40_np, quantize_q80_np)

    t_q = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    gs = 256
    rng = np.random.default_rng(0)
    print(f"== T={t_q} chain={N_CHAIN} dev={jax.devices()}", flush=True)

    totals = {}
    for o, n in SHAPES:
        w = rng.normal(0, 0.02, (o, n)).astype(np.float32)
        x = jnp.asarray(rng.normal(0, 1, (t_q, n)).astype(np.float32))

        q8, s8, _ = quantize_q80_np(w, gs)
        qt8 = QTensor(jnp.asarray(q8.reshape(o, n)),
                      jnp.asarray(s8.reshape(o, n // gs), jnp.float32),
                      QuantType.Q8_0, gs, o, n)
        q4, s4, _ = quantize_q40_np(w, gs)
        q4r = q4_file_to_runtime_np(q4.reshape(o, n // 2), gs)
        qt4 = QTensor(jnp.asarray(q4r),
                      jnp.asarray(s4.reshape(o, n // gs), jnp.float32),
                      QuantType.Q4_0, gs, o, n)
        wb = jnp.asarray(w, jnp.bfloat16)

        fast = partial(qmatmul, impl="fast")
        bf16 = lambda xx, ww: jax.lax.dot_general(
            xx.astype(jnp.bfloat16), ww,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        for name, qt, mm in (("q4_xe", qt4, lambda xx, q: fast(xx, q)),
                             ("int8_xe", qt8, lambda xx, q: fast(xx, q)),
                             ("bf16_xla", wb, bf16)):
            dt = _measure(_chain(mm, o), qt, x)
            gv = o * n / dt / 1e9
            totals.setdefault(name, 0.0)
            totals[name] += dt
            print(json.dumps({"path": name, "o": o, "n": n, "t_q": t_q,
                              "us_per_matmul": round(dt * 1e6, 1),
                              "gvals_per_s": round(gv, 1)}), flush=True)

    # projected gemma-9b decode ceiling from the measured wall: values
    # touched per token ~= total param values minus the (gathered) embed
    g9b_vals = 9.0e9
    for name, dt_sum in totals.items():
        vals_sum = sum(o * n for o, n in SHAPES)
        gv = vals_sum / dt_sum / 1e9
        print(json.dumps({"path": name, "wall_gvals_per_s": round(gv, 1),
                          "gemma9b_ceiling_tok_s":
                              round(gv * 1e9 / g9b_vals, 1)}), flush=True)


if __name__ == "__main__":
    main()
