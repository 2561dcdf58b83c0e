"""Benchmark: flagship low-Mach reacting solver throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric follows BASELINE.json: cell-updates/sec/chip for the dfLowMachFoam-
parity solver on a 2D reacting H2/air case (reacting TGV family). The
reference publishes no absolute numbers (BASELINE.md), so vs_baseline is
reported against the most recent previous round's bench value when available
(BENCH_r*.json), else null.
"""
import glob
import json
import os
import re
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _build

    n = 128                      # 128 x 128 2D reacting case
    solver, state = _build(n=n, dtype=jnp.float32, chemistry=True)
    dt = 5e-7
    step = jax.jit(lambda s: solver.step(s, dt)[0])
    state = jax.block_until_ready(step(state))   # compile + warm
    n_steps = 5
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step(state)
    jax.block_until_ready(state)
    t1 = time.perf_counter()
    cells = n * n
    cups = cells * n_steps / (t1 - t0)

    vs = None
    prev = sorted(glob.glob("BENCH_r*.json"))
    if prev:
        try:
            with open(prev[-1]) as f:
                last = json.load(f)
            if last.get("value"):
                vs = cups / float(last["value"])
        except Exception:
            vs = None
    print(json.dumps({
        "metric": "lowmach_reacting_cell_updates_per_sec_per_chip",
        "value": cups,
        "unit": "cell-updates/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
