"""Benchmark: flagship solver throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric follows BASELINE.json's north star: cell-updates/sec/chip for the
dfLowMachFoam-parity solver on the 3D reactive LES case (H2/air TGV with an
ignition kernel, Sigma SGS, stiff chemistry, 48^3 cells, f32). The reference
publishes no absolute numbers (BASELINE.md), so vs_baseline is reported
against the most recent previous round's bench value when available
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
    from __graft_entry__ import _build_3d_les

    n = 96                       # 96^3 3D reacting LES case (north-star
    # scale; round-1 benched 48^3 — see BENCH.md for the size/tolerance
    # sweep: 96^3 also runs FASTER per cell than 48^3 here)
    solver, state = _build_3d_les(n=n, dtype=jnp.float32)
    dt = 2.5e-7
    step = jax.jit(lambda s: solver.step(s, dt)[0])
    state = jax.block_until_ready(step(state))   # compile + warm
    state0_T = state.T
    n_steps = 5
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step(state)
    jax.block_until_ready(state)
    t1 = time.perf_counter()
    if not bool(jnp.all(jnp.isfinite(state.T))):
        raise RuntimeError("bench state is not finite — unhealthy device?")
    if (t1 - t0) < 2e-3 * n_steps:
        # launch overhead alone is ~ms; sub-2ms 48^3 reacting steps means the
        # device isn't executing (worker crash / fake completion)
        raise RuntimeError("implausibly fast steps — device likely not "
                           "executing (worker crash?)")
    if float(jnp.max(jnp.abs(state.T - state0_T))) == 0.0:
        raise RuntimeError("state did not change across steps — device "
                           "likely not executing")
    cells = n ** 3
    cups = cells * n_steps / (t1 - t0)

    vs = None
    here = os.path.dirname(os.path.abspath(__file__))
    prev = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if prev:
        try:
            with open(prev[-1]) as f:
                last = json.load(f)
            # the driver wraps the bench line as {"parsed": {...}}; older
            # files may hold the line itself
            rec = last.get("parsed", last)
            if rec.get("value"):
                vs = cups / float(rec["value"])
        except Exception:
            vs = None

    # ---- second metric: the NORTH-STAR-shaped config (BASELINE.json
    # config 5): 3D LES turbulent JET FLAME with inlet/outlet/entrainment
    # BCs and a non-periodic pressure solve — everything the periodic TGV
    # never exercises (VERDICT r4 missing #1). vs_baseline here is the
    # jet/TGV throughput ratio (target: within ~25% of the TGV number).
    # Printed FIRST so the driver's tail-parse keeps the headline metric
    # (the last JSON line) as the recorded one.
    try:
        from __graft_entry__ import _build_3d_jet
        jsolver, jstate = _build_3d_jet(n=64, dtype=jnp.float32)
        # dt chosen for chemistry-cost comparability with the TGV headline
        # (stiff substeps per CFD step scale ~linearly with dt: measured
        # 1.25 s/step at dt 2e-6 vs ~0.3 s at 5e-7, BENCH.md); mean-flow
        # CFL ~0.05 at u_jet = 50 m/s
        jdt = 5e-7
        jstep = jax.jit(lambda s: jsolver.step(s, jdt)[0])
        jstate = jax.block_until_ready(jstep(jstate))
        jstate = jax.block_until_ready(jstep(jstate))  # 2nd warm step:
        # lets the initial pilot kernel burn toward equilibrium so the
        # timed steps see representative (not ignition-transient) stiffness
        t0 = time.perf_counter()
        for _ in range(n_steps):
            jstate = jstep(jstate)
        jax.block_until_ready(jstate)
        t1 = time.perf_counter()
        if not bool(jnp.all(jnp.isfinite(jstate.T))):
            raise RuntimeError("jet bench state is not finite")
        jcells = int(np.prod(jstate.T.shape))
        jcups = jcells * n_steps / (t1 - t0)
        print(json.dumps({
            "metric": "lowmach_3d_les_jet_flame_cell_updates_per_sec_per_chip",
            "value": jcups,
            "unit": "cell-updates/s",
            "vs_baseline": jcups / cups,
        }))
    except Exception as e:                      # the headline line must
        print(f"# jet bench failed: {e!r}")     # still print
    print(json.dumps({
        "metric": "lowmach_3d_reacting_les_cell_updates_per_sec_per_chip",
        "value": cups,
        "unit": "cell-updates/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
