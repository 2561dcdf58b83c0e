"""jax.profiler trace of the chemistry solve (and optionally the full step);
aggregates device-side op durations from the perfetto trace.json.gz.

Usage: python tools/trace_chem.py [--n 96] [--what chem|step]
"""
import argparse
import functools
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build_3d_les


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--what", default="chem")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from deepflame_tpu.chemistry.reactor import solve_chemistry
    solver, state = _build_3d_les(n=args.n, dtype=jnp.float32)
    dt = 2.5e-7
    step = jax.jit(lambda s: solver.step(s, dt)[0])
    state = jax.block_until_ready(step(state))

    th, kin = solver.thermo, solver.combustion.kinetics
    opts = solver.combustion.ode_opts
    T, p = state.T, state.p
    Yt = jnp.moveaxis(state.Y, 0, -1)
    d0 = state.chem_dt

    if args.what == "chem":
        f = jax.jit(functools.partial(
            solve_chemistry, th, kin, opts=opts, n_bins=128, fast_tier=True,
            sort="T"))
        run = lambda: jax.block_until_ready(f(T, p, Yt, dt, dt_start=d0))
    elif args.what == "fl":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import bench_facelist as bf
        _, _, sol_f, s_f = bf.build_pair(args.n, False, jnp.float32)
        stepf = jax.jit(lambda s: sol_f.step(s, dt)[0])
        s_f = jax.block_until_ready(stepf(s_f))
        run = lambda: jax.block_until_ready(stepf(s_f))
    elif args.what == "nochem":
        import dataclasses
        sol_nc = dataclasses.replace(
            solver, config=dataclasses.replace(solver.config,
                                               chemistry=False))
        step_nc = jax.jit(lambda s: sol_nc.step(s, dt)[0])
        run = lambda: jax.block_until_ready(step_nc(state))
    else:
        run = lambda: jax.block_until_ready(step(state))
    run()   # compiled

    trace_dir = "/tmp/jax_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            run()

    # find trace.json.gz
    cands = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True) + \
        glob.glob(os.path.join(trace_dir, "**", "trace.json.gz"),
                  recursive=True)
    if not cands:
        print("no trace.json.gz found under", trace_dir)
        for root, _, files in os.walk(trace_dir):
            for fn in files:
                print(" ", os.path.join(root, fn))
        return
    path = max(cands, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # device-lane complete events: aggregate by name
    by_name = defaultdict(float)
    total = 0.0
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    dev_pids = {pid for pid, nm in pid_names.items()
                if "TPU" in nm or "tpu" in nm or "device" in nm.lower()}
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        if dev_pids and pid not in dev_pids:
            continue
        dur = float(e.get("dur", 0.0))
        by_name[e.get("name", "?")] += dur
        total += dur
    print(f"pids seen: {pid_names}")
    print(f"total device-op time (3 reps): {total/1e3:.1f} ms")
    items = sorted(by_name.items(), key=lambda kv: -kv[1])[:args.top]
    for name, dur in items:
        print(f"{dur/3e3:9.3f} ms/rep  {name[:110]}")


if __name__ == "__main__":
    main()
