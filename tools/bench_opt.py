"""Round-5 optimization probes on the 96^3 flagship config (one TPU chip).

Measures, per variant, 5-step wall time + Krylov iteration counts from the
step diagnostics — targeting the two profiled hotspots from BENCH.md's
roofline note: pressure-CG iteration count and chemistry substep shaping.

Usage: python tools/bench_opt.py [--n 96] [--variants jacobi,mg]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_3d_les


def run_variant(solver, state0, dt, n_steps=5, label=""):
    step = jax.jit(lambda s: solver.step(s, dt))
    t0 = time.perf_counter()
    s, d = step(state0)
    jax.block_until_ready(s)
    t_compile = time.perf_counter() - t0
    state = s
    iters = {k: 0.0 for k in ("iters_p", "iters_U", "iters_Y", "iters_h")}
    t0 = time.perf_counter()
    for _ in range(n_steps):
        # block EVERY step: after a long (~300 s) compile the axon tunnel
        # has twice returned instantly from an async 5-step enqueue
        # (0.2 ms "steps"); per-step blocking costs ~nothing at these
        # step times and keeps the measurement honest
        state, d = jax.block_until_ready(step(state))
    t1 = time.perf_counter()
    if (t1 - t0) < 2e-3 * n_steps:
        raise RuntimeError("implausibly fast steps - device not executing")
    for k in iters:
        if k in d:
            iters[k] = float(d[k])
    ms = (t1 - t0) / n_steps * 1e3
    import numpy as _np
    cups = int(_np.prod(state.T.shape)) / ((t1 - t0) / n_steps)
    print(f"{label:24s} step {ms:8.2f} ms  {cups/1e6:6.3f} Mcu/s  "
          f"compile {t_compile:6.1f} s  last-step iters: "
          + " ".join(f"{k.split('_')[1]}={iters[k]:.0f}" for k in iters),
          flush=True)
    return ms, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--variants", default="jacobi,mg")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--config", default="tgv")
    ap.add_argument("--dt", type=float, default=None)
    args = ap.parse_args()

    if args.config == "jet":
        from __graft_entry__ import _build_3d_jet
        solver, state = _build_3d_jet(n=args.n, dtype=jnp.float32)
        dt = args.dt or 2e-6
    else:
        solver, state = _build_3d_les(n=args.n, dtype=jnp.float32)
        dt = args.dt or 2.5e-7
    # one warm step like bench.py, shared across variants
    warm = jax.jit(lambda s: solver.step(s, dt)[0])
    state = jax.block_until_ready(warm(state))

    for v in args.variants.split(","):
        v = v.strip()
        if v == "jacobi":
            sol = solver
        elif v == "mg":
            sol = dataclasses.replace(
                solver, config=dataclasses.replace(solver.config,
                                                   p_precond="mg"))
        elif v == "nochem":
            sol = dataclasses.replace(
                solver, config=dataclasses.replace(solver.config,
                                                   chemistry=False))
        elif v == "nochem-mg":
            sol = dataclasses.replace(
                solver, config=dataclasses.replace(
                    solver.config, chemistry=False, p_precond="mg"))
        # ---- ablations (all chemistry-OFF): subtract from 'nochem' to
        # attribute the FV-side time
        elif v == "nochem-noenergy":
            sol = dataclasses.replace(
                solver, config=dataclasses.replace(
                    solver.config, chemistry=False, solve_energy=False))
        elif v == "nochem-1corr":
            sol = dataclasses.replace(
                solver, config=dataclasses.replace(
                    solver.config, chemistry=False, n_corr=1))
        elif v == "nochem-lewis":
            sol = dataclasses.replace(
                solver, config=dataclasses.replace(
                    solver.config, chemistry=False, unity_lewis=True))
        elif v == "nochem-upwindY":
            sol = dataclasses.replace(
                solver, config=dataclasses.replace(
                    solver.config, chemistry=False, div_scheme_Y="upwind"))
        elif v == "nochem-loosep":
            sol = dataclasses.replace(
                solver, config=dataclasses.replace(
                    solver.config, chemistry=False, p_rel_tol=0.05))
        else:
            raise SystemExit(f"unknown variant {v}")
        run_variant(sol, state, dt, n_steps=args.steps, label=v)


if __name__ == "__main__":
    main()
