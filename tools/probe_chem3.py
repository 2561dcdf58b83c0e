"""Substep-cost anatomy for the implicit chemistry tier + ROS4 probe.

Times, at the hot-bin width (6912 and 27648 lanes):
  - one batched RHS evaluation
  - jac_and_f (linearize + 10 vmapped tangents)
  - one full integrator while-trip-equivalent (jac + inverse + stages)
  - full solve_chemistry with order=2 vs order=4 at rtol 1e-4

Usage: python tools/probe_chem3.py [--n 96]
"""
import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build_3d_les


def timeit(fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    args = ap.parse_args()

    from deepflame_tpu.chemistry.reactor import (
        constant_pressure_rhs_batched, solve_chemistry)
    from deepflame_tpu.chemistry.integrator import (
        _inverse_batched_dispatch)

    solver, state = _build_3d_les(n=args.n, dtype=jnp.float32)
    dt = 2.5e-7
    step = jax.jit(lambda s: solver.step(s, dt)[0])
    state = jax.block_until_ready(step(state))

    th, kin = solver.thermo, solver.combustion.kinetics
    opts = solver.combustion.ode_opts
    Tf = np.asarray(state.T.reshape(-1))
    ns = state.Y.shape[0]
    Yf = np.asarray(jnp.moveaxis(state.Y, 0, -1).reshape(-1, ns))
    pf = np.asarray(state.p.reshape(-1))
    # hottest lanes (the rejected set lives at T > 1600)
    order = np.argsort(Tf)
    for L in (6912, 27648):
        hot = order[-L:]
        s0 = jnp.asarray(np.concatenate([Tf[hot, None], Yf[hot]], axis=1),
                         jnp.float32)
        p0 = jnp.asarray(pf[hot], jnp.float32)
        rhs_b = constant_pressure_rhs_batched(th, kin, p0)

        f_rhs = jax.jit(rhs_b)
        t_rhs = timeit(f_rhs, s0)

        n = ns + 1
        basis = jnp.eye(n, dtype=jnp.float32)

        @jax.jit
        def jacf(y):
            f0, jvp = jax.linearize(rhs_b, y)
            Jc = jax.vmap(lambda e: jvp(jnp.broadcast_to(e, y.shape)))(basis)
            return f0, jnp.moveaxis(Jc, 0, -1)

        t_jac = timeit(jacf, s0)

        @jax.jit
        def trip(y):
            f0, jac = jacf.__wrapped__(y) if hasattr(jacf, "__wrapped__") \
                else jacf(y)
            W = jnp.eye(n, dtype=y.dtype)[None] - (1e-8 * 0.293) * jac
            W_inv = _inverse_batched_dispatch(W)
            solve = lambda b: jnp.einsum("nml,lm->ln", W_inv, b)
            k1 = solve(f0)
            f1 = rhs_b(y + 1e-8 * 0.5 * k1)
            k2 = solve(f1 - k1) + k1
            y2 = y + 1e-8 * k2
            f2 = rhs_b(y2)
            k3 = solve(f2 - 6.0 * (k2 - f1) - 2.0 * (k1 - f0))
            return y2 + k3 * 1e-9

        t_trip = timeit(trip, s0)
        print(f"width {L:6d}: rhs {t_rhs*1e3:7.3f} ms  "
              f"jac_and_f {t_jac*1e3:7.3f} ms  full-trip {t_trip*1e3:7.3f} ms",
              flush=True)

    # ---- order=2 vs order=4 full chemistry at rtol 1e-4
    T, p = state.T, state.p
    Yt = jnp.moveaxis(state.Y, 0, -1)
    d0 = state.chem_dt
    for order_ in (2, 4):
        o = opts._replace(order=order_)
        f = jax.jit(functools.partial(
            solve_chemistry, th, kin, opts=o, n_bins=128, fast_tier=True,
            sort="T"))
        t = timeit(lambda: f(T, p, Yt, dt, dt_start=d0), reps=5)
        print(f"solve_chemistry order={order_}: {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
