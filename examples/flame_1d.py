"""1D freely-propagating premixed flame (dfLowMachFoam 1D case parity).

Role parity: examples/dfLowMachFoam/.../oneD_freelyPropagation — a laminar
flame propagating into premixed reactants; the flameSpeed utility computes
the laminar flame speed from front positions. H2/air phi=1 at 1 atm has
S_L ~ 2.0-2.4 m/s (literature; mechanism-dependent).

Usage: python examples/flame_1d.py [--cells 256] [--length 0.01]
       [--T-u 300] [--steps 400] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=256)
    ap.add_argument("--length", type=float, default=0.012)
    ap.add_argument("--T-u", type=float, default=300.0)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--dt", type=float, default=None,
                    help="default: acoustic CFL ~7 (0.35*dx/1200; the "
                         "PIMPLE core is stable to aCFL ~12 cyclic, ~15+ "
                         "open-boundary blow-ups were observed at 1024 "
                         "cells with dt=2e-7)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="f64")
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.combustion import Laminar
    from deepflame_tpu.mesh import (StructuredMesh, zero_gradient, empty,
                                    fixed_value)
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
    from deepflame_tpu.utils.flame_speed import (flame_position,
                                                 flame_thickness)

    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)
    n = args.cells
    L = args.length
    mesh = StructuredMesh.box([L, L / n, L / n], [n, 1, 1])
    e = (empty(), empty())
    b = ((zero_gradient(), zero_gradient()), e, e)
    comb = Laminar(th, kin, ode_opts=RosenbrockOptions(
        rtol=1e-6 if args.dtype == "f64" else 1e-4,
        atol=1e-12 if args.dtype == "f64" else 1e-8, max_steps=20000,
        grow=10.0))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=comb,
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=True,
                             inert_index=int(mech.species_index("N2"))))

    ns = mech.n_species
    Yu = np.zeros(ns)
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    Yu[iH2], Yu[iO2], Yu[iN2] = 0.0285, 0.2264, 0.7451
    X, _, _ = mesh.cell_centers(dtype)
    # burned pocket on the left with a smooth interface (sharp steps + the
    # expansion-coupled pEqn need resolved gradients)
    w = 8.0 * mesh.dx
    prof = 0.5 * (1.0 - jnp.tanh((X - 0.25 * L) / w))
    T = (args.T_u + (2400.0 - args.T_u) * prof).astype(dtype)
    p = jnp.full(mesh.shape, 101325.0, dtype)
    Y = jnp.asarray(np.tile(Yu[:, None, None, None], (1,) + mesh.shape), dtype)
    s = solver.initial_state(p, T, Y)

    dt = args.dt if args.dt is not None else min(2e-7, 0.35 * mesh.dx / 1200.0)
    step = jax.jit(lambda st: solver.step(st, dt))
    xs = np.asarray(X).squeeze()
    times, fronts = [], []
    import time as _time
    t0 = _time.perf_counter()
    for i in range(args.steps):
        s, diag = step(s)
        if (i + 1) % max(args.steps // 40, 1) == 0:
            T_now = np.asarray(s.T).squeeze()
            xf = flame_position(xs, T_now)
            times.append(float(s.time))
            fronts.append(xf)
            print(f"t={float(s.time) * 1e6:8.1f} us  x_f={xf * 1e3:6.3f} mm  "
                  f"T_max={T_now.max():7.1f} K  u_max="
                  f"{float(jnp.abs(s.U[0]).max()):6.2f} m/s", flush=True)
    # flame speed: S_L = displacement speed minus the unburned-gas velocity
    # just ahead of the front (expansion pushes the reactants)
    T_now = np.asarray(s.T).squeeze()
    sel = slice(len(times) // 2, None)
    disp = np.polyfit(np.asarray(times)[sel], np.asarray(fronts)[sel], 1)[0]
    u_now = np.asarray(s.U[0]).squeeze()
    i_f = int(np.argmin(np.abs(xs - fronts[-1])))
    i_ahead = min(i_f + max(3, int(1e-3 / mesh.dx // 2)), len(xs) - 2)
    u_ahead = float(u_now[i_ahead])
    sl = disp - u_ahead
    print(f"\nflame thickness: {flame_thickness(xs, T_now) * 1e3:.3f} mm")
    print(f"displacement speed: {disp:.2f} m/s, u_unburned_ahead: "
          f"{u_ahead:.2f} m/s")
    print(f"laminar flame speed S_L = {sl:.2f} m/s "
          f"(literature H2/air phi=1: ~2.0-2.4 m/s)")
    print(f"wall: {_time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
