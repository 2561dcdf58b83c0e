"""Inlet-anchored 1D premixed laminar flame: S_L from consumption speed.

Role parity: examples/dfLowMachFoam oneD_freelyPropagation + the flameSpeed
utility (/root/reference/applications/utilities/flameSpeed/flameSpeed.C:26-80).
The round-1 open-boundary transient never settled (superadiabatic spike);
this configuration anchors the flame hydrodynamically: unburnt mixture flows
in at u_in ~ S_L, burnt products leave through a pressure outlet, and the
front settles where consumption balances inflow. Two S_L estimates:

  - consumption speed  S_c = -(1/(rho_u Y_fu)) \\int wdot_fuel W_fuel dx
    (robust even while the front drifts), and
  - displacement-corrected  S_L = u_in - dx_f/dt  (front drift rate).

H2/air phi=1, 1 atm, T_u=300 K: S_L ~ 2.0-2.4 m/s (mechanism-dependent;
H2_Li). CH4: --fuel CH4 --mech drm19 gives S_L ~ 0.35-0.40 m/s.

Usage: python examples/flame_1d_anchored.py [--cells 512] [--u-in 2.2]
       [--steps 4000] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=512)
    ap.add_argument("--length", type=float, default=0.008)
    ap.add_argument("--u-in", type=float, default=2.2)
    ap.add_argument("--T-u", type=float, default=300.0)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--dt", type=float, default=None)
    ap.add_argument("--fuel", default="H2")
    ap.add_argument("--mech", default="/root/reference/mechanisms/H2/H2_Li.yaml")
    ap.add_argument("--phi", type=float, default=1.0)
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
    from deepflame_tpu.chemistry.kinetics import production_rates
    from deepflame_tpu.chemistry.reactor import ignite
    from deepflame_tpu.combustion import Laminar
    from deepflame_tpu.mesh import (StructuredMesh, zero_gradient, empty,
                                    fixed_value)
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
    from deepflame_tpu.utils.flame_speed import flame_position, flame_thickness

    mech = load_mechanism(args.mech)
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)
    ns = mech.n_species
    iF = mech.species_index(args.fuel)
    iO2, iN2 = mech.species_index("O2"), mech.species_index("N2")

    # stoichiometric-phi unburnt composition (fuel + air)
    WF = float(mech.molecular_weights[iF])
    nu_O2 = 0.5 if args.fuel == "H2" else 2.0        # H2+0.5O2 / CH4+2O2
    X = np.zeros(ns)
    X[iF] = args.phi
    X[iO2] = nu_O2
    X[iN2] = nu_O2 * 3.76
    W = np.asarray(mech.molecular_weights)
    Yu = X * W / (X * W).sum()

    p0 = 101325.0
    # burnt side: HP-equilibrium composition from a 0D ignition run, then
    # the temperature consistent with the UNBURNT enthalpy h(T_u, Yu)
    # (adiabatic flame temperature from T_u, not from the ignition seed)
    _, Tb_t, Yb_t = ignite(th, kin, jnp.asarray(1200.0, dtype), p0,
                           jnp.asarray(Yu, dtype), 5e-3,
                           opts=RosenbrockOptions(rtol=1e-6, atol=1e-10,
                                                  max_steps=20000))
    Yb = np.asarray(Yb_t[-1])
    T_u = args.T_u
    h_u = th.h_mass(jnp.asarray(T_u, dtype), jnp.asarray(Yu, dtype))
    T_b = float(th.T_from_h(h_u, jnp.asarray(Yb, dtype),
                            jnp.asarray(2200.0, dtype)))

    n = args.cells
    L = args.length
    mesh = StructuredMesh.box([L, L / n, L / n], [n, 1, 1])
    e = (empty(), empty())
    u_in = args.u_in
    bU = ((fixed_value(u_in), zero_gradient()), e, e)
    bU0 = ((fixed_value(0.0), zero_gradient()), e, e)
    bp = ((zero_gradient(), fixed_value(p0)), e, e)
    h_in = float(th.h_mass(jnp.asarray(T_u, dtype), jnp.asarray(Yu, dtype)))
    bh = ((fixed_value(h_in), zero_gradient()), e, e)
    rho_u = float(th.rho(jnp.asarray(p0, dtype), jnp.asarray(T_u, dtype),
                         jnp.asarray(Yu, dtype)))
    brho = ((fixed_value(rho_u), zero_gradient()), e, e)
    bY = [((fixed_value(float(Yu[k])), zero_gradient()), e, e)
          for k in range(ns)]
    comb = Laminar(th, kin, ode_opts=RosenbrockOptions(
        rtol=1e-6 if args.dtype == "f64" else 1e-4,
        atol=1e-12 if args.dtype == "f64" else 1e-8, max_steps=20000,
        grow=10.0))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=comb,
        bcs_U=(bU, bU0, bU0), bcs_p=bp, bcs_h=bh, bcs_Y=bY, bcs_rho=brho,
        config=LowMachConfig(chemistry=True, inert_index=int(iN2)))

    Xc, _, _ = mesh.cell_centers(dtype)
    w = 6.0 * mesh.dx
    prof = 0.5 * (1.0 + jnp.tanh((Xc - 0.45 * L) / w))   # 0 unburnt, 1 burnt
    T0 = (T_u + (T_b - T_u) * prof).astype(dtype)
    Y0 = (jnp.asarray(Yu, dtype)[:, None, None, None] * (1 - prof)
          + jnp.asarray(Yb, dtype)[:, None, None, None] * prof)
    # velocity: mass-flux-consistent jump u = rho_u u_in / rho(x)
    rho0 = th.rho(jnp.full(mesh.shape, p0, dtype), T0,
                  jnp.moveaxis(Y0, 0, -1))
    U0 = jnp.stack([rho_u * u_in / rho0, jnp.zeros_like(T0),
                    jnp.zeros_like(T0)])
    s = solver.initial_state(jnp.full(mesh.shape, p0, dtype), T0, Y0, U0)

    # acoustic CFL ~5 (the PIMPLE core is stable to ~8-12; see flame_1d.py)
    dt = args.dt if args.dt is not None else 5.0 * mesh.dx / 1200.0
    step = jax.jit(lambda st: solver.step(st, dt)[0])
    xs = np.asarray(Xc).squeeze()
    import time as _t
    t0 = _t.perf_counter()
    times, fronts, scs = [], [], []

    def consumption_speed(s):
        T = s.T
        Yt = jnp.moveaxis(s.Y, 0, -1)
        rho = th.rho(s.p, T, Yt)
        wdot = production_rates(kin, th, T, rho, Yt)      # (..., ns)
        mdot_f = -jnp.sum(wdot[..., iF]) * WF * mesh.dx   # kg/m^2/s consumed
        return float(mdot_f / (rho_u * Yu[iF]))

    n_rep = max(args.steps // 25, 1)
    for i in range(args.steps):
        s = step(s)
        if (i + 1) % n_rep == 0:
            T_now = np.asarray(s.T).squeeze()
            xf = flame_position(xs, T_now)
            sc = consumption_speed(s)
            times.append(float(s.time))
            fronts.append(xf)
            scs.append(sc)
            print(f"t={float(s.time)*1e6:8.1f} us  x_f={xf*1e3:6.3f} mm  "
                  f"T_max={T_now.max():7.1f} K  S_c={sc:5.3f} m/s",
                  flush=True)
    T_now = np.asarray(s.T).squeeze()
    sel = slice(len(times) * 2 // 3, None)
    drift = np.polyfit(np.asarray(times)[sel], np.asarray(fronts)[sel], 1)[0]
    sl_disp = u_in - drift
    sc_avg = float(np.mean(np.asarray(scs)[sel]))
    print(f"\nT_ad = {T_b:.0f} K; flame thickness "
          f"{flame_thickness(xs, T_now)*1e3:.3f} mm")
    print(f"front drift {drift:+.3f} m/s -> S_L(displacement) = "
          f"{sl_disp:.3f} m/s")
    print(f"S_L(consumption, settled avg) = {sc_avg:.3f} m/s")
    print(f"wall: {_t.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
