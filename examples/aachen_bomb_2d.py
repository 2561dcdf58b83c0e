"""2D aachenBomb n-heptane spray combustion (dfSprayFoam parity).

Role parity: /root/reference/test/aachenBomb_2D — the constant-volume spray
bomb: n-heptane injected into hot compressed air, evaporating, mixing and
igniting (one-step C7H16 mechanism). The reference CI asserts station
temperatures at t = 2.3 ms (corrtest.cpp:73-78); this script writes probe
time series at the same kind of stations.

Usage: python examples/aachen_bomb_2d.py [--t-end 1e-3] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=40)
    ap.add_argument("--t-end", type=float, default=1e-3)
    ap.add_argument("--dt", type=float, default=1e-6)
    ap.add_argument("--dtype", default="f64")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="postProcessing_aachen")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.combustion import Laminar
    from deepflame_tpu.lagrangian.cloud import ConeInjector, SprayCloud
    from deepflame_tpu.lagrangian.liquids import n_heptane
    from deepflame_tpu.mesh import StructuredMesh, zero_gradient, empty
    from deepflame_tpu.runtime import Probes, FunctionObjectSet
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
    from deepflame_tpu.solvers.spray import SpraySolver

    mech = load_mechanism("/root/reference/mechanisms/C7H16/C7_oneStep.yaml")
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)
    # aachenBomb geometry: 0.02 x 0.1 m bomb (2D slice)
    W_b, H_b = 0.02, 0.1
    n = args.cells
    mesh = StructuredMesh.box([W_b, H_b, W_b / n * 2], [n, 5 * n, 1],
                              origin=(-W_b / 2, -H_b, 0.0))
    e = (empty(), empty())
    b = ((zero_gradient(), zero_gradient()),
         (zero_gradient(), zero_gradient()), e)
    comb = Laminar(th, kin, ode_opts=RosenbrockOptions(
        rtol=1e-6 if args.dtype == "f64" else 1e-4,
        atol=1e-12 if args.dtype == "f64" else 1e-8, max_steps=20000,
        grow=10.0))
    gas_solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=comb,
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=True,
                             inert_index=int(mech.species_index("N2"))))
    # injector at the top center, spraying down (aachenBomb unitInjector)
    inj = ConeInjector(position=(0.0, -0.002, W_b / n),
                      direction=(0.0, -1.0, 0.0), cone_angle_deg=20.0,
                      u_mag=150.0, mdot=1e-4,
                      t_start=0.0, t_end=1.25e-3, d_mean=2e-5,
                      parcels_per_step=16, T_inject=320.0)
    cloud = SprayCloud(mesh=mesh, liquid=n_heptane(), injector=inj,
                       max_parcels=8192, evaporation="Spalding",
                       breakup="ReitzDiwakar")
    iF = mech.species_index("C7H16")
    solver = SpraySolver(gas_solver=gas_solver, cloud=cloud, fuel_index=iF)

    ns = mech.n_species
    Y = np.zeros((ns,) + mesh.shape)
    Y[mech.species_index("O2")] = 0.23
    Y[mech.species_index("N2")] = 0.77
    # hot compressed air (aachenBomb: ~800 K, 5 MPa at start of injection)
    s = solver.initial_state(jnp.full(mesh.shape, 5e6, dtype),
                             jnp.full(mesh.shape, 800.0, dtype),
                             jnp.asarray(Y, dtype))

    stations = [(0.0, -0.01, 0.0), (0.0, -0.03, 0.0), (0.0, -0.05, 0.0),
                (0.0, -0.07, 0.0)]
    probes = Probes(mesh, stations, ["T"], out_dir=f"{args.out}/probes")
    fos = FunctionObjectSet([probes])

    dt = args.dt
    n_steps = int(args.t_end / dt)
    step = jax.jit(lambda st: solver.step(st, dt))
    import time as _t
    t0 = _t.perf_counter()
    for i in range(n_steps):
        s, diag = step(s)
        if (i + 1) % 25 == 0:
            fos(float(s.gas.time), {"T": np.asarray(s.gas.T)})
            print(f"t={float(s.gas.time)*1e3:7.3f} ms  "
                  f"T=[{float(s.gas.T.min()):6.1f},{float(s.gas.T.max()):7.1f}] "
                  f"parcels={int(diag['cloud_n_active'])} "
                  f"liq={float(diag['cloud_liquid_mass'])*1e6:8.3f} mg "
                  f"Yf_max={float(s.gas.Y[iF].max()):.4f}", flush=True)
    fos.write()
    print(f"wall: {_t.perf_counter() - t0:.1f}s; station T: ",
          [f"{float(np.asarray(s.gas.T)[probes.idx[k]]):.1f}"
           for k in range(4)])


if __name__ == "__main__":
    main()
