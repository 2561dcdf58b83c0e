"""1D H2-air detonation attenuated by a water mist (two-phase).

Role parity: /root/reference/examples/dfHighSpeedFoam/oneD_detH2WaterMist —
dfHighSpeedFoam + basicSprayCloud (createClouds.H): a detonation established
in dry H2-air runs into a pre-dispersed field of 5 um water droplets
(manualInjection at SOI = 0.373 ms, parcels spanning x in [0.6, 1.4] m of a
1.4 m tube, nParticle 275, sphereDrag + RanzMarshall +
liquidEvaporationBoil, no breakup). Physical check: the detonation
decelerates measurably in the mist (momentum drag + evaporative heat sink).

Here the tube/mist layout is mirrored at reduced scale by default so the
case runs in minutes; --full restores the 1.4 m reference geometry.

Usage: python examples/detonation_1d_watermist.py [--cells 700] [--full]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=700)
    ap.add_argument("--length", type=float, default=1.4)
    ap.add_argument("--mist-start-frac", type=float, default=3.0 / 7.0)
    ap.add_argument("--t-end", type=float, default=7.5e-4)
    ap.add_argument("--soi", type=float, default=3.73e-4)
    ap.add_argument("--n-parcels", type=int, default=4000)
    ap.add_argument("--n-particle", type=float, default=5500.0,
                    help="droplets/parcel (reference: 275 x 80000 parcels; "
                    "rescaled to keep the same liquid loading)")
    ap.add_argument("--d0", type=float, default=5e-6)
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--cfl", type=float, default=0.3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.lagrangian.cloud import ManualInjector, SprayCloud
    from deepflame_tpu.lagrangian.liquids import water
    from deepflame_tpu.mesh import StructuredMesh, zero_gradient, symmetry, \
        empty
    from deepflame_tpu.solvers.high_speed import (HighSpeedConfig,
                                                  HighSpeedSolver)
    from deepflame_tpu.solvers.spray import HighSpeedSpraySolver

    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th = make_thermo(mech, dtype)
    kin = make_kinetics(mech, dtype)
    tr = make_transport(mech, dtype)
    n = args.cells
    Lx = args.length
    mesh = StructuredMesh.box([Lx, Lx / n, Lx / n], [n, 1, 1])
    e = (empty(), empty())
    b_scalar = ((zero_gradient(), zero_gradient()), e, e)
    b_un = ((symmetry(negate=True), zero_gradient()), e, e)
    cfg = HighSpeedConfig(
        flux="HLLC", rk_order=2, limiter="vanLeer", chemistry="ode",
        ode_opts=RosenbrockOptions(
            rtol=1e-6 if args.dtype == "f64" else 1e-4,
            atol=1e-12 if args.dtype == "f64" else 1e-8, max_steps=5000),
        T_threshold=500.0)
    gas = HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin,
                          bcs_rho=b_scalar, bcs_U=(b_un, b_scalar, b_scalar),
                          bcs_p=b_scalar, bcs_Y=b_scalar, config=cfg)

    # pre-dispersed mist parcels: [mist_start, L], uniform spacing, mid-duct
    x0 = args.mist_start_frac * Lx
    xs_p = np.linspace(x0, Lx * 0.999, args.n_parcels)
    half = 0.5 * Lx / n
    positions = np.stack([xs_p, np.full_like(xs_p, half),
                          np.full_like(xs_p, half)], axis=1)
    inj = ManualInjector(positions=positions, soi=args.soi, d0=args.d0,
                         n_particle=args.n_particle, T_inject=300.0,
                         rho_liquid=997.0)
    cloud = SprayCloud(mesh=mesh, liquid=water(), injector=inj,
                       max_parcels=args.n_parcels, evaporation="Spalding",
                       breakup="none", wall_interaction=())
    iH2O = mech.species_index("H2O")
    solver = HighSpeedSpraySolver(gas_solver=gas, cloud=cloud, transport=tr,
                                  vapor_index=int(iH2O))

    ns = mech.n_species
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    Yv = np.zeros(ns)
    Yv[iH2], Yv[iO2], Yv[iN2] = 0.02851, 0.226, 0.745
    Yv /= Yv.sum()
    X, _, _ = mesh.cell_centers(dtype)
    p0, T0 = 101325.0, 300.0
    drv = X < max(0.002 * Lx, 1.5 * mesh.dx)
    T = jnp.where(drv, 2000.0, T0).astype(dtype)
    p = jnp.where(drv, 90.0 * p0, p0).astype(dtype)
    Y = jnp.asarray(np.tile(Yv[:, None, None, None], (1,) + mesh.shape),
                    dtype)
    s = solver.initial_state(p, T, Y)

    dt = args.cfl * mesh.dx / 3500.0
    n_steps = int(args.t_end / dt)
    out_every = max(n_steps // 50, 1)
    step = jax.jit(lambda st: solver.step(st, dt)[0])
    xs = np.asarray(X).squeeze()
    front_t, front_x = [], []
    t_wall = time.perf_counter()
    for i in range(n_steps):
        s = step(s)
        if (i + 1) % out_every == 0:
            _, _, p_n, T_n, _ = gas.primitives(s.gas)
            p_n = np.asarray(p_n).squeeze()
            ix = int(np.argmax(p_n))
            n_act = int(np.asarray(s.cloud.active).sum())
            front_t.append(float(s.gas.time))
            front_x.append(xs[ix])
            print(f"t={float(s.gas.time)*1e6:8.2f} us  front={xs[ix]*1e3:7.1f} mm  "
                  f"p_max={p_n.max()/1e3:8.0f} kPa  "
                  f"T_max={float(np.asarray(T_n).max()):6.0f} K  "
                  f"parcels={n_act}", flush=True)
            if not np.isfinite(p_n.max()):
                print("DIVERGED")
                return
    ft, fx = np.asarray(front_t), np.asarray(front_x)
    dry = (fx > 0.15 * Lx) & (fx < 0.95 * x0)
    wet = (fx > 1.1 * x0) & (fx < 0.95 * Lx)
    for name, sel in (("dry", dry), ("mist", wet)):
        if sel.sum() >= 3:
            v = np.polyfit(ft[sel], fx[sel], 1)[0]
            print(f"{name} zone speed: {v:.0f} m/s")
    print(f"wall: {time.perf_counter() - t_wall:.1f}s for {n_steps} steps")


if __name__ == "__main__":
    main()
