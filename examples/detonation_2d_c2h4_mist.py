"""2D C2H4-air detonation quenching in a water mist (two-phase, 2D).

Role parity: /root/reference/examples/dfHighSpeedFoam/twoD_detC2H4WaterMist
— dfHighSpeedFoam + basicSprayCloud on a 2D channel: stoichiometric
ethylene-air (Y_C2H4 = 0.06375, Y_O2 = 0.21815, Y_N2 = 0.7181, 0_orig),
reduced mechanism C2H4_r10 (10 species, case-local yaml), domain
x in [0.2, 0.5] m x y in [0, 0.045] m (blockMeshDict, convertToMeters 0.1;
6000x900 cells in the reference, run here coarsened), ignited by three
staggered 100 atm / 3000 K boxes at the left edge (setFieldsDict); at
SOI = 5.9e-5 s — once the detonation is established — a field of 11 um
water droplets (manualInjection, liquidEvaporationBoil + RanzMarshall +
sphereDrag, no breakup) appears in the right part of the channel and the
detonation runs into it.

The reference's cloudPositions file is generated at run time (200-rank
production case); here the same fog is laid out as a uniform 2D lattice
over the mist band. Diagnostics: front speed before/in the mist and the
transverse front structure.

Usage: python examples/detonation_2d_c2h4_mist.py [--nx 600 --ny 90]
       [--mist-from 0.35] [--t-end 1.6e-4] [--platform cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=600)
    ap.add_argument("--ny", type=int, default=90)
    ap.add_argument("--t-end", type=float, default=1.6e-4)
    ap.add_argument("--mist-from", type=float, default=0.35,
                    help="x [m] where the fog band starts")
    ap.add_argument("--soi", type=float, default=5.9e-5)
    ap.add_argument("--n-parcels-x", type=int, default=60)
    ap.add_argument("--n-parcels-y", type=int, default=30)
    ap.add_argument("--n-particle", type=float, default=2.0e5)
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
    from deepflame_tpu.mesh import (StructuredMesh, zero_gradient, symmetry,
                                    empty)
    from deepflame_tpu.solvers.high_speed import (HighSpeedConfig,
                                                  HighSpeedSolver)
    from deepflame_tpu.solvers.spray import HighSpeedSpraySolver

    case = "/root/reference/examples/dfHighSpeedFoam/twoD_detC2H4WaterMist"
    mech = load_mechanism(os.path.join(case, "C2H4_r10.yaml"))
    th = make_thermo(mech, dtype)
    kin = make_kinetics(mech, dtype)
    tr = make_transport(mech, dtype)

    x_lo, Lx, Ly = 0.2, 0.3, 0.045
    nx, ny = args.nx, args.ny
    mesh = StructuredMesh.box([Lx, Ly, Ly / ny], [nx, ny, 1])

    e = (empty(), empty())
    zg = (zero_gradient(), zero_gradient())
    wall_n = (symmetry(negate=True), symmetry(negate=True))
    b_scalar = (zg, zg, e)
    bcs_U = (((symmetry(negate=True), zero_gradient()), zg, e),
             ((zg, wall_n, e)),
             (b_scalar))
    cfg = HighSpeedConfig(
        flux="HLLC", rk_order=2, limiter="vanLeer", chemistry="ode",
        ode_opts=RosenbrockOptions(rtol=1e-4, atol=1e-8, max_steps=5000),
        T_threshold=600.0)
    gas = HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin,
                          bcs_rho=b_scalar, bcs_U=bcs_U,
                          bcs_p=b_scalar, bcs_Y=b_scalar, config=cfg)

    # fog lattice in [mist_from, x_hi] x [0, Ly] (mesh frame is x - x_lo)
    mx0 = args.mist_from - x_lo
    xs_p = np.linspace(mx0, Lx * 0.995, args.n_parcels_x)
    ys_p = np.linspace(Ly * 0.02, Ly * 0.98, args.n_parcels_y)
    XX, YY = np.meshgrid(xs_p, ys_p, indexing="ij")
    half = 0.5 * Ly / ny
    positions = np.stack([XX.ravel(), YY.ravel(),
                          np.full(XX.size, half)], axis=1)
    inj = ManualInjector(positions=positions, soi=args.soi, d0=11e-6,
                         n_particle=args.n_particle, T_inject=300.0,
                         rho_liquid=997.0)
    cloud = SprayCloud(mesh=mesh, liquid=water(), injector=inj,
                       max_parcels=positions.shape[0],
                       evaporation="Spalding", breakup="none",
                       wall_interaction=())
    iH2O = mech.species_index("H2O")
    solver = HighSpeedSpraySolver(gas_solver=gas, cloud=cloud, transport=tr,
                                  vapor_index=int(iH2O))

    ns = mech.n_species
    iF, iO2, iN2 = (mech.species_index(s) for s in ("C2H4", "O2", "N2"))
    Yv = np.zeros(ns)
    Yv[iF], Yv[iO2], Yv[iN2] = 0.06375, 0.21815, 0.7181   # 0_orig fields
    Yv /= Yv.sum()
    X, Ygrid, _ = mesh.cell_centers(dtype)
    p0, T0 = 101325.0, 300.0
    wx = max(0.004, 2.5 * mesh.dx)       # setFieldsDict boxes are 4 mm wide
    hot = jnp.zeros(mesh.shape, bool)
    for (y0, y1) in ((0.0025, 0.0125), (0.0175, 0.0275), (0.0325, 0.0425)):
        hot = hot | ((X < wx) & (Ygrid >= y0) & (Ygrid < y1))
    T = jnp.where(hot, 3000.0, T0).astype(dtype)
    p = jnp.where(hot, 100.0 * p0, p0).astype(dtype)
    Y = jnp.asarray(np.tile(Yv[:, None, None, None], (1,) + mesh.shape),
                    dtype)
    s = solver.initial_state(p, T, Y)

    dt = args.cfl * mesh.dx / 3200.0
    n_steps = int(args.t_end / dt)
    out_every = max(n_steps // 40, 1)
    step = jax.jit(lambda st: solver.step(st, dt)[0])
    xs = np.asarray(X)[:, 0, 0] + x_lo
    front_t, front_x = [], []
    t_wall = time.perf_counter()
    for i in range(n_steps):
        s = step(s)
        if (i + 1) % out_every == 0:
            _, _, p_n, T_n, _ = gas.primitives(s.gas)
            p_np = np.asarray(p_n)[:, :, 0]
            ix_rows = np.argmax(p_np, axis=0)
            ix = int(np.round(ix_rows.mean()))
            front_t.append(float(s.gas.time))
            front_x.append(xs[ix])
            c = s.cloud
            m_liq = float(np.sum(np.pi / 6.0 * np.asarray(c.d) ** 3 * 997.0
                                 * np.asarray(c.n_part)
                                 * np.asarray(c.active)))
            print(f"t={float(s.gas.time)*1e6:8.2f} us  "
                  f"front={xs[ix]*1000:7.1f} mm  "
                  f"p_max={p_np.max()/1e3:9.1f} kPa  "
                  f"T_max={float(np.asarray(T_n).max()):7.1f} K  "
                  f"liquid={m_liq*1e6:8.3f} mg  "
                  f"ripple={np.ptp(ix_rows)} cells", flush=True)
            if not np.isfinite(p_np.max()):
                print("DIVERGED")
                return
    ft, fx = np.asarray(front_t), np.asarray(front_x)
    for lo, hi, tag in ((0.25, args.mist_from, "dry zone"),
                        (args.mist_from, 0.49, "mist zone")):
        sel = (fx > lo) & (fx < hi)
        if sel.sum() >= 3:
            v = np.polyfit(ft[sel], fx[sel], 1)[0]
            print(f"front speed in {tag} [{lo:.2f}, {hi:.2f}] m: {v:.0f} m/s")
    print(f"wall time: {time.perf_counter() - t_wall:.1f}s "
          f"for {n_steps} steps on {nx}x{ny}")


if __name__ == "__main__":
    main()
