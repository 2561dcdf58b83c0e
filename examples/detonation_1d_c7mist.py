"""1D n-heptane two-phase detonation: vapor-phase detonation entering a
droplet-laden region (dfHighSpeedFoam oneD_detC7H16Mist parity).

Role parity: /root/reference/examples/dfHighSpeedFoam/oneD_detC7H16Mist —
a 3.5 m tube (blockMeshDict: x in [1.0, 4.5] m, 70000 cells), one-step C7
mechanism (C7_oneStep.yaml). Layout (setFieldsDict + constant/
cloudPositions):
  - driver: x in [1.00, 1.02] m at 2500 K / 5 MPa
  - near field x in [1.0, 1.5]: stoichiometric-rich C7H16 vapor
    (Y_C7H16 = 0.0622) at 300 K / 1 atm — pure vapor detonation zone
  - far field x in [1.5, 4.5]: LEAN vapor (phi = 0.6, Y_C7H16 = 0.03828)
    PLUS 60000 pre-dispersed 10 um liquid heptane parcels (nParticle 22,
    massTotal 4.5858e-7 kg, manualInjection at SOI 0,
    liquidEvaporationBoil) — the detonation must strip/evaporate droplet
    fuel to sustain itself.
Physical check: the detonation survives the vapor->spray transition, with
a speed deficit in the droplet zone relative to the vapor zone (finite
evaporation time shifts heat release behind the front).

The default runs at reduced resolution (dx 1 mm vs the reference 0.05 mm)
and reduced parcel count with the reference's liquid LOADING (kg liquid
per m^3 of tube) preserved exactly.

Usage: python examples/detonation_1d_c7mist.py [--cells 3500] [--platform cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CASE = "/root/reference/examples/dfHighSpeedFoam/oneD_detC7H16Mist"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=3500)
    ap.add_argument("--length", type=float, default=3.5)
    ap.add_argument("--t-end", type=float, default=1.5e-3)
    ap.add_argument("--n-parcels", type=int, default=4000)
    ap.add_argument("--d0", type=float, default=10e-6)
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
    from deepflame_tpu.lagrangian.liquids import n_heptane
    from deepflame_tpu.mesh import StructuredMesh, zero_gradient, symmetry, \
        empty
    from deepflame_tpu.solvers.high_speed import (HighSpeedConfig,
                                                  HighSpeedSolver)
    from deepflame_tpu.solvers.spray import HighSpeedSpraySolver

    mech = load_mechanism(os.path.join(CASE, "C7_oneStep.yaml"))
    th = make_thermo(mech, dtype)
    kin = make_kinetics(mech, dtype)
    tr = make_transport(mech, dtype)
    n = args.cells
    Lx = args.length                       # reference: 3.5 m (x-1.0)
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

    # mist zone: reference x in [1.5, 4.5] -> here [0.5/3.5, 1.0] * Lx;
    # liquid loading preserved: 4.5858e-7 kg over a 3 m x 0.01 m x 0.001 m
    # tube = 0.015286 kg/m^3
    x_mist = (0.5 / 3.5) * Lx
    loading = 4.5858e-7 / (3.0 * 0.01 * 0.001)       # kg liquid / m^3
    mist_vol = (Lx - x_mist) * (Lx / n) ** 2
    rho_l = 680.0
    m_drop = rho_l * np.pi / 6.0 * args.d0 ** 3
    n_particle = loading * mist_vol / (args.n_parcels * m_drop)
    xs_p = np.linspace(x_mist, Lx * 0.999, args.n_parcels)
    half = 0.5 * Lx / n
    positions = np.stack([xs_p, np.full_like(xs_p, half),
                          np.full_like(xs_p, half)], axis=1)
    inj = ManualInjector(positions=positions, soi=0.0, d0=args.d0,
                         n_particle=float(n_particle), T_inject=300.0,
                         rho_liquid=rho_l)
    cloud = SprayCloud(mesh=mesh, liquid=n_heptane(), injector=inj,
                       max_parcels=args.n_parcels, evaporation="Spalding",
                       breakup="none", wall_interaction=())
    iC7 = mech.species_index("C7H16")
    solver = HighSpeedSpraySolver(gas_solver=gas, cloud=cloud, transport=tr,
                                  vapor_index=int(iC7))

    ns = mech.n_species
    iO2, iN2 = (mech.species_index(s) for s in ("O2", "N2"))
    X, _, _ = mesh.cell_centers(dtype)
    Xs = np.asarray(X)
    # near field: Y_C7 0.0622 / O2 0.21851 / N2 0.71929 (0_orig);
    # far (mist) field: Y_C7 0.03828, O2/N2 renormalized (setFieldsDict)
    Y = np.zeros((ns,) + mesh.shape)
    near = Xs < x_mist
    yc7 = np.where(near, 0.0622, 0.03828)
    rest = 1.0 - yc7
    Y[iC7] = yc7
    Y[iO2] = rest * (0.21851 / (0.21851 + 0.71929))
    Y[iN2] = rest * (0.71929 / (0.21851 + 0.71929))
    # driver: reference slab is 2 cm; keep >= 3 cells at reduced resolution
    drv_len = max(0.02 / 3.5 * Lx, 3.0 * Lx / n)
    drv = Xs < drv_len
    T = jnp.asarray(np.where(drv, 2500.0, 300.0), dtype)
    p = jnp.asarray(np.where(drv, 5e6, 1e5), dtype)
    s = solver.initial_state(p, T, jnp.asarray(Y, dtype))

    dt = args.cfl * mesh.dx / 2500.0
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
            print(f"t={float(s.gas.time)*1e6:8.2f} us  "
                  f"front={xs[ix]*1e3:7.1f} mm  "
                  f"p_max={p_n.max()/1e3:8.0f} kPa  "
                  f"T_max={float(np.asarray(T_n).max()):6.0f} K  "
                  f"parcels={n_act}", flush=True)
            if not np.isfinite(p_n.max()):
                print("DIVERGED")
                return
    ft, fx = np.asarray(front_t), np.asarray(front_x)
    vap = (fx > 0.15 * x_mist) & (fx < 0.95 * x_mist)
    mist = (fx > 1.3 * x_mist) & (fx < 0.95 * Lx)
    for name, sel in (("vapor zone", vap), ("mist zone", mist)):
        if sel.sum() >= 3:
            v = np.polyfit(ft[sel], fx[sel], 1)[0]
            print(f"{name} speed: {v:.0f} m/s")
    print(f"wall: {time.perf_counter() - t_wall:.1f}s for {n_steps} steps")


if __name__ == "__main__":
    main()
