"""1D H2-air detonation (dfHighSpeedFoam oneD_detonationH2 parity).

Reference anchor: detonation propagation speed 1979.33 m/s +- 1% (vs
Chapman-Jouguet theory), measured as the slope of the max-pressure front
position over time (/root/reference/test/corrtest.cpp:47-49, fed by the
fieldMinMax function object).

Case setup mirrors the reference test exactly (test/oneD_detonationH2):
stoichiometric H2-air (Y_H2=0.02851, Y_O2=0.226, Y_N2=0.745) at 1 atm /
300 K in a 5 m tube with 625 cells (blockMeshDict), ignited by a 90 atm /
2000 K driver at the left wall (setFieldsDict), mechanism H2_Li. The CJ
speed of this mixture computed from this repo's own thermochemistry
(deepflame_tpu.utils.cj) is 1977 m/s.

Usage: python examples/detonation_1d.py [--cells 1200] [--length 0.3]
       [--t-end 1e-4] [--dtype f64|f32] [--flux HLLC]
Prints front position vs time and the fitted speed.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=625)
    ap.add_argument("--length", type=float, default=5.0)
    ap.add_argument("--t-end", type=float, default=2.2e-3)
    ap.add_argument("--dtype", default="f64")
    ap.add_argument("--flux", default="HLLC")
    ap.add_argument("--cfl", type=float, default=0.3)
    ap.add_argument("--driver-frac", type=float, default=0.002)
    ap.add_argument("--driver-pratio", type=float, default=90.0)
    ap.add_argument("--driver-T", type=float, default=2000.0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.mesh import StructuredMesh, zero_gradient, symmetry, empty
    from deepflame_tpu.solvers.high_speed import (HighSpeedConfig,
                                                  HighSpeedSolver)

    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th = make_thermo(mech, dtype)
    kin = make_kinetics(mech, dtype)
    n = args.cells
    Lx = args.length
    mesh = StructuredMesh.box([Lx, Lx / n, Lx / n], [n, 1, 1])

    # reflective left wall (u -> -u), transmissive right
    e = (empty(), empty())
    b_scalar = ((zero_gradient(), zero_gradient()), e, e)
    b_un = ((symmetry(negate=True), zero_gradient()), e, e)
    cfg = HighSpeedConfig(
        flux=args.flux, rk_order=2, limiter="vanLeer", chemistry="ode",
        ode_opts=RosenbrockOptions(rtol=1e-6 if args.dtype == "f64" else 1e-4,
                                   atol=1e-12 if args.dtype == "f64" else 1e-8,
                                   max_steps=5000),
        T_threshold=500.0)
    solver = HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin,
                             bcs_rho=b_scalar,
                             bcs_U=(b_un, b_scalar, b_scalar),
                             bcs_p=b_scalar, bcs_Y=b_scalar, config=cfg)

    ns = mech.n_species
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    # stoichiometric H2-air (test/oneD_detonationH2/0_orig)
    Yv = np.zeros(ns)
    Yv[iH2], Yv[iO2], Yv[iN2] = 0.02851, 0.226, 0.745
    Yv /= Yv.sum()
    X, _, _ = mesh.cell_centers(dtype)
    p0, T0 = 101325.0, 300.0
    # hot high-pressure driver for direct initiation (>= 1 cell)
    drv_len = max(args.driver_frac * Lx, 1.5 * mesh.dx)
    driver = X < drv_len
    T = jnp.where(driver, args.driver_T, T0).astype(dtype)
    p = jnp.where(driver, args.driver_pratio * p0, p0).astype(dtype)
    Y = jnp.asarray(np.tile(Yv[:, None, None, None], (1,) + mesh.shape), dtype)
    s = solver.initial_state(p, T, Y)

    # time stepping at fixed CFL against a generous wave-speed bound
    a_bound = 3500.0   # m/s: detonation front speed + margin
    dt = args.cfl * mesh.dx / a_bound
    n_steps = int(args.t_end / dt)
    out_every = max(n_steps // 60, 1)

    step = jax.jit(lambda s: solver.step(s, dt)[0])
    xs = np.asarray(X).squeeze()
    front_t, front_x = [], []
    t_wall = time.perf_counter()
    for i in range(n_steps):
        s = step(s)
        if (i + 1) % out_every == 0:
            p_now = np.asarray(solver.primitives(s)[2]).squeeze()
            T_now = np.asarray(solver.primitives(s)[3]).squeeze()
            ix = int(np.argmax(p_now))
            t_now = float(s.time)
            front_t.append(t_now)
            front_x.append(xs[ix])
            rho_n, U_n, _, _, Y_n = solver.primitives(s)
            # burned-zone diagnostic: fuel leftover well behind the front
            behind = xs < (xs[ix] - 0.02)
            h2_left = float(np.asarray(Y_n[iH2]).squeeze()[behind].max()) \
                if behind.sum() > 2 else float("nan")
            print(f"t={t_now*1e6:8.2f} us  front={xs[ix]*1000:7.2f} mm  "
                  f"p_max={p_now.max()/1e3:8.1f} kPa  T_max={T_now.max():7.1f} K  "
                  f"Y_H2_behind={h2_left:.4f}/{Yv[iH2]:.4f}",
                  flush=True)
            if not np.isfinite(p_now.max()):
                print("DIVERGED")
                return
    # fit the speed over the established-propagation window (drop the first
    # third: ignition transient)
    ft = np.asarray(front_t)
    fx = np.asarray(front_x)
    sel = (fx > 0.3 * Lx) & (fx < 0.95 * Lx)
    if sel.sum() >= 4:
        v = np.polyfit(ft[sel], fx[sel], 1)[0]
        print(f"\nDetonation speed: {v:.1f} m/s  (CJ anchor 1979.33 +- 1%)")
        print(f"deviation: {100 * (v - 1979.33) / 1979.33:+.2f}%")
    print(f"wall time: {time.perf_counter() - t_wall:.1f}s for {n_steps} steps")


if __name__ == "__main__":
    main()
