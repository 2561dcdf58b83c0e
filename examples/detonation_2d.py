"""2D H2-air detonation channel (dfHighSpeedFoam twoD_detonationH2 parity).

Reference case (/root/reference/examples/dfHighSpeedFoam/twoD_detonationH2):
a 2 m x 0.1 m channel, 2000x100 cells, diluted-stoichiometric H2-air
(Y_H2 = 0.01724, Y_O2 = 0.13793, Y_N2 = 0.84483, 0_orig/{H2,O2,N2}),
mechanism H2_Ja (case-local yaml), ignited by THREE staggered 100 atm /
2000 K hot boxes at the left wall (system/setFieldsDict) so the front is
born multi-dimensional and develops transverse-wave (cellular) structure.

This script reproduces that configuration at a configurable resolution
(default a 4x-coarsened smoke scale; --full matches the reference's
2000x100). Diagnostics: front position/speed from the max-pressure
x-location (the fieldMinMax pattern corrtest.cpp uses in 1D) plus the
transverse pressure variation across the front — the 2D signature the 1D
case cannot show.

Usage: python examples/detonation_2d.py [--nx 500 --ny 25] [--full]
       [--t-end 4e-4] [--dtype f32] [--platform cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=500)
    ap.add_argument("--ny", type=int, default=25)
    ap.add_argument("--full", action="store_true",
                    help="reference resolution 2000x100")
    ap.add_argument("--t-end", type=float, default=4e-4)
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--flux", default="HLLC")
    ap.add_argument("--cfl", type=float, default=0.3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--amr", action="store_true",
                    help="front-shaped AMR: per-y-row moving fine patches "
                         "(FrontPatchAMR2D), x-refined by --amr-ratio")
    ap.add_argument("--amr-ratio", type=int, default=4)
    ap.add_argument("--amr-pc", type=int, default=24,
                    help="patch width in coarse cells")
    ap.add_argument("--amr-rows", type=int, default=5)
    args = ap.parse_args()
    if args.full:
        args.nx, args.ny = 2000, 100

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.mesh import (StructuredMesh, zero_gradient, symmetry,
                                    empty)
    from deepflame_tpu.solvers.high_speed import (HighSpeedConfig,
                                                  HighSpeedSolver)

    case = "/root/reference/examples/dfHighSpeedFoam/twoD_detonationH2"
    mech = load_mechanism(os.path.join(case, "H2_Ja.yaml"))
    th = make_thermo(mech, dtype)
    kin = make_kinetics(mech, dtype)

    Lx, Ly = 2.0, 0.1                 # blockMeshDict vertices
    nx, ny = args.nx, args.ny
    mesh = StructuredMesh.box([Lx, Ly, Ly / ny], [nx, ny, 1])

    # left reflective wall, right transmissive, slip walls top/bottom
    e = (empty(), empty())
    zg = (zero_gradient(), zero_gradient())
    wall_n = (symmetry(negate=True), symmetry(negate=True))
    b_scalar = (zg, zg, e)
    bcs_U = ((((symmetry(negate=True), zero_gradient()), zg, e)),  # u
             ((zg, wall_n, e)),                                    # v
             (b_scalar))                                           # w
    cfg = HighSpeedConfig(
        flux=args.flux, rk_order=2, limiter="vanLeer", chemistry="ode",
        ode_opts=RosenbrockOptions(rtol=1e-6 if args.dtype == "f64" else 1e-4,
                                   atol=1e-12 if args.dtype == "f64" else 1e-8,
                                   max_steps=5000),
        T_threshold=500.0)
    solver = HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin,
                             bcs_rho=b_scalar, bcs_U=bcs_U,
                             bcs_p=b_scalar, bcs_Y=b_scalar, config=cfg)

    ns = mech.n_species
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    Yv = np.zeros(ns)
    Yv[iH2], Yv[iO2], Yv[iN2] = 0.01724, 0.13793, 0.84483   # 0_orig fields
    Yv /= Yv.sum()
    X, Ygrid, _ = mesh.cell_centers(dtype)
    p0, T0 = 101325.0, 300.0
    # three staggered igniter boxes (setFieldsDict), widened to >= 2 cells
    wx = max(0.002, 2.5 * mesh.dx)
    hot = jnp.zeros(mesh.shape, bool)
    for (y0, y1) in ((0.001, 0.003), (0.004, 0.006), (0.007, 0.009)):
        hot = hot | ((X < wx) & (Ygrid >= y0) & (Ygrid < y1))
    T = jnp.where(hot, 2000.0, T0).astype(dtype)
    p = jnp.where(hot, 100.0 * p0, p0).astype(dtype)
    Y = jnp.asarray(np.tile(Yv[:, None, None, None], (1,) + mesh.shape), dtype)
    if args.amr:
        from deepflame_tpu.mesh.patch_amr import FrontPatchAMR2D
        amr = FrontPatchAMR2D.build(solver, pc=args.amr_pc,
                                    n_rows=args.amr_rows,
                                    ratio=args.amr_ratio, buffer_c=4,
                                    buffer_y=3)
        s = amr.initial_state(p, T, Y)
        r, by = args.amr_ratio, 3
        cu_amr = nx * ny + args.amr_rows * (args.amr_pc * r) \
            * (ny // args.amr_rows + 2 * by) * r
        cu_fine = (nx * r) * ny * r
        print(f"AMR cell-updates/coarse-step: {cu_amr} vs uniform-x-fine "
              f"{cu_fine} ({cu_fine / cu_amr:.1f}x fewer)")
    else:
        s = solver.initial_state(p, T, Y)

    a_bound = 3200.0
    dt = args.cfl * mesh.dx / a_bound
    n_steps = int(args.t_end / dt)
    out_every = max(n_steps // 40, 1)
    if args.amr:
        step = jax.jit(lambda st: amr.step(st, dt)[0])
    else:
        step = jax.jit(lambda st: solver.step(st, dt)[0])

    xs = np.asarray(X)[:, 0, 0]
    front_t, front_x = [], []
    t_wall = time.perf_counter()
    for i in range(n_steps):
        s = step(s)
        if (i + 1) % out_every == 0:
            _, _, p_now, T_now, _ = solver.primitives(
                s.coarse if args.amr else s)
            p_np = np.asarray(p_now)[:, :, 0]
            # per-row front position; mean = front location, spread =
            # transverse (cellular) structure
            ix_rows = np.argmax(p_np, axis=0)
            ix = int(np.round(ix_rows.mean()))
            front_t.append(float(s.coarse.time if args.amr else s.time))
            front_x.append(xs[ix])
            p_line = p_np[ix]             # pressure across the front
            t_now = float(s.coarse.time if args.amr else s.time)
            print(f"t={t_now*1e6:8.2f} us  front={xs[ix]*1000:7.1f} mm"
                  f"  p_max={p_np.max()/1e3:9.1f} kPa"
                  f"  T_max={float(np.asarray(T_now).max()):7.1f} K"
                  f"  transverse dp/p={(p_line.max()-p_line.min())/p_line.mean():6.3f}"
                  f"  front ripple={np.ptp(ix_rows)} cells", flush=True)
            if not np.isfinite(p_np.max()):
                print("DIVERGED")
                return
    ft, fx = np.asarray(front_t), np.asarray(front_x)
    sel = (fx > 0.25 * Lx) & (fx < 0.95 * Lx)
    if sel.sum() >= 4:
        v = np.polyfit(ft[sel], fx[sel], 1)[0]
        print(f"\n2D detonation speed: {v:.1f} m/s (CJ of this diluted "
              f"mixture ~ 1890-1990 m/s band; 1D anchor 1979.33 for the "
              f"test mixture)")
    print(f"wall time: {time.perf_counter() - t_wall:.1f}s "
          f"for {n_steps} steps on {nx}x{ny}")


if __name__ == "__main__":
    main()
