"""1D reactive shock tube: reflected-shock autoignition (dfHighSpeedFoam
oneD_reactiveShockTube parity).

Role parity: /root/reference/examples/dfHighSpeedFoam/oneD_reactiveShockTube
— the classic dilute H2/O2/Ar reflected-shock ignition benchmark: an
incident shock (post-shock slab at T=748.472 K / p=35594 Pa moving at
-487.34 m/s, setFieldsDict) travels into quiescent 2:1:7 H2:O2:Ar
(Y = 0.01266 / 0.10124 / 0.8861) at 378.656 K / 7173 Pa, reflects off the
left wall, and the twice-shocked gas autoignites at the wall after an
induction delay; a reaction wave then chases the reflected shock
(Kurganov flux in the reference fvSchemes; endTime 230 us, 2400 cells over
1.2 m).

Printed diagnostics: wall pressure/temperature history (reflection jump +
ignition spike) and the positions of the reflected shock and reaction
front.

--inert runs the oneD_inertShockTube sibling case instead
(/root/reference/examples/dfHighSpeedFoam/oneD_inertShockTube): same
2:1:7 H2:O2:Ar gas with chemistry OFF, a hot/high-pressure driver slab
x in [0.05, 0.1] m (T 1200 K / p 80 kPa into 400 K / 8 kPa, setFieldsDict)
on 400 cells over 1 m, endTime 40 us — a pure gas-dynamics Sod-family
validation of the Kurganov flux at a 10:1 pressure ratio.

Usage: python examples/reactive_shock_tube_1d.py [--cells 2400]
       [--t-end 2.3e-4] [--platform cpu] [--flux Kurganov] [--inert]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=2400)
    ap.add_argument("--t-end", type=float, default=2.3e-4)
    ap.add_argument("--dtype", default="f64")
    ap.add_argument("--flux", default="Kurganov")   # reference fvSchemes
    ap.add_argument("--cfl", type=float, default=0.3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--inert", action="store_true",
                    help="oneD_inertShockTube parity (chemistry off)")
    args = ap.parse_args()
    if args.inert:
        args.cells = 400 if args.cells == 2400 else args.cells
        args.t_end = 4e-5 if args.t_end == 2.3e-4 else args.t_end

    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.mesh import (StructuredMesh, zero_gradient, symmetry,
                                    empty, BC)
    from deepflame_tpu.solvers.high_speed import (HighSpeedConfig,
                                                  HighSpeedSolver)

    mech = load_mechanism(
        "/root/reference/examples/dfHighSpeedFoam/oneD_reactiveShockTube/"
        "H2_AR.yaml")
    th = make_thermo(mech, dtype)
    kin = make_kinetics(mech, dtype)
    n = args.cells
    Lx = 1.0 if args.inert else 1.2
    mesh = StructuredMesh.box([Lx, Lx / n, Lx / n], [n, 1, 1])

    e = (empty(), empty())
    b_scalar = ((zero_gradient(), zero_gradient()), e, e)
    # left: reflecting wall; right: inletOutlet feeding the post-shock
    # inflow (0_orig/U)
    b_un = ((symmetry(negate=True), BC("inletOutlet", -487.34)), e, e)
    if args.inert:   # both ends open, quiescent far field
        b_un = ((BC("inletOutlet", 0.0), BC("inletOutlet", 0.0)), e, e)
    cfg = HighSpeedConfig(
        flux=args.flux, rk_order=2, limiter="vanLeer",
        chemistry="none" if args.inert else "ode",
        ode_opts=RosenbrockOptions(rtol=1e-6 if args.dtype == "f64" else 1e-4,
                                   atol=1e-12 if args.dtype == "f64" else 1e-8,
                                   max_steps=5000),
        T_threshold=500.0)
    solver = HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin,
                             bcs_rho=b_scalar,
                             bcs_U=(b_un, b_scalar, b_scalar),
                             bcs_p=b_scalar, bcs_Y=b_scalar, config=cfg)

    ns = mech.n_species
    iH2, iO2, iAR = (mech.species_index(s) for s in ("H2", "O2", "AR"))
    Yv = np.zeros(ns)
    Yv[iH2], Yv[iO2], Yv[iAR] = 0.01266, 0.10124, 0.8861
    Yv /= Yv.sum()
    X, _, _ = mesh.cell_centers(dtype)
    if args.inert:
        # oneD_inertShockTube setFieldsDict: hot driver in x [0.05, 0.1],
        # T 1200 K / p 80 kPa into 400 K / 8 kPa, quiescent
        slab = (X > 0.05) & (X < 0.1)
        T = jnp.where(slab, 1200.0, 400.0).astype(dtype)
        p = jnp.where(slab, 80000.0, 8000.0).astype(dtype)
        U0 = jnp.zeros_like(T)
    else:
        # setFieldsDict: post-incident-shock slab in x [0.06, 0.12]
        slab = (X > 0.06) & (X < 0.12)
        T = jnp.where(slab, 748.472, 378.656).astype(dtype)
        p = jnp.where(slab, 35594.0, 7173.0).astype(dtype)
        U0 = jnp.where(slab, -487.34, 0.0).astype(dtype)
    Y = jnp.asarray(np.tile(Yv[:, None, None, None], (1,) + mesh.shape),
                    dtype)
    s = solver.initial_state(p, T, Y, U=jnp.stack(
        [U0, jnp.zeros_like(U0), jnp.zeros_like(U0)]))

    a_bound = 1600.0   # m/s: reflected shock + reaction wave bound (Ar-rich)
    dt = args.cfl * mesh.dx / a_bound
    n_steps = int(args.t_end / dt)
    out_every = max(n_steps // 60, 1)
    step = jax.jit(lambda st: solver.step(st, dt)[0])
    xs = np.asarray(X).squeeze()
    t_wall = time.perf_counter()
    t_ign = None
    for i in range(n_steps):
        s = step(s)
        if (i + 1) % out_every == 0:
            rho_n, U_n, p_now, T_now, Y_n = solver.primitives(s)
            p_now = np.asarray(p_now).squeeze()
            T_now = np.asarray(T_now).squeeze()
            # reflected shock = rightmost strong gradient left of 0.2 m;
            # reaction front = rightmost T > 1500 K
            ix_p = int(np.argmax(p_now))
            hot = np.where(T_now > 1500.0)[0]
            x_rx = xs[hot[-1]] if hot.size else float("nan")
            if t_ign is None and T_now[0] > 1500.0:
                t_ign = float(s.time)
            print(f"t={float(s.time)*1e6:8.2f} us  p_wall="
                  f"{p_now[0]/1e3:7.1f} kPa  T_wall={T_now[0]:7.1f} K  "
                  f"p_max@{xs[ix_p]*100:6.2f} cm = {p_now.max()/1e3:7.1f} "
                  f"kPa  x_reaction={x_rx*100 if x_rx==x_rx else -1:6.2f} cm",
                  flush=True)
            if not np.isfinite(p_now.max()):
                raise RuntimeError("diverged")
    print(f"wall: {time.perf_counter() - t_wall:.1f}s")
    if t_ign is not None:
        print(f"wall-ignition time (T_wall > 1500 K): {t_ign*1e6:.1f} us")


if __name__ == "__main__":
    main()
