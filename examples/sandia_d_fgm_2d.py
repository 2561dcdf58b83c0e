"""2D Sandia-flame-D-family jet on the flareFGM solver with a REAL table.

Role parity: /root/reference/examples/dfLowMachFoam/fgm/twoD_SandiaD_flareFGM
(dfLowMachFoam + flareFGM, tablePath flare_CH4_SandiaD_4D.tbl): the main jet
(25% CH4 / 75% air by volume, Z=1) issues into air coflow with a hot pilot
annulus; transported (Z, Zvar, c, cvar) control variables drive table
lookups for all thermochemistry. The reference's table is a download; here
data/flare_CH4_drm19_SandiaD_4D.tbl is generated from this repo's own
flamelets (tools/gen_flare_table.py --fuel CH4 --sandia).

Geometry (scaled-down 2D slab): main jet half-width from the Sandia D
nozzle (D = 7.2 mm -> half 3.6 mm), pilot annulus to 9.1 mm, coflow beyond;
U_jet scaled down from 49.6 m/s to keep the CFL tractable at example scale.

Usage: python examples/sandia_d_fgm_2d.py [--steps 400] [--platform cpu]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

TBL = os.path.join(os.path.dirname(__file__), "..", "data",
                   "flare_CH4_drm19_SandiaD_4D.tbl")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", default=TBL)
    ap.add_argument("--nx", type=int, default=96)
    ap.add_argument("--ny", type=int, default=48)
    ap.add_argument("--length", type=float, default=0.12)   # axial extent
    ap.add_argument("--height", type=float, default=0.06)
    ap.add_argument("--u-jet", type=float, default=12.0)
    ap.add_argument("--u-pilot", type=float, default=2.0)
    ap.add_argument("--u-coflow", type=float, default=0.9)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--dt", type=float, default=4e-6)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="f32")
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.combustion.fgm.table import read_flare_table
    from deepflame_tpu.mesh import (StructuredMesh, empty, fixed_value,
                                    zero_gradient)
    from deepflame_tpu.solvers.fgm import FGMSolver, FGMConfig

    table = read_flare_table(args.table, dtype=dtype)
    meta = json.load(open(args.table + ".json"))
    Z_st = meta["Z_st"]
    print(f"table {os.path.basename(args.table)}: Z_st = {Z_st:.4f}")

    nx, ny = args.nx, args.ny
    Lx, Ly = args.length, args.height
    mesh = StructuredMesh.box([Lx, Ly, Ly / ny], [nx, ny, 1])
    e = (empty(), empty())
    _, Yg, _ = mesh.cell_centers(dtype)
    yb = np.asarray((Yg[0, :, 0]))                  # y cell centers

    # inlet profiles over the y boundary column (x = 0)
    r_jet, r_pilot = 0.0036, 0.0091
    u_in = np.where(yb < r_jet, args.u_jet,
                    np.where(yb < r_pilot, args.u_pilot, args.u_coflow))
    Z_in = np.where(yb < r_jet, 1.0, 0.0)
    # pilot: burnt stoichiometric products (the Sandia D pilot role)
    c_in = np.where((yb >= r_jet) & (yb < r_pilot), 1.0, 0.0)
    Zp_in = np.where((yb >= r_jet) & (yb < r_pilot), Z_st, Z_in)

    shape_b = (1, ny, 1)
    bU = ((fixed_value(jnp.asarray(u_in.reshape(shape_b), dtype)),
           zero_gradient()), (zero_gradient(), zero_gradient()), e)
    bU0 = ((fixed_value(0.0), zero_gradient()),
           (zero_gradient(), zero_gradient()), e)
    bp = ((zero_gradient(), fixed_value(101325.0)),
          (zero_gradient(), zero_gradient()), e)
    bZ = ((fixed_value(jnp.asarray(Zp_in.reshape(shape_b), dtype)),
           zero_gradient()), (zero_gradient(), zero_gradient()), e)
    bc = ((fixed_value(jnp.asarray(c_in.reshape(shape_b), dtype)),
           zero_gradient()), (zero_gradient(), zero_gradient()), e)
    bs = ((zero_gradient(), zero_gradient()),
          (zero_gradient(), zero_gradient()), e)

    solver = FGMSolver(
        mesh=mesh, thermo=None, transport=None, combustion=None,
        bcs_U=(bU, bU0, bU0), bcs_p=bp, bcs_h=bs, bcs_Y=bc, bcs_rho=bs,
        bcs_Z=bZ, table=table,
        config=FGMConfig(solve_cvar=True, div_scheme="upwind",
                         chemistry=False))

    X, Yg, _ = mesh.cell_centers(dtype)
    Z0 = jnp.asarray(np.broadcast_to(Zp_in[None, :, None], mesh.shape),
                     dtype) * jnp.exp(-X / (0.25 * Lx))
    c0 = jnp.asarray(np.broadcast_to(c_in[None, :, None], mesh.shape),
                     dtype) * jnp.exp(-X / (0.5 * Lx))
    U0 = jnp.stack([jnp.asarray(
        np.broadcast_to(u_in[None, :, None], mesh.shape), dtype),
        jnp.zeros(mesh.shape, dtype), jnp.zeros(mesh.shape, dtype)])
    p0 = jnp.full(mesh.shape, 101325.0, dtype)
    s = solver.fgm_initial_state(p0, Z0, c0, U0)

    import time
    step = jax.jit(lambda st: solver.step(st, args.dt)[0])
    t0 = time.perf_counter()
    for i in range(args.steps):
        s = step(s)
        if (i + 1) % max(args.steps // 10, 1) == 0:
            print(f"t={float(s.time)*1e3:7.3f} ms  "
                  f"T=[{float(s.T.min()):5.0f},{float(s.T.max()):5.0f}] K  "
                  f"Z_max={float(s.Z.max()):.3f}  c_max={float(s.c.max()):.3f}  "
                  f"Zvar_max={float(s.Zvar.max()):.4f}", flush=True)
    print(f"wall: {time.perf_counter() - t0:.1f}s for {args.steps} steps")
    T = np.asarray(s.T).squeeze()
    # centerline + radial profile diagnostics (Sandia D reporting style)
    print("centerline T(x):", " ".join(
        f"{T[i, 0]:.0f}" for i in range(0, nx, nx // 8)))
    assert np.all(np.isfinite(T))
    print(f"flame: T_max = {T.max():.0f} K at "
          f"x/L = {np.unravel_index(T.argmax(), T.shape)[0] / nx:.2f}")


if __name__ == "__main__":
    main()
