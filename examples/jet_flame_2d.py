"""2D turbulent jet diffusion flame (Sandia-D-family configuration).

Role parity: the reference's Sandia D cases (examples/dfLowMachFoam
SandiaD_EDC / SandiaD_flareFGM / SandiaD_DeePFGM): a central fuel jet into
air coflow with a turbulence-chemistry-interaction combustion model. This
script runs an H2/N2 jet into air with the k-epsilon RAS model and the EDC
(or PaSR) TCI model — exercising per-species inlet boundary conditions,
open outflow, and the full TCI path.

Usage: python examples/jet_flame_2d.py [--model EDC|PaSR|laminar]
       [--steps 400] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="EDC")
    ap.add_argument("--cells", type=int, default=24)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--dt", type=float, default=2e-6)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, "f64")
    import jax.numpy as jnp

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.combustion import EDC, Laminar, PaSR
    from deepflame_tpu.mesh import (StructuredMesh, fixed_value,
                                    zero_gradient, empty)
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
    from deepflame_tpu.turbulence.ras import KEpsilon

    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    ns = mech.n_species
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))

    # domain: x streamwise (jet axis), y cross-stream
    nx, ny = 4 * args.cells, args.cells
    Lx, Ly = 0.08, 0.02
    mesh = StructuredMesh.box([Lx, Ly, Ly / ny], [nx, ny, 1],
                              origin=(0.0, -Ly / 2, 0.0))
    e = (empty(), empty())
    X, Yg, _ = mesh.cell_centers()
    jet_r = 0.002
    in_jet = np.abs(np.asarray(Yg)[0, :, 0]) < jet_r

    # per-species inlet mass fractions: fuel (70% H2/30% N2 by mass) in the
    # jet, air outside — per-species fixedValue arrays via list-of-BCs
    Y_in = np.zeros((ns, ny))
    Y_in[iH2, :] = np.where(in_jet, 0.30, 0.0)
    Y_in[iN2, :] = np.where(in_jet, 0.70, 0.767)
    Y_in[iO2, :] = np.where(in_jet, 0.0, 0.233)
    bcs_Y = []
    for i in range(ns):
        val = jnp.asarray(Y_in[i][None, :, None])
        bcs_Y.append(((fixed_value(val), zero_gradient()),
                      (zero_gradient(), zero_gradient()), e))
    u_jet, u_co = 40.0, 1.0
    u_prof = jnp.asarray(np.where(in_jet, u_jet, u_co)[None, :, None])
    T_in = jnp.asarray(np.where(in_jet, 400.0, 1400.0)[None, :, None])
    # pilot trick: hot coflow ignites the mixing layer (standalone demo)
    bU = ((fixed_value(u_prof), zero_gradient()),
          (zero_gradient(), zero_gradient()), e)
    bU0 = ((fixed_value(0.0), zero_gradient()),
           (zero_gradient(), zero_gradient()), e)
    bp = ((zero_gradient(), fixed_value(101325.0)),
          (zero_gradient(), zero_gradient()), e)
    Yt_in = jnp.moveaxis(jnp.asarray(Y_in)[:, None, :, None], 0, -1)
    h_prof = th.h_mass(T_in, Yt_in)
    bh = ((fixed_value(h_prof), zero_gradient()),
          (zero_gradient(), zero_gradient()), e)
    rho_prof = th.rho(jnp.asarray(101325.0), T_in, Yt_in)
    brho = ((fixed_value(rho_prof), zero_gradient()),
            (zero_gradient(), zero_gradient()), e)

    opts = RosenbrockOptions(rtol=1e-6, atol=1e-12, max_steps=20000, grow=10.0)
    models = {
        "EDC": EDC(th, kin, ode_opts=opts),
        "PaSR": PaSR(th, kin, ode_opts=opts),
        "laminar": Laminar(th, kin, ode_opts=opts),
    }
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=models[args.model],
        bcs_U=(bU, bU0, bU0), bcs_p=bp, bcs_h=bh, bcs_Y=bcs_Y, bcs_rho=brho,
        config=LowMachConfig(chemistry=True, div_scheme="upwind",
                             inert_index=int(iN2)),
        turbulence=KEpsilon())

    # initial: coflow air everywhere (hot), jet develops
    Y0 = np.zeros((ns,) + mesh.shape)
    Y0[iN2], Y0[iO2] = 0.767, 0.233
    T0 = jnp.full(mesh.shape, 1400.0)
    s = solver.initial_state(jnp.full(mesh.shape, 101325.0), T0,
                             jnp.asarray(Y0),
                             k0=u_jet**2 * 0.01, eps0=u_jet**3 * 0.1 / jet_r)
    step = jax.jit(lambda st: solver.step(st, args.dt))
    import time as _t
    t0 = _t.perf_counter()
    for i in range(args.steps):
        s, diag = step(s)
        if (i + 1) % 50 == 0:
            print(f"t={float(s.time)*1e3:7.3f} ms  "
                  f"T=[{float(s.T.min()):6.1f},{float(s.T.max()):7.1f}] K  "
                  f"u_max={float(jnp.abs(s.U[0]).max()):6.1f}  "
                  f"YH2_max={float(s.Y[iH2].max()):.4f}  "
                  f"k_max={float(s.turb[0].max()):.2f}", flush=True)
    Tn = np.asarray(s.T).squeeze()
    # centerline profile
    cl = Tn[:, ny // 2]
    print(f"\ncenterline T at x/Lx = 0.25/0.5/0.75: "
          f"{cl[nx//4]:.0f} / {cl[nx//2]:.0f} / {cl[3*nx//4]:.0f} K")
    print(f"flame (T>1600 K) cells: {(Tn > 1600).sum()}")
    print(f"wall: {_t.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
