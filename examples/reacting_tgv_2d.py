"""2D reacting Taylor-Green vortex (dfLowMachFoam twoD_reactingTGV parity).

Role parity: /root/reference/test/dfLowMachFoam/twoD_reactingTGV — premixed
H2/air in a periodic box with TGV initial velocity and a hot ignition region;
the reference CI asserts sampled temperatures at t = 0.1..0.5 ms
(corrtest.cpp:51-57). This script runs the case and writes fieldMinMax +
line-sample time series in the same postProcessing layout.

Usage: python examples/reacting_tgv_2d.py [--cells 64] [--t-end 5e-4]
       [--platform cpu|None] [--dtype f32|f64]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=64)
    ap.add_argument("--t-end", type=float, default=5e-4)
    ap.add_argument("--dt", type=float, default=2.5e-7)
    ap.add_argument("--dtype", default="f64")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="postProcessing_tgv")
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.combustion import Laminar
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.runtime import (ControlDict, FieldMinMax, LineSample,
                                       FunctionObjectSet)
    from deepflame_tpu.runtime.driver import run_case
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig

    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)
    n = args.cells
    L = 2.0 * np.pi * 1e-3          # the reference case: ~2 pi mm box
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    comb = Laminar(th, kin, ode_opts=RosenbrockOptions(
        rtol=1e-6 if args.dtype == "f64" else 1e-4,
        atol=1e-12 if args.dtype == "f64" else 1e-8,
        max_steps=20000, grow=10.0))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=comb,
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=True,
                             inert_index=int(mech.species_index("N2"))))
    ns = mech.n_species
    Yu = np.zeros(ns)
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    Yu[iH2], Yu[iO2], Yu[iN2] = 0.0285, 0.2264, 0.7451
    X, Yg, _ = mesh.cell_centers(dtype)
    k = 2.0 * np.pi / L
    U0 = 5.0
    U = jnp.stack([U0 * jnp.sin(k * X) * jnp.cos(k * Yg),
                   -U0 * jnp.cos(k * X) * jnp.sin(k * Yg),
                   jnp.zeros(mesh.shape)])
    # hot ignition kernel at the box center
    r2 = (X - L / 2) ** 2 + (Yg - L / 2) ** 2
    T = jnp.where(r2 < (L / 6) ** 2, 1800.0, 300.0).astype(dtype)
    p = jnp.full(mesh.shape, 101325.0, dtype)
    Y = jnp.asarray(np.tile(Yu[:, None, None, None], (1,) + mesh.shape), dtype)
    s = solver.initial_state(p, T, Y, U)

    fos = FunctionObjectSet([
        FieldMinMax(mesh, ["T", "p"], out_dir=f"{args.out}/fieldMinMax"),
        LineSample(mesh, 0, (0.0, L / 2, 0.0), ["T"],
                   out_dir=f"{args.out}/sample"),
    ])
    ctrl = ControlDict(end_time=args.t_end, delta_t=args.dt,
                       write_interval=1e-4)
    s = run_case(solver, s, ctrl, function_objects=fos,
                 fields_fn=lambda st: {"T": st.T, "p": st.p}, log_every=100)
    Tn = np.asarray(s.T)
    print(f"final: T in [{Tn.min():.1f}, {Tn.max():.1f}] K "
          f"(reference anchors reach ~1533 K max at t=0.5 ms on its grid)")


if __name__ == "__main__":
    main()
