"""2D reacting TGV on the reference's EXACT initial fields (anchor run).

Loads the nonuniform initial fields shipped with
/root/reference/test/dfLowMachFoam/twoD_reactingTGV/H2/cvodeSolver/0 via the
OpenFOAM importer and advances them with this framework's low-Mach solver on
the same grid (128x128, 2*pi mm cyclic box, dt = 1e-6 s, ES80 mechanism —
system/blockMeshDict + controlDict parity).

The reference CI asserts max(T) along the y-line at x = z = 3 mm after
100/200/300/400/500 steps: 363.504 / 537.614 / 871.092 / 1297.64 / 1532.92 K
(corrtest.cpp:51-57). Exact float equality is specific to the reference's
discretization; this run reports our values next to those anchors.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CASE = "/root/reference/test/dfLowMachFoam/twoD_reactingTGV/H2/cvodeSolver"
ANCHORS = {100: 363.504, 200: 537.614, 300: 871.092, 400: 1297.64,
           500: 1532.92}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--dtype", default="f64")
    ap.add_argument("--mv", default="per-field",
                    choices=["per-field", "group-min", "upwind"],
                    help="div(phi,Yi_h) multivariate-group treatment")
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.combustion import Laminar
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.runtime.openfoam_io import read_openfoam_field
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig

    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
    mech = load_mechanism(os.path.join(CASE, "ES80_H2-7-16.yaml"))
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)
    n = 128
    L = 2.0 * np.pi * 1e-3
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    comb = Laminar(th, kin, ode_opts=RosenbrockOptions(
        rtol=args.rtol if args.dtype == "f64" else max(args.rtol, 1e-4),
        atol=1e-12 if args.dtype == "f64" else 1e-8,
        max_steps=50000 if args.dtype == "f64" else 5000, grow=10.0))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=comb,
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=True,
                             mv_convection=args.mv,
                             inert_index=int(mech.species_index("N2"))))

    shape = mesh.shape
    T = jnp.asarray(read_openfoam_field(os.path.join(CASE, "0", "T"), shape),
                    dtype)
    U = jnp.asarray(read_openfoam_field(os.path.join(CASE, "0", "U"), shape),
                    dtype)
    p = jnp.asarray(read_openfoam_field(os.path.join(CASE, "0", "p"), shape),
                    dtype)
    ns = mech.n_species
    Y = np.zeros((ns,) + shape)
    for i, name in enumerate(mech.species_names):
        fp = os.path.join(CASE, "0", name)
        if os.path.exists(fp) or os.path.exists(fp + ".gz"):
            Y[i] = read_openfoam_field(fp, shape)
    Y = np.clip(Y, 0.0, 1.0)
    Y /= Y.sum(axis=0, keepdims=True)
    s = solver.initial_state(p, T, jnp.asarray(Y, dtype), U)

    dt = 1e-6
    # reference sampling (system/sample): lineUniform along y at
    # x = z = 3 mm, 1000 points in y [0, 6] mm, interpolationScheme
    # cellPoint; corrtest takes max(T) of that line. Emulate with bilinear
    # interpolation of cell-center values at x = 3.000 mm exactly.
    i_line = int(0.003 / mesh.dx)
    xq = 0.003
    # columns straddling xq (cell centers at (i + 0.5) dx)
    iL = int(np.floor(xq / mesh.dx - 0.5))
    wR = (xq / mesh.dx - 0.5) - iL
    ys = np.linspace(0.0, 0.006, 1000)
    jf = ys / mesh.dy - 0.5
    jL = np.floor(jf).astype(int)
    wU = jf - jL
    jLc = jL % mesh.ny
    jUc = (jL + 1) % mesh.ny

    def line_max_cellpoint(Tn):
        col = (1.0 - wR) * Tn[iL, :, 0] + wR * Tn[iL + 1, :, 0]
        vals = (1.0 - wU) * col[jLc] + wU * col[jUc]
        return float(vals.max())

    step = jax.jit(lambda st: solver.step(st, dt)[0])
    import time as _t
    t0 = _t.perf_counter()
    print(f"sample x = 3.000 mm: blend of columns {iL}/{iL + 1} "
          f"(w = {1 - wR:.3f}/{wR:.3f}); raw column i={i_line}")
    for i in range(args.steps):
        s = step(s)
        if (i + 1) % 25 == 0:
            Tn = np.asarray(s.T)
            line_max = line_max_cellpoint(Tn)
            raw_max = Tn[i_line, :, 0].max()
            msg = (f"step {i + 1:4d} t={float(s.time) * 1e6:6.1f} us  "
                   f"maxT(line)={line_max:8.2f} K  (raw col {raw_max:8.2f}) "
                   f"maxT={Tn.max():8.2f}")
            if (i + 1) in ANCHORS:
                ref = ANCHORS[i + 1]
                msg += f"  | anchor {ref:8.2f}  dev {100 * (line_max - ref) / ref:+6.2f}%"
                np.save(f"/tmp/tgv_T_{i + 1}.npy", Tn[:, :, 0])
            print(msg, flush=True)
    print(f"wall: {_t.perf_counter() - t0:.0f}s")


if __name__ == "__main__":
    main()
