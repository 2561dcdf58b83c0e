"""3D reacting LES Taylor-Green vortex (the north-star config family:
dfLowMachFoam 3D reactive LES, BASELINE.json).

H2/air premixed TGV with an ignition kernel, Sigma SGS model, full PIMPLE
loop with stiff chemistry — one jitted step, device-resident. Reports
cell-updates/sec on the available accelerator.

Usage: python examples/reacting_tgv_3d_les.py [--cells 48] [--steps 20]
       [--dtype f32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=48)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dt", type=float, default=2.5e-7)
    ap.add_argument("--dtype", default="f32")
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
    from deepflame_tpu.combustion import Laminar
    from deepflame_tpu.mesh import StructuredMesh, cyclic
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
    from deepflame_tpu.turbulence import sigma_model

    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)
    n = args.cells
    L = 2.0 * np.pi * 1e-3
    mesh = StructuredMesh.box([L, L, L], [n, n, n])
    b = ((cyclic(), cyclic()),) * 3
    comb = Laminar(th, kin, ode_opts=RosenbrockOptions(
        rtol=1e-4 if args.dtype == "f32" else 1e-6,
        atol=1e-8 if args.dtype == "f32" else 1e-12,
        max_steps=2000, grow=10.0))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=comb,
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=True,
                             inert_index=int(mech.species_index("N2"))),
        turbulence=sigma_model())
    ns = mech.n_species
    Yu = np.zeros(ns)
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    Yu[iH2], Yu[iO2], Yu[iN2] = 0.0285, 0.2264, 0.7451
    X, Yg, Z = mesh.cell_centers(dtype)
    k = 2.0 * np.pi / L
    U0 = 10.0
    U = jnp.stack([U0 * jnp.sin(k * X) * jnp.cos(k * Yg) * jnp.cos(k * Z),
                   -U0 * jnp.cos(k * X) * jnp.sin(k * Yg) * jnp.cos(k * Z),
                   jnp.zeros(mesh.shape, dtype)])
    r2 = (X - L / 2)**2 + (Yg - L / 2)**2 + (Z - L / 2)**2
    T = jnp.where(r2 < (L / 6)**2, 2000.0, 700.0).astype(dtype)
    p = jnp.full(mesh.shape, 101325.0, dtype)
    Y = jnp.asarray(np.tile(Yu[:, None, None, None], (1,) + mesh.shape), dtype)
    s = solver.initial_state(p, T, Y, U)

    step = jax.jit(lambda st: solver.step(st, args.dt)[0])
    print(f"compiling 3D LES reacting step ({n}^3 = {n**3} cells, "
          f"{ns} species)...", flush=True)
    t0 = time.perf_counter()
    s = jax.block_until_ready(step(s))
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(args.steps):
        s = step(s)
    jax.block_until_ready(s)
    el = (time.perf_counter() - t0) / args.steps
    import jax.numpy as jnp2
    print(f"T in [{float(s.T.min()):.1f}, {float(s.T.max()):.1f}] K, "
          f"finite={bool(jnp2.all(jnp2.isfinite(s.T)))}")
    print(f"3D reacting LES: {el * 1e3:.1f} ms/step -> "
          f"{n**3 / el:,.0f} cell-updates/s on "
          f"{jax.devices()[0].device_kind}")


if __name__ == "__main__":
    main()
